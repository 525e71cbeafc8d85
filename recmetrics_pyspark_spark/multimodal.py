"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched Pandas UDFs.

The Spark-side machinery here is real and tested — schemas, mapInPandas
batch iteration, partition sizing — and so is the decode for binary PPM
(P6), parsed natively in numpy with no codec library; the synthetic
generator emits real PPM payloads so the declared pipeline performs an
actual image decode end-to-end. Compressed formats (PNG/JPEG) route
through PIL when present; the deterministic ``_fake_decode_rgb`` stub
remains only as the fallback for undecodable bytes. Swapping in
PIL/ffmpeg changes no Spark plumbing: the UDF signatures, batch shapes,
and schemas stay identical.

Design for 100 TB of media:
- media stays an opaque ``binary`` column; metadata (width/height/
  duration/codec) is a struct column so filters on metadata push down
  WITHOUT touching bytes;
- decode/resize/frame-sample run in ``mapInPandas`` so each Python
  worker sees Arrow record batches (zero-copy from the JVM) and emits
  fixed-size feature rows — the expensive bytes never shuffle;
- `spark.sql.files.maxPartitionBytes` governs how much binary payload
  one task holds; feature outputs are small and shuffle freely.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", IntegerType(), True),
        StructField("meta_codec", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def synthetic_media(
    spark,
    n: int = 64,
    kind: str = "image",
    num_partitions: int = 8,
    codec: str = "ppm",
) -> DataFrame:
    """Deterministic media table for exercising the pipeline. With
    ``codec="ppm"`` (default) each payload is a REAL binary PPM image
    (gradient pattern seeded by media_id), so ``decode_and_featurize``
    performs an actual format decode end-to-end; ``codec="fake"`` keeps
    the original md5-stream bytes that exercise the stub fallback.
    Partition count is explicit: a tiny generator split across all
    cores pays Python-worker launch per partition per mapInPandas
    stage — real media tables take their partitioning from file splits
    instead."""
    def payload_for(i: int, w: int, h: int) -> bytes:
        if codec == "ppm":
            # id-seeded RGB gradient: channel planes shift with i, so
            # every image is distinct but bit-stable across runs
            yy, xx = np.mgrid[0:h, 0:w].astype(np.uint16)
            img = np.stack(
                [
                    (xx * 8 + i) % 256,
                    (yy * 8 + 2 * i) % 256,
                    (xx + yy + 3 * i) % 256,
                ],
                axis=-1,
            ).astype(np.uint8)
            return encode_ppm(img)
        return hashlib.md5(f"media-{i}".encode()).digest() * 8

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            widths = [32 + int(i) % 32 for i in ids]
            rows = {
                "media_id": ids,
                "kind": [kind] * len(ids),
                "payload": [
                    payload_for(int(i), w, 32) for i, w in zip(ids, widths)
                ],
                "meta_width": widths,
                "meta_height": [32] * len(ids),
                "meta_duration_ms": [0] * len(ids),
                "meta_codec": [codec] * len(ids),
            }
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, num_partitions).mapInPandas(gen, MEDIA_SCHEMA)


try:  # probe once at import: PIL is optional in this container
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - container has no codec libs
    _PILImage = None


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6) — the
    simplest real raster format (netpbm): ASCII header + raw RGB
    bytes. Used by the synthetic generator so the decode path under
    test is a REAL format decode, not a byte-tiling stub."""
    h, w = img.shape[0], img.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def _ppm_decode_rgb(payload: bytes) -> np.ndarray:
    """Real pure-Python decode of binary PPM (P6): parse the header
    (magic, whitespace/comment-separated width/height/maxval), then
    view the raster as (h, w, 3) uint8. No codec library involved —
    this is an actual image decode the container can always run."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM payload")
    # header = magic + 3 ints, separated by whitespace; '#' starts a
    # comment running to end-of-line (netpbm spec)
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then the raster
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode a 1-D int16 array as a canonical RIFF/WAVE PCM16 mono
    payload (44-byte header + raw little-endian samples) — the
    simplest real audio container, so the audio decode path under test
    is an actual format parse, not a stub."""
    import struct

    data = samples.astype("<i2").tobytes()
    n = len(data)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", n) + data


def _wav_decode_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """Real pure-Python decode of RIFF/WAVE PCM16 mono: walk the chunk
    list (fmt/data may be in any order, with vendor chunks between),
    validate the format tag, and view the data chunk as int16. No
    audio library involved. Returns (samples, sample_rate)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            tag, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if (tag, channels, bits) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV format tag={tag} ch={channels} "
                    f"bits={bits} (PCM16 mono only)"
                )
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV payload missing fmt or data chunk")
    return data, rate


def synthetic_audio(
    spark, n: int = 64, num_partitions: int = 8, sample_rate: int = 8000
) -> DataFrame:
    """Deterministic audio table: each payload is a REAL WAV (PCM16
    mono) of an id-seeded two-tone signal, so the audio pipeline
    performs an actual container parse end-to-end."""

    def payload_for(i: int, n_samples: int) -> bytes:
        t = np.arange(n_samples, dtype=np.float64)
        f0, f1 = 100 + (i % 40) * 10, 400 + (i % 17) * 25
        wave = 0.6 * np.sin(2 * np.pi * f0 * t / sample_rate) + 0.3 * np.sin(
            2 * np.pi * f1 * t / sample_rate
        )
        return encode_wav(
            (wave * 20000).astype(np.int16), sample_rate=sample_rate
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            durations = [200 + int(i) % 300 for i in ids]  # ms
            rows = {
                "media_id": ids,
                "kind": ["audio"] * len(ids),
                "payload": [
                    payload_for(int(i), sample_rate * d // 1000)
                    for i, d in zip(ids, durations)
                ],
                "meta_width": [0] * len(ids),
                "meta_height": [0] * len(ids),
                "meta_duration_ms": durations,
                "meta_codec": ["pcm16"] * len(ids),
            }
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, num_partitions).mapInPandas(gen, MEDIA_SCHEMA)


def featurize_audio(media: DataFrame, n_frames: int = 8) -> DataFrame:
    """Audio decode → frame-split → per-frame (RMS energy, zero-
    crossing rate) features over mapInPandas — 2·n_frames floats per
    row. Same 100 TB contract as the image path: payload bytes stay in
    the scan task, only fixed-width features come out."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload in pdf["payload"]:
                samples, _rate = _wav_decode_pcm16(payload)
                x = samples.astype(np.float64) / 32768.0
                flen = max(len(x) // n_frames, 1)
                frames = x[: flen * n_frames].reshape(n_frames, flen)
                rms = np.sqrt((frames**2).mean(axis=1))
                zcr = (np.abs(np.diff(np.signbit(frames), axis=1))).mean(
                    axis=1
                )
                feats.append(
                    np.concatenate([rms, zcr]).astype(np.float32).tolist()
                )
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(featurize, FEATURE_SCHEMA)


def _pil_decode_rgb(payload: bytes, width: int, height: int) -> np.ndarray:
    """Real decode path, used whenever PIL imports: decode any
    PIL-readable payload, convert to RGB, resize to the metadata
    dimensions so downstream pooling sees the declared shape."""
    import io

    img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
    if img.size != (width, height):
        img = img.resize((width, height))
    return np.asarray(img, dtype=np.uint8)


def _fake_decode_rgb(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic STUB decode (no image codec in this container):
    tiles the payload bytes into a (h, w, 3) uint8 array. Everything
    outside this function is production plumbing."""
    if payload is None:
        raise NotImplementedError("real decode requires an image codec")
    buf = np.frombuffer(payload, dtype=np.uint8)
    need = width * height * 3
    reps = int(np.ceil(need / len(buf)))
    return np.tile(buf, reps)[:need].reshape(height, width, 3)


def decode_rgb(payload: bytes, width: int, height: int) -> np.ndarray:
    """Decode contract: (payload, declared w, h) → (h, w, 3) uint8.
    Resolution order: binary PPM decodes natively (real decode, always
    available); other formats go through PIL when the library is
    present; anything undecodable falls back to the deterministic stub
    (kept for md5-stream synthetic payloads)."""
    if payload is not None and payload[:2] == b"P6":
        img = _ppm_decode_rgb(payload)
        if img.shape[:2] != (height, width):
            # nearest-neighbor resize to the declared metadata shape —
            # same contract as the PIL path, numpy-only
            ys = (np.arange(height) * img.shape[0] // height).clip(
                0, img.shape[0] - 1
            )
            xs = (np.arange(width) * img.shape[1] // width).clip(
                0, img.shape[1] - 1
            )
            img = img[ys][:, xs]
        return img
    if _PILImage is not None:
        try:
            return _pil_decode_rgb(payload, width, height)
        except Exception:  # noqa: BLE001 - not a decodable image
            pass
    return _fake_decode_rgb(payload, width, height)


def decode_and_featurize(media: DataFrame, resize_to: int = 8) -> DataFrame:
    """Decode → resize → mean-pool feature extraction over mapInPandas.

    Output: fixed-length float feature per media row (resize_to² RGB
    means). Batches stream through Arrow; the binary payload never
    leaves the scan task."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload, w, h in zip(
                pdf["payload"], pdf["meta_width"], pdf["meta_height"]
            ):
                img = decode_rgb(payload, int(w), int(h))
                # "resize": block-mean pool to (resize_to, resize_to)
                bh, bw = (
                    max(img.shape[0] // resize_to, 1),
                    max(img.shape[1] // resize_to, 1),
                )
                pooled = (
                    img[: bh * resize_to, : bw * resize_to]
                    .reshape(resize_to, bh, resize_to, bw, 3)
                    .mean(axis=(1, 3))
                )
                feats.append(pooled.astype(np.float32).ravel().tolist())
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(featurize, FEATURE_SCHEMA)


DECODED_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("dim_a", LongType(), True),
        StructField("dim_b", LongType(), True),
        StructField("sum_r", LongType(), True),
    ]
)


def decode_meta(media: DataFrame) -> DataFrame:
    """Decode-verified metadata: REALLY parse every payload (binary
    PPM or RIFF/WAVE — the same native decoders the feature lane uses)
    and emit only DETERMINISTIC integer facts about what was decoded:

    - images: ``dim_a``/``dim_b`` = decoded width/height, ``sum_r`` =
      exact integer sum of the red channel
    - audio: ``dim_a`` = decoded sample count, ``dim_b`` = decoded
      sample rate, ``sum_r`` NULL (the int16 samples come from float
      sine evaluation, which is not bit-portable across engines)

    All outputs are exact integers, so the DuckDB oracle can recompute
    them from the synthetic generator's closed form and hash-match —
    this is the codec lane's correctness witness (the float feature
    pipeline stays rows-only). Same 100 TB contract as the feature
    lane: payload bytes never leave the scan task."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dim_a, dim_b, sum_r, nbytes = [], [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                nbytes.append(len(payload))
                if kind == "audio":
                    samples, rate = _wav_decode_pcm16(payload)
                    dim_a.append(len(samples))
                    dim_b.append(rate)
                    sum_r.append(None)
                else:
                    img = _ppm_decode_rgb(payload)
                    dim_a.append(img.shape[1])
                    dim_b.append(img.shape[0])
                    sum_r.append(int(img[:, :, 0].astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "dim_a": dim_a,
                    "dim_b": dim_b,
                    "sum_r": pd.array(sum_r, dtype="Int64"),
                }
            )

    return media.mapInPandas(parse, DECODED_META_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling STUB: emits one row per sampled timestamp
    with the frame left as a decode task (payload sliced
    deterministically). Real impl: ffmpeg seek per timestamp."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta_duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ms"),
            "payload",
        )
    )


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate: must never deserialize payload bytes —
    column pruning keeps the binary column out of the scan entirely."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.avg("meta_width").alias("avg_width"),
        F.avg("meta_duration_ms").alias("avg_duration_ms"),
    )
