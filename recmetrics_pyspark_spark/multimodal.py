"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched Pandas UDFs.

The Spark-side machinery here is real and tested — schemas, mapInPandas
batch iteration, partition sizing, deterministic fake decode — while the
actual codec calls are stubs (the image/audio libraries are not in this
container). Swapping ``_fake_decode_rgb``/``_fake_decode_pcm`` for
PIL/ffmpeg calls changes no Spark plumbing: the UDF signatures, batch
shapes, and schemas stay identical.

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
    spark, n: int = 64, kind: str = "image", num_partitions: int = 8
) -> DataFrame:
    """Deterministic fake media table for exercising the plumbing:
    payload = md5-stream bytes derived from media_id (stable across
    runs/partitionings). Partition count is explicit: a tiny generator
    split across all cores pays Python-worker launch per partition per
    mapInPandas stage — real media tables take their partitioning from
    file splits instead."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = {
                "media_id": ids,
                "kind": [kind] * len(ids),
                "payload": [
                    hashlib.md5(f"media-{i}".encode()).digest() * 8 for i in ids
                ],
                "meta_width": [32 + int(i) % 32 for i in ids],
                "meta_height": [32] * len(ids),
                "meta_duration_ms": [0] * len(ids),
                "meta_codec": ["fake"] * len(ids),
            }
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, num_partitions).mapInPandas(gen, MEDIA_SCHEMA)


try:  # probe once at import: PIL is optional in this container
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - container has no codec libs
    _PILImage = None


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
    Prefers the real PIL decode when the library is present AND the
    payload is an actual encoded image; falls back to the deterministic
    stub (synthetic payloads are md5 streams, not image files)."""
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
