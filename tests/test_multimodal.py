"""Multimodal pipeline tests: the Spark machinery (schemas, Arrow
batch shapes, partitioning, pruning) AND the binary-PPM codec are
real; the deterministic fake survives only as the fallback for
undecodable bytes."""

from __future__ import annotations

import pytest

from recmetrics_pyspark_spark import multimodal as MM


def test_synthetic_media_schema_and_determinism(spark):
    df = MM.synthetic_media(spark, n=16)
    assert df.schema == MM.MEDIA_SCHEMA
    a = {r["media_id"]: bytes(r["payload"]) for r in df.collect()}
    b = {
        r["media_id"]: bytes(r["payload"])
        for r in MM.synthetic_media(spark.range(0).sparkSession, n=16)
        .repartition(7)
        .collect()
    }
    assert a == b  # payload independent of partitioning


def test_decode_and_featurize_shapes(spark):
    feats = MM.decode_and_featurize(MM.synthetic_media(spark, n=8), resize_to=4)
    rows = feats.collect()
    assert len(rows) == 8
    widths = {
        r["media_id"]: r["meta_width"]
        for r in MM.synthetic_media(spark, n=8).collect()
    }
    for r in rows:
        assert len(r["feature"]) == 4 * 4 * 3
        # PPM payload = 13-byte header ("P6\n{2-digit w} 32\n255\n")
        # + raw RGB raster
        assert r["n_bytes"] == 13 + widths[r["media_id"]] * 32 * 3
    assert feats.schema == MM.FEATURE_SCHEMA


def test_decode_stub_raises_on_missing_payload():
    with pytest.raises(NotImplementedError):
        MM._fake_decode_rgb(None, 4, 4)


def test_frame_sampling(spark):
    media = MM.synthetic_media(spark, n=4, kind="video").withColumn(
        "meta_duration_ms", MM.F.lit(3500)
    )
    frames = MM.sample_frames(media, every_ms=1000)
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per)  # 0,1000,2000,3000


def test_metadata_stats_prunes_payload(spark):
    media = MM.synthetic_media(spark, n=8)
    stats = MM.media_metadata_stats(media)
    plan = stats._jdf.queryExecution().optimizedPlan().toString()
    got = stats.collect()
    assert got[0]["n_media"] == 8
    # payload must be pruned from the aggregate's input
    assert "payload" not in plan.split("Aggregate")[0]


def test_decode_rgb_falls_back_to_stub_on_non_image_bytes():
    # synthetic payloads are md5 streams, never decodable images, so
    # the contract function must route them to the stub in EVERY
    # environment (with or without PIL installed)
    import numpy as np

    payload = b"\x01\x02\x03\x04" * 16
    out = MM.decode_rgb(payload, 4, 4)
    assert out.shape == (4, 4, 3) and out.dtype == np.uint8
    assert (out == MM._fake_decode_rgb(payload, 4, 4)).all()


@pytest.mark.skipif(MM._PILImage is None, reason="PIL not installed")
def test_decode_rgb_uses_pil_for_real_images():
    # exercised only where an image codec exists: a real PNG payload
    # must go through PIL and reproduce the encoded pixels
    import io

    import numpy as np

    arr = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    img = MM._PILImage.fromarray(arr, "RGB")
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    out = MM.decode_rgb(buf.getvalue(), 4, 4)
    assert (out == arr).all()


def test_ppm_roundtrip_exact():
    import numpy as np

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    payload = MM.encode_ppm(img)
    assert payload.startswith(b"P6\n9 5\n255\n")
    out = MM._ppm_decode_rgb(payload)
    assert out.shape == (5, 9, 3)
    assert (out == img).all()


def test_ppm_decode_handles_comments():
    import numpy as np

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = [1, 2, 3]
    payload = b"P6\n# a netpbm comment\n2 2\n255\n" + img.tobytes()
    out = MM._ppm_decode_rgb(payload)
    assert (out == img).all()


def test_decode_rgb_is_real_for_ppm_payloads():
    import numpy as np

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    # matching declared shape: bit-exact decode, no stub involved
    out = MM.decode_rgb(MM.encode_ppm(img), width=6, height=4)
    assert (out == img).all()
    # mismatched declared shape: nearest-neighbor resize to (h, w)
    out2 = MM.decode_rgb(MM.encode_ppm(img), width=3, height=2)
    assert out2.shape == (2, 3, 3)
    assert (out2[0, 0] == img[0, 0]).all()


def test_featurize_over_real_ppm_matches_local_pooling(spark):
    import numpy as np

    media = MM.synthetic_media(spark, n=4, codec="ppm")
    feats = {
        r["media_id"]: np.array(r["feature"])
        for r in MM.decode_and_featurize(media, resize_to=4).collect()
    }
    for r in media.collect():
        img = MM._ppm_decode_rgb(bytes(r["payload"]))
        bh, bw = img.shape[0] // 4, img.shape[1] // 4
        pooled = (
            img[: bh * 4, : bw * 4]
            .reshape(4, bh, 4, bw, 3)
            .mean(axis=(1, 3))
            .astype(np.float32)
            .ravel()
        )
        assert np.allclose(feats[r["media_id"]], pooled)


def test_ppm_roundtrip_property():
    """Property: encode→decode is the identity for ANY image shape and
    content (hypothesis drives shapes and a content seed)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=40),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def roundtrip(w, h, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = MM._ppm_decode_rgb(MM.encode_ppm(img))
        assert out.shape == (h, w, 3)
        assert (out == img).all()

    roundtrip()


def test_wav_roundtrip_exact():
    import numpy as np

    from recmetrics_pyspark_spark.multimodal import (
        _wav_decode_pcm16,
        encode_wav,
    )

    rng = np.arange(-500, 500, dtype=np.int16)
    payload = encode_wav(rng, sample_rate=8000)
    samples, rate = _wav_decode_pcm16(payload)
    assert rate == 8000
    assert np.array_equal(samples, rng)


def test_wav_decode_skips_vendor_chunks():
    import struct

    import numpy as np

    from recmetrics_pyspark_spark.multimodal import (
        _wav_decode_pcm16,
        encode_wav,
    )

    base = encode_wav(np.array([1, -2, 3], dtype=np.int16), 16000)
    # splice an odd-sized vendor chunk between fmt and data (word
    # aligned per RIFF); the parser must walk past it
    fmt_end = 12 + 8 + 16
    vendor = b"JUNK" + struct.pack("<I", 3) + b"xyz" + b"\x00"
    patched = base[:fmt_end] + vendor + base[fmt_end:]
    samples, rate = _wav_decode_pcm16(patched)
    assert rate == 16000
    assert samples.tolist() == [1, -2, 3]


def test_wav_decode_rejects_non_pcm16():
    import struct

    import numpy as np

    from recmetrics_pyspark_spark.multimodal import (
        _wav_decode_pcm16,
        encode_wav,
    )
    import pytest as _pytest

    good = encode_wav(np.array([0], dtype=np.int16), 8000)
    bad = bytearray(good)
    bad[20:22] = struct.pack("<H", 3)  # IEEE float tag
    with _pytest.raises(ValueError, match="unsupported WAV format"):
        _wav_decode_pcm16(bytes(bad))
    with _pytest.raises(ValueError, match="not a RIFF"):
        _wav_decode_pcm16(b"OggS" + b"\x00" * 40)


def test_featurize_audio_shapes(spark):
    from recmetrics_pyspark_spark.multimodal import (
        featurize_audio,
        synthetic_audio,
    )

    feats = featurize_audio(synthetic_audio(spark, n=8), n_frames=8)
    rows = feats.collect()
    assert len(rows) == 8
    for r in rows:
        assert r.kind == "audio"
        assert len(r.feature) == 16  # 8 RMS + 8 ZCR
        rms, zcr = r.feature[:8], r.feature[8:]
        assert all(0.0 < v < 1.0 for v in rms)  # bounded energy
        assert all(0.0 <= v <= 1.0 for v in zcr)
        assert r.n_bytes > 44  # header + samples


def test_decode_meta_matches_generator_contract(spark):
    """decode_meta's integers must equal the generator's closed form:
    the values come from PARSING real PPM/WAV payloads, so this pins
    decode correctness, not just plumbing."""
    from recmetrics_pyspark_spark import multimodal as MM

    img = {
        r.media_id: r
        for r in MM.decode_meta(MM.synthetic_media(spark, n=4)).collect()
    }
    for i in range(4):
        w = 32 + i % 32
        r = img[i]
        assert (r.dim_a, r.dim_b) == (w, 32)
        assert r.n_bytes == 13 + 3 * 32 * w
        assert r.sum_r == 32 * sum((8 * x + i) % 256 for x in range(w))

    aud = {
        r.media_id: r
        for r in MM.decode_meta(MM.synthetic_audio(spark, n=4)).collect()
    }
    for i in range(4):
        d = 200 + i % 300
        r = aud[i]
        assert (r.dim_a, r.dim_b) == (8 * d, 8000)
        assert r.n_bytes == 44 + 16 * d
        assert r.sum_r is None
