"""Multimodal plumbing tests (`operators/multimodal.py`): the decode
boundary's schema/batching contract and the frame-sampling plan —
previously exercised only through the catalog oracle (x12/x14/x27)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_learning_spark.operators import multimodal


def _blobs(spark):
    rows = [
        (1, "video", bytearray(b"abcdefgh" * 4)),
        (2, "image", bytearray(b"xy")),
        (3, "audio", bytearray(b"")),
    ]
    return spark.createDataFrame(rows, "id long, modality string, blob binary")


def test_fake_decode_contract(spark):
    out = multimodal.fake_decode_features(_blobs(spark)).collect()
    by_id = {r.id: r for r in out}
    assert by_id[1].n_frames == 30 and by_id[2].n_frames == 1
    assert by_id[1].n_bytes == 32 and by_id[3].n_bytes == 0
    assert len(by_id[1].feature) == 8
    # empty blob decodes to an all-zero feature, not a crash
    assert by_id[3].feature == [0.0] * 8


def test_sample_frames_stride_and_single_frame(spark):
    decoded = multimodal.fake_decode_features(_blobs(spark))
    sampled = multimodal.sample_frames(decoded, every_n=7)
    frames = {}
    for r in sampled.collect():
        frames.setdefault(r.id, []).append(r.frame_idx)
    # video (30 frames): strided indices; single-frame rows keep frame 0
    assert sorted(frames[1]) == [0, 7, 14, 21, 28]
    assert frames[2] == [0] and frames[3] == [0]


def test_decode_stub_is_gated(spark):
    with pytest.raises(NotImplementedError, match="codec"):
        multimodal.decode_stub()


def test_aspect_fit_and_fake_resize_contract(spark):
    """x29 plumbing: fit math never upscales, preserves aspect via floor,
    floors at 1px; the Arrow resize stage emits EXACTLY out_w*out_h bytes
    per row, deterministically derived from the source blob (same blob →
    same resized bytes)."""
    import hashlib

    rows = [
        (1, b"x" * 100),   # width 37, height 5  → fits under (32,24): scale 32/37
        (2, b"y" * 10),    # width 11, height 11 → no upscale (scale 1)
        (3, b""),          # width 1, height 1   → floors at 1
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    from pyspark.sql import functions as F

    dims = df.withColumn(
        "width", (F.lit(1) + F.octet_length("blob") % 64).cast("int")
    ).withColumn("height", (F.lit(1) + F.octet_length("blob") % 48).cast("int"))
    out = {
        r.id: r
        for r in multimodal.fake_resize(
            multimodal.aspect_fit(dims, 32, 24)
        ).collect()
    }
    for r in out.values():
        assert r.out_w <= max(32, 1) and r.out_h <= max(24, 1)
        assert r.out_w >= 1 and r.out_h >= 1
        assert len(r.resized) == r.out_w * r.out_h
    assert (out[2].out_w, out[2].out_h) == (11, 11)  # never upscaled
    assert (out[3].out_w, out[3].out_h) == (1, 1)
    seed = hashlib.sha256(b"x" * 100).digest()
    k = out[1].out_w * out[1].out_h
    assert bytes(out[1].resized) == (seed * (-(-k // len(seed))))[:k]
