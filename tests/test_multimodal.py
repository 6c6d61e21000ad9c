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
