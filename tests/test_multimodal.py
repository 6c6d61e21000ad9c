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


def test_wav_meta_parses_real_stdlib_wav(spark):
    """wav_meta vs REAL canonical WAV bytes written by Python's stdlib
    `wave` module — pure-expression parse, no codec libs, malformed
    blobs routed to valid=false instead of failing the scan."""
    import io
    import wave

    def mk_wav(rate, channels, sampwidth, n_frames):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(sampwidth)
            w.setframerate(rate)
            w.writeframes(b"\x00" * (n_frames * channels * sampwidth))
        return buf.getvalue()

    rows = [
        (1, mk_wav(44100, 2, 2, 44100)),      # 1 s stereo 16-bit
        (2, mk_wav(8000, 1, 1, 4000)),        # 0.5 s mono 8-bit
        (3, b"NOT A WAV FILE AT ALL........................................"),
        (4, b"RIFF"),                          # truncated
    ]
    from kafka_streams_learning_spark.operators import multimodal

    df = spark.createDataFrame(rows, "id long, blob binary")
    got = {r.id: r for r in multimodal.wav_meta(df).collect()}
    r1 = got[1]
    assert r1.valid and r1.audio_format == 1 and r1.n_channels == 2
    assert r1.sample_rate == 44100 and r1.bits_per_sample == 16
    assert r1.data_bytes == 44100 * 2 * 2 and r1.duration_ms == 1000
    r2 = got[2]
    assert r2.valid and (r2.n_channels, r2.sample_rate, r2.bits_per_sample) == (
        1, 8000, 8,
    )
    assert r2.duration_ms == 500
    for bad in (3, 4):
        assert got[bad].valid is False and got[bad].sample_rate is None


def test_bmp_meta_parses_packed_headers(spark):
    """bmp_meta vs hand-packed BITMAPINFOHEADER bytes, incl. the signed
    top-down height and a foreign blob routed to valid=false."""
    import struct

    def mk_bmp(width, height, bpp=24):
        row_bytes = ((width * bpp + 31) // 32) * 4
        img_size = row_bytes * abs(height)
        header = struct.pack(
            "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
        ) + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, img_size, 2835, 2835, 0, 0
        )
        return header + b"\x00" * img_size

    from kafka_streams_learning_spark.operators import multimodal

    rows = [
        (1, mk_bmp(640, 480)),
        (2, mk_bmp(16, -16, bpp=32)),  # top-down
        (3, b"GIF89a not a bmp" + b"\x00" * 64),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    got = {r.id: r for r in multimodal.bmp_meta(df).collect()}
    assert got[1].valid and (got[1].width, got[1].height, got[1].bits_per_pixel) == (
        640, 480, 24,
    )
    assert got[1].top_down is False
    assert got[2].valid and got[2].height == 16 and got[2].top_down is True
    assert got[3].valid is False and got[3].width is None


def test_header_triage_is_pure_codegen(spark):
    """The triage pass must stay JVM-side: no Python UDFs, no Arrow
    exchange, no shuffle — one projected scan."""
    from kafka_streams_learning_spark.operators import multimodal
    from kafka_streams_learning_spark.plans import explain as E

    df = spark.createDataFrame([(1, b"RIFF")], "id long, blob binary")
    for op in (multimodal.wav_meta, multimodal.bmp_meta):
        plan = E.formatted_plan(op(df))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Exchange" not in plan


def test_wav_bmp_header_parse_property(spark):
    """Property: for ANY parameter combination, the pure-expression parse
    recovers exactly what stdlib `wave` / struct packed — one batched
    Spark job over many generated headers (offsets/endianness verified
    across the whole parameter space, not just the canonical example)."""
    import io
    import itertools
    import struct
    import wave

    from kafka_streams_learning_spark.operators import multimodal

    wav_rows, expected_wav = [], {}
    for i, (rate, ch, width) in enumerate(
        itertools.product([8000, 22050, 44100, 96000], [1, 2, 6], [1, 2, 4])
    ):
        frames = (i * 997) % 5000 + 1
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(width)
            w.setframerate(rate)
            w.writeframes(b"\x00" * (frames * ch * width))
        wav_rows.append((i, buf.getvalue()))
        expected_wav[i] = (
            ch, rate, width * 8, frames * ch * width,
            frames * ch * width * 1000 // (rate * ch * width),
        )
    df = spark.createDataFrame(wav_rows, "id long, blob binary")
    for r in multimodal.wav_meta(df).collect():
        assert r.valid, r.id
        got = (r.n_channels, r.sample_rate, r.bits_per_sample,
               r.data_bytes, r.duration_ms)
        assert got == expected_wav[r.id], (r.id, got, expected_wav[r.id])

    bmp_rows, expected_bmp = [], {}
    for i, (wd, ht, bpp) in enumerate(
        itertools.product([1, 13, 640, 7680], [1, -1, 480, -2160], [1, 8, 24, 32])
    ):
        row_bytes = ((wd * bpp + 31) // 32) * 4
        img = row_bytes * abs(ht)
        blob = struct.pack("<2sIHHI", b"BM", 54 + img, 0, 0, 54) + struct.pack(
            "<IiiHHIIiiII", 40, wd, ht, 1, bpp, 0, img, 2835, 2835, 0, 0
        ) + b"\x00" * min(img, 64)
        # header-only truncated pixel data still parses (triage reads
        # the first 54 bytes; sanity of pixel payload is the decoder's
        # job) — but keep blobs >= 54 bytes
        bmp_rows.append((i, blob))
        expected_bmp[i] = (wd, abs(ht), ht < 0, bpp, 54 + img)
    df = spark.createDataFrame(bmp_rows, "id long, blob binary")
    for r in multimodal.bmp_meta(df).collect():
        assert r.valid, r.id
        got = (r.width, r.height, r.top_down, r.bits_per_pixel, r.file_bytes)
        assert got == expected_bmp[r.id], (r.id, got, expected_bmp[r.id])


def test_wav_blob_round_trips_and_matches_stdlib(spark):
    """wav_blob ∘ wav_meta is the identity on the parameter space, and
    wav_blob's bytes are BIT-IDENTICAL to stdlib `wave` output for the
    same parameters — the synthesis a future catalog row can gate
    against a DuckDB oracle replaying the same hex construction."""
    import io
    import wave

    from pyspark.sql import functions as F

    from kafka_streams_learning_spark.operators import multimodal

    rows = [
        (1, 44100, 2, 16, 1000 * 4),
        (2, 8000, 1, 8, 123),
        (3, 96000, 6, 32, 0),          # empty payload still canonical
    ]
    df = spark.createDataFrame(
        rows, "id long, rate long, ch long, bits long, data long"
    )
    blobs = df.select(
        "id", "rate", "ch", "bits", "data",
        multimodal.wav_blob(
            F.col("rate"), F.col("ch"), F.col("bits"), F.col("data")
        ).alias("blob"),
    )
    parsed = {r.id: r for r in multimodal.wav_meta(blobs).collect()}
    for rid, rate, ch, bits, data in rows:
        p = parsed[rid]
        assert p.valid and (p.n_channels, p.sample_rate, p.bits_per_sample,
                            p.data_bytes) == (ch, rate, bits, data)

    got_bytes = {r.id: bytes(r.blob) for r in blobs.collect()}
    for rid, rate, ch, bits, data in rows:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(bits // 8)
            w.setframerate(rate)
            w.writeframes(b"\x00" * data)
        assert got_bytes[rid] == buf.getvalue(), rid
