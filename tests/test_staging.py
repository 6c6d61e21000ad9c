"""Tests for the run-scoped staging helpers (`sources/replay.py`) and
`materialized` (`operators/materialize.py`) — s07 correctness depends on
footer-stats reads and the INT96→INT64 staging-write interaction, so
these are pinned directly, not only through the streaming suite."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from kafka_streams_learning_spark.operators.materialize import materialized
from kafka_streams_learning_spark.sources.replay import (
    run_named_dir,
    run_staging_dir,
    stage_replay_chunks,
    staged_column_max,
)


def test_run_staging_dirs_are_distinct_and_named_dirs_stable():
    a, b = run_staging_dir("t"), run_staging_dir("t")
    assert a != b and os.path.isdir(a) and os.path.isdir(b)
    n1, n2 = run_named_dir("mat-x"), run_named_dir("mat-x")
    assert n1 == n2 and os.path.isdir(n1)
    # all live under one run root that atexit removes
    assert os.path.dirname(a) == os.path.dirname(n1)


def test_staged_column_max_reads_footer_stats(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 5)),
        (2, dt.datetime(2024, 1, 2, 12, 30, 0)),
        (3, dt.datetime(2024, 1, 1, 23, 59, 59)),
        (4, dt.datetime(2024, 1, 3, 6, 0, 1)),  # the known max
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    d = run_staging_dir("statmax")
    stage_replay_chunks(df, d, chunks=2, order_by="ts")
    got = staged_column_max(d, "ts")  # pyarrow returns tz-aware UTC
    assert got.replace(tzinfo=None) == dt.datetime(2024, 1, 3, 6, 0, 1)
    # numeric columns work the same way
    assert staged_column_max(d, "id") == 4


def test_staged_column_max_rejects_string_stats(spark):
    # BYTE_ARRAY footer stats may be truncated bounds → must refuse,
    # never silently return a value larger than any real row
    df = spark.createDataFrame([(1, "zzz"), (2, "aaa")], "id long, s string")
    d = run_staging_dir("statstr")
    stage_replay_chunks(df, d, chunks=1, order_by="id")
    with pytest.raises(TypeError, match="truncated"):
        staged_column_max(d, "s")


def test_stage_replay_chunks_restores_timestamp_conf(spark):
    key = "spark.sql.parquet.outputTimestampType"
    prior = spark.conf.get(key)
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "id long, ts timestamp"
    )
    stage_replay_chunks(df, run_staging_dir("conf"), chunks=1, order_by="ts")
    assert spark.conf.get(key) == prior  # staging write no longer leaks
    # ...but the staged files themselves carried INT64 stats (the point
    # of the scoped override): footer max is readable
    d = run_staging_dir("conf2")
    stage_replay_chunks(df, d, chunks=1, order_by="ts")
    assert staged_column_max(d, "ts").replace(tzinfo=None) == dt.datetime(2024, 1, 1)


def test_materialized_round_trip_and_tag_reuse(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    m1 = materialized(df, tag="test-mat")
    assert m1.schema == df.schema
    assert sorted((r.id, r.v) for r in m1.collect()) == [(1, "a"), (2, "b")]
    # tagged re-materialization reuses the same directory (overwrite),
    # so repeated catalog runs stay disk-bounded
    m2 = materialized(df.filter(F.col("id") == 1), tag="test-mat")
    assert m2.inputFiles()[0].rsplit("/", 2)[-2] == m1.inputFiles()[0].rsplit("/", 2)[-2]
    assert [r.id for r in m2.collect()] == [1]
    # untagged calls get fresh dirs
    u1, u2 = materialized(df), materialized(df)
    assert u1.inputFiles()[0] != u2.inputFiles()[0]
