"""Streaming windowed/keyed aggregations (SURVEY §2.6 A1/A3, §2.7).

The watermark encodes the reference's grace semantics: grace-0 windows
(`ofSizeWithNoGrace`) = `withWatermark(ts, "0 seconds")` — a record older
than the max seen event time is dropped once its window is below the
watermark, and window state is purged as the watermark passes
(`StreamsOrderCount.java:46-53`). State lives in the RocksDB-backed store
configured in `session.py`; checkpoint replay is the changelog-restore
equivalent (`ProductCountApp.java:31-36`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_count_by_key(df: DataFrame, *keys: str, count_name: str = "cnt") -> DataFrame:
    """Unwindowed running count per key — KTable-from-count. Run in
    `update` output mode: every input record emits the key's new count
    (changelog emission, `StreamsOrderCount.java:130-134`)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(count_name))


def streaming_tumbling_count(
    df: DataFrame,
    ts_col: str,
    size: str,
    *keys: str,
    grace: str = "0 seconds",
    count_name: str = "cnt",
) -> DataFrame:
    """Tumbling-window count with grace-as-watermark. Append mode emits a
    window once finalized (watermark past window end); update mode emits
    per-record running window counts."""
    w = F.window(F.col(ts_col), size)
    return (
        df.withWatermark(ts_col, grace)
        .groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias(count_name))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            count_name,
        )
    )


def streaming_hopping_count(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    *keys: str,
    grace: str = "0 seconds",
    count_name: str = "cnt",
) -> DataFrame:
    """Hopping-window count over a stream (SURVEY §2.7 — the overlapping-
    window shape `StreamStreamJoinExample.java:24` mentions): each record
    lands in size/slide windows via `F.window(ts, size, slide)`; the
    fan-out happens pre-shuffle, so partial aggregation still collapses
    per (window, key) map-side and streaming state holds one row per open
    (window, key), evicted as the watermark passes window end."""
    w = F.window(F.col(ts_col), size, slide)
    return (
        df.withWatermark(ts_col, grace)
        .groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias(count_name))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            count_name,
        )
    )


def streaming_session_count(
    df: DataFrame,
    ts_col: str,
    gap: str,
    *keys: str,
    grace: str = "0 seconds",
    count_name: str = "cnt",
) -> DataFrame:
    """Session-window count over a stream (SURVEY §2.7). Sessions merge
    while consecutive per-key events are < gap apart; a session finalizes
    (append-mode emission + state eviction) once the watermark passes its
    end — so the last open sessions only emit after event time advances
    past them (see the flush-sentinel pattern in catalog_streaming s07)."""
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.withWatermark(ts_col, grace)
        .groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias(count_name))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            count_name,
        )
    )


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    bound: str,
    watermark: str | None = None,
    lower: str | None = None,
    upper: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream windowed equi-join (SURVEY §2.5 J2): keys equal
    and right_ts ∈ [left_ts - lower, left_ts + upper]
    (`StreamStreamJoinExample.java:118-123` is the symmetric ±bound case;
    lower/upper override for one-sided joins). Watermarks on BOTH sides let
    Spark purge join state once a row can no longer find a match — without
    them stream-stream join state grows forever.

    ``how`` extends the inner default to the Kafka Streams DSL's windowed
    leftJoin/outerJoin: for outer variants the engine emits the unmatched
    side with NULLs only once the GLOBAL watermark (the min across both
    inputs) passes the row's join window — on a finite replay the caller
    must keep both watermarks advancing past the last real rows (the s07
    flush-sentinel pattern, on BOTH streams), or tail rows stay in state
    and their NULL emissions never fire."""
    lo = lower if lower is not None else bound
    hi = upper if upper is not None else bound
    wm = watermark if watermark is not None else hi
    l = left.withWatermark(left_ts, wm).alias("l")
    r = right.withWatermark(right_ts, wm).alias("r")
    cond = F.expr(
        f"l.{left_key} = r.{right_key} AND "
        f"r.{right_ts} BETWEEN l.{left_ts} - INTERVAL {lo} "
        f"AND l.{left_ts} + INTERVAL {hi}"
    )
    return l.join(r, cond, how)
