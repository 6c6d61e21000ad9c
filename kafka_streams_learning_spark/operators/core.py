"""Core reference-parity operators (SURVEY §2.3–§2.7).

Each function is a thin, semantics-pinned wrapper that returns a DataFrame
transformation — the logical plan stays fully declarative so Catalyst can
push filters, prune columns, and choose physical strategies. The wrappers
exist to pin *semantics* (null-guards, sentinel keys, half-open windows,
grace-0), not to schedule execution.

Works identically on bounded and streaming DataFrames; the streaming
variants (watermarks, output modes) live in `streaming/`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rekey(df: DataFrame, key_expr: Column, key_name: str = "key") -> DataFrame:
    """selectKey-equivalent (`state_store/ProductCountApp.java:92-99`,
    SURVEY §2.3 P3): choosing the grouping/join column *is* the re-key; the
    shuffle the reference performs via an internal repartition topic is
    inserted by Spark's planner as Exchange(hashpartitioning) only when a
    downstream stateful op needs it — no eager repartition here."""
    return df.withColumn(key_name, key_expr)


def rekey_null_guard(df: DataFrame, key_col: str = "key", value_col: str | None = None) -> DataFrame:
    """Drop null-key (and optionally null-value) records before stateful ops
    (`state_store/ProductCountApp.java:95-100`, SURVEY §2.4 F1). This filter
    sits before the shuffle, so dropped rows never hit the network."""
    cond = F.col(key_col).isNotNull()
    if value_col is not None:
        cond = cond & F.col(value_col).isNotNull()
    return df.filter(cond)


def value_threshold(df: DataFrame, amount_col: Column, threshold: float) -> DataFrame:
    """Decimal-text-aware value filter (`processor/FraudProcessor.java:41-43`,
    SURVEY §2.4 F2): cast-then-compare, nulls dropped. `try_cast` keeps the
    expression total under ANSI mode, like the reference's parse-or-skip."""
    return df.filter(amount_col.try_cast("double") >= threshold)


def count_by_key(df: DataFrame, *keys: str, count_name: str = "cnt") -> DataFrame:
    """groupByKey().count() (`state_store/ProductCountApp.java:133-140`,
    SURVEY §2.6 A1). Batch form; a partial (map-side) aggregate runs before
    the shuffle, so the exchange carries one row per key per partition —
    the property that keeps this viable at 100 TB."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(count_name))


def tumbling_count(
    df: DataFrame,
    ts_col: str,
    size: str,
    *keys: str,
    count_name: str = "cnt",
    start_name: str = "window_start",
    end_name: str = "window_end",
) -> DataFrame:
    """Tumbling-window count (`windows/tumbling/OrderCountTumblingWindow.java:85-92`,
    SURVEY §2.6 A3): half-open `[start, end)`, wall-aligned buckets. The
    window struct is computed pre-shuffle; grouping is by (window, keys)."""
    w = F.window(F.col(ts_col), size)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias(count_name))
        .select(
            F.col("w.start").alias(start_name),
            F.col("w.end").alias(end_name),
            *keys,
            count_name,
        )
    )


def hopping_count(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    *keys: str,
    count_name: str = "cnt",
    start_name: str = "window_start",
    end_name: str = "window_end",
) -> DataFrame:
    """Hopping-window count (SURVEY §2.7 — mentioned at
    `joins/stream_stream/StreamStreamJoinExample.java:24`, never
    instantiated in the reference; exposed because Spark gives it free).
    Overlapping wall-aligned windows: each record lands in size/slide
    windows — the fan-out happens pre-shuffle so partial aggregation still
    collapses per (window, key) map-side."""
    w = F.window(F.col(ts_col), size, slide)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias(count_name))
        .select(
            F.col("w.start").alias(start_name),
            F.col("w.end").alias(end_name),
            *keys,
            count_name,
        )
    )


def session_count(
    df: DataFrame,
    ts_col: str,
    gap: str,
    *keys: str,
    count_name: str = "cnt",
    start_name: str = "window_start",
    end_name: str = "window_end",
) -> DataFrame:
    """Session-window count (SURVEY §2.7): per-key sessions that extend
    while consecutive events are < gap apart; window = [first_ts,
    last_ts + gap). Spark's `session_window` merges overlapping per-event
    [ts, ts+gap) ranges after the shuffle on the keys — exactly the
    gaps-and-islands semantics the DuckDB oracle replays with LAG."""
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias(count_name))
        .select(
            F.col("w.start").alias(start_name),
            F.col("w.end").alias(end_name),
            *keys,
            count_name,
        )
    )


def distinct_count_by_key(
    df: DataFrame, value_col: str, *keys: str, count_name: str = "cnt"
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key — the cardinality pass a
    training-data pipeline runs constantly (distinct users per source,
    distinct docs per domain). Spark plans it as a two-stage aggregate:
    partial de-dup of (key, value) map-side, then the count — the shuffle
    carries distinct pairs, not raw rows. For 100 TB dashboards where ±2%
    is fine, `approx_distinct_count_by_key` replaces the distinct shuffle
    with fixed-size HLL sketches."""
    return df.groupBy(*keys).agg(F.count_distinct(F.col(value_col)).alias(count_name))


def approx_distinct_count_by_key(
    df: DataFrame, value_col: str, *keys: str, count_name: str = "cnt", rsd: float = 0.05
) -> DataFrame:
    """HyperLogLog++ cardinality per key: constant state per key instead
    of the distinct-pair shuffle. Not oracle-hashable (estimator internals
    are engine-specific) — verified by bounds, not equality."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(F.col(value_col), rsd=rsd).alias(count_name)
    )


def quantile_stats(
    df: DataFrame, value_col: str, quantiles: list[float], *keys: str
) -> DataFrame:
    """Exact per-key distribution stats: count, min, max, and linear-
    interpolated percentiles (p_q columns). Exact `percentile` buffers a
    group's values to sort them, so it's for bounded-cardinality keys;
    `approx_quantile_stats` is the fixed-memory 100 TB path. Doubles and
    floats only (sum/avg are deliberately ABSENT: a distributed double
    sum is addition-order dependent and can't be oracle-hashed bitwise;
    percentile interpolation on identical sorted inputs can — measured
    25/25 bitwise-equal vs DuckDB quantile_cont)."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    ] + [
        F.percentile(value_col, q).alias(f"p{int(q * 100):02d}") for q in quantiles
    ]
    return df.groupBy(*keys).agg(*aggs)


def approx_quantile_stats(
    df: DataFrame,
    value_col: str,
    quantiles: list[float],
    *keys: str,
    accuracy: int = 10000,
) -> DataFrame:
    """Greenwald-Khanna approximate percentiles: fixed sketch memory per
    key, mergeable map-side — the scale path. Not oracle-hashable
    (estimator internals are engine-specific) — verified by bounds
    against the exact form, like the HLL cardinality pair."""
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.approx_percentile(value_col, q, accuracy).alias(f"p{int(q * 100):02d}")
        for q in quantiles
    ]
    return df.groupBy(*keys).agg(*aggs)


def rollup_stats(df: DataFrame, value_col: str, *dims: str) -> DataFrame:
    """Multi-granularity aggregate over a dimension hierarchy: one result
    row per rollup level (dims, dims[:-1], ..., grand total), each with
    count/min/max of `value_col` and per-dim grouping flags (g_<dim>: 1
    when that dim is rolled up — disambiguates a rolled-up level from a
    genuine NULL dim value). The 100 TB property: ALL levels come from a
    single scan + one Expand + one keyed exchange with map-side partial
    aggregation — K granularities never mean K passes over the data.
    Grouping flags are emitted per-dim (not a packed grouping_id) so the
    bit convention can't diverge across engines."""
    aggs = [F.grouping(d).cast("int").alias(f"g_{d}") for d in dims] + [
        F.count(F.lit(1)).alias("n"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    ]
    return df.rollup(*dims).agg(*aggs)


def having_count_above(df: DataFrame, threshold: int, count_name: str = "cnt") -> DataFrame:
    """Post-aggregation threshold (`windows/tumbling/FraudDetectionApp.java:51-57`,
    SURVEY §2.4 F3): strictly `count > threshold`."""
    return df.filter(F.col(count_name) > threshold)
