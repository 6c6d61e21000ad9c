"""Event-anchored sliding-window count (SURVEY §2.6 A4, §7.5 hard part 2).

Kafka Streams' ``SlidingWindows`` anchors a window at *every event's*
timestamp (`windows/sliding_windows/CreditCardTransactions.java:13-60`);
Spark's built-in `window()` is wall-aligned, so this is a genuine custom
operator. Batch/exact form: a per-key range self-join —

    count(e2 : e2.key = e1.key AND e1.ts - Δ ≤ e2.ts ≤ e1.ts)

which is precisely "how many events for this key in the Δ window ending at
this event". The self-join is an equi-join on the key with a range
post-filter, so it hash-partitions once on the key; per-key density × Δ
bounds the join fan-out, and AQE's skew handling splits hot keys. A
low-latency streaming variant (per-key ordered buffer in
transformWithStateInPandas) lives in `streaming/stateful.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_count(
    df: DataFrame,
    key: str,
    ts_col: str,
    lookback: str,
    id_cols: list[str] | None = None,
    count_name: str = "cnt",
) -> DataFrame:
    """For each input row, count rows of the same key with
    ts ∈ [row.ts - lookback, row.ts] (inclusive both ends, matching the
    reference's window-contains-both-events semantics,
    `CreditCardTransactions.java:24-54`). `id_cols` identify the anchor row
    in the output (default: key + ts)."""
    if id_cols is None:
        id_cols = [key, ts_col]
    anchor = df.alias("a")
    other = df.select(key, ts_col).alias("b")
    cond = (
        (F.col(f"a.{key}") == F.col(f"b.{key}"))
        & (F.col(f"b.{ts_col}") >= F.col(f"a.{ts_col}") - F.expr(f"INTERVAL {lookback}"))
        & (F.col(f"b.{ts_col}") <= F.col(f"a.{ts_col}"))
    )
    joined = anchor.join(other, cond, "inner")
    return joined.groupBy(*[F.col(f"a.{c}") for c in id_cols]).agg(
        F.count(F.lit(1)).alias(count_name)
    )
