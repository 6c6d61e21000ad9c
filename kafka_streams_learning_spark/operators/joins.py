"""Join operators (SURVEY §2.5).

Two reference joins, re-expressed for Spark's planner:

- enrich_join — the stream⋈table enrichment
  (`joins/stream_ktable/StreamTableJoinExample.java:151-155`). Kafka's
  version is arrival-order dependent; the deterministic semantic (the one
  the reference's own comments pin down, `:85-88`) is "join against the
  latest value per key". Batch: inner hash join against a (broadcast)
  dimension; a `latest_per_key` helper builds the KTable view when the
  dimension is versioned.

- interval_join — the windowed stream⋈stream join
  (`joins/stream_stream/StreamStreamJoinExample.java:118-123`): equi-key +
  |ts_l - ts_r| ≤ bound. Expressed as equi-join + range predicate so the
  planner picks a *hash* join on the key and evaluates the range as a
  post-condition — never a cartesian range join. At scale both sides
  shuffle once on the key; AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def latest_per_key(df: DataFrame, key: str, version_col: str) -> DataFrame:
    """KTable materialization (SURVEY §2.1 S3): latest value per key by
    version/timestamp, ties broken arbitrarily-but-deterministically via
    max_by struct ordering. One shuffle on the key; at scale this is the
    compacted-topic snapshot."""
    others = [c for c in df.columns if c != key]
    packed = F.max_by(F.struct(*others), F.col(version_col))
    return df.groupBy(key).agg(packed.alias("_v")).select(key, "_v.*")


def enrich_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-table enrichment join. Inner by default (no match → drop,
    `StreamTableJoinExample.java:149`). The dimension is broadcast when
    small — at 100 TB of facts a broadcast dim means zero shuffle of the
    fact table, which is the entire game."""
    d = broadcast(dim) if broadcast_dim else dim
    return facts.join(d, on=on, how=how)


def enriched_struct(facts_cols: list[str], dim_cols: list[str]) -> list[Column]:
    """Nested EnrichedOrder-shaped projection (`models/EnrichedOrder.java:5-6`,
    SURVEY §2.13 Q12): two struct columns, order + dimension."""
    return [
        F.struct(*[F.col(c) for c in facts_cols]).alias("fact"),
        F.struct(*[F.col(c) for c in dim_cols]).alias("dim"),
    ]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Windowed equi-join: keys equal AND
    right_ts ∈ [left_ts - lower, left_ts + upper]
    (`StreamStreamJoinExample.java:118-123` uses ±5 min symmetric; lower and
    upper are exposed separately because order⋈payment style joins are often
    one-sided). Equi-condition first so the planner hashes on the key."""
    cond = (
        (F.col(f"l.{left_key}") == F.col(f"r.{right_key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    return left.alias("l").join(right.alias("r"), cond, how)
