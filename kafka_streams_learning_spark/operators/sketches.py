"""Mergeable cardinality sketches as compositions of built-in expressions.

The 100 TB story: an exact COUNT(DISTINCT token) must shuffle every
distinct token to its group's reducer — at web scale that exchange is the
job. A HyperLogLog register table is 64 integers per group, built with a
MAX aggregation that partial-aggregates map-side and merges associatively,
so the exchange carries O(groups × 64) rows no matter how many tokens the
corpus holds. This is the same register-merge contract Spark's own
`approx_count_distinct` implements natively; it is re-derived here from
first principles (Flajolet et al. 2007, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm") because the engine's
sketch must replay BIT-IDENTICALLY in the DuckDB oracle — both engines'
builtins use incompatible hash functions and register layouts, so the
portable version pins its own md5-derived hash and pure-integer registers.

No reference-repo counterpart: the reference's aggregations are exact
counts (`basics/WordCountApp.java:58`); this extends them with the
sketch the same pipeline needs once a key's cardinality no longer fits a
counter per distinct value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streams_learning_spark.functions import text as T
from kafka_streams_learning_spark.functions.hashing import hash32

# m = 2^HLL_P registers. p=6 (64 registers, ~13% relative error) keeps the
# register table legible in test output; production would use p=12-14.
HLL_P = 6
HLL_M = 1 << HLL_P
# remaining hash bits after the register index is peeled off the 32-bit
# base hash; rho ranges 1..HLL_W+1
HLL_W = 32 - HLL_P
# alpha_64 = 0.7213/(1 + 1.079/64), frozen to a literal so the Spark
# expression and the generated oracle SQL can never disagree on it
HLL_ALPHA = 0.709
# the estimate is snapped to this grid before output: the only non-integer
# steps (one division, optionally one ln) are IEEE-deterministic, but the
# snap keeps the contract explicit like LOGPROB_SCALE's
HLL_EST_SCALE = 1_000


def _rho(w: Column) -> Column:
    """Position of the highest set bit from the MSB of the HLL_W-bit
    window + 1: rho = HLL_W + 1 - bit_length(w), with w=0 → HLL_W + 1.
    bit_length is length(bin(w)) — pure-integer, no float log2 edge."""
    return F.when(w == 0, F.lit(HLL_W + 1)).otherwise(
        F.lit(HLL_W + 1) - F.length(F.bin(w))
    )


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """The per-group HLL register table: (group…, bucket, m_b) with
    m_b = max rho over values hashing into the bucket. MAX is the sketch
    merge — associative, commutative, map-side combinable — so registers
    from any partitioning (or any pre-sketched shard of a 100 TB corpus)
    union + re-MAX into the same table."""
    h = hash32(F.col(value_col))
    return (
        df.select(*group_cols, h.alias("h"))
        .select(
            *group_cols,
            (F.col("h") % HLL_M).alias("bucket"),
            _rho(F.shiftright("h", HLL_P)).alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_b"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse a register table to the HLL cardinality estimate.

    Pure-integer core: S = Σ 2^(32-m_b) over present registers plus
    2^32 per absent register (absent ⇔ m_b = 0), all exact BIGINTs
    (≤ 64·2^32 < 2^39), so the indicator sum is partition-order-free.
    E_raw = alpha·m²·2^32 / S is one IEEE division of exact integers;
    the small-range correction E = m·ln(m/V) (when E_raw ≤ 2.5m and
    V = zero registers > 0) is ln of an exact rational. The result is
    snapped to the 1e-3 grid (HLL_EST_SCALE) on output."""
    pow2_32 = 1 << 32
    # the Python shiftleft wrapper takes a literal shift; the SQL form
    # accepts a column shift
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 32 - m_b)")).alias("s_present"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    v = F.lit(HLL_M) - F.col("n_buckets")
    s = F.col("s_present") + v * F.lit(pow2_32)
    e_raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M)
        * F.lit(float(pow2_32))
        / s.cast("double")
    )
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(e_raw)
    est_q = (
        F.floor(est * F.lit(float(HLL_EST_SCALE)) + F.lit(0.5))
        / F.lit(float(HLL_EST_SCALE))
    )
    return agg.select(*group_cols, est_q.alias("hll_estimate"))


def hll_token_cardinality(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distinct-token cardinality per group: the HLL estimate side by
    side with the exact count and the signed relative error — the
    calibration table you consult before trusting the sketch at a p the
    fixture can't validate.

    Scale shape: the sketch arm shuffles ≤ 64 register rows per group
    (tokens partial-MAX map-side); the exact arm is the expensive
    baseline (distinct shuffles every distinct (group, token) pair) and
    exists here as ground truth, exactly like x09/x10's exact ANN arms.
    """
    tok = df.select(
        F.col(group_col),
        F.explode(T.tokens(T.normalized_text(F.col(text_col)))).alias("token"),
    )
    est = hll_estimate(
        hll_registers(tok, "token", [group_col]), [group_col]
    )
    exact = tok.groupBy(group_col).agg(
        F.count_distinct(F.col("token")).alias("n_exact")
    )
    rel = (F.col("hll_estimate") - F.col("n_exact")) / F.col("n_exact")
    rel_q = (
        F.floor(rel * F.lit(1.0e6) + F.lit(0.5)) / F.lit(1.0e6)
    )
    return est.join(exact, group_col).select(
        group_col, "n_exact", "hll_estimate", rel_q.alias("rel_err")
    )
