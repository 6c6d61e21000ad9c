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


def hll_alpha(m: int) -> float:
    """Flajolet's bias-correction constant alpha_m, frozen to the same
    Python float literal on both the Spark and oracle sides. Small-m
    values are the paper's table; m >= 128 uses the closed form. The
    p=6 default stays pinned to the historical 0.709 literal (x54's
    gate contract since round 6)."""
    return {16: 0.673, 32: 0.697, 64: HLL_ALPHA}.get(
        m, 0.7213 / (1.0 + 1.079 / m)
    )


def _rho(w: Column, hll_w: int = HLL_W) -> Column:
    """Position of the highest set bit from the MSB of the hll_w-bit
    window + 1: rho = hll_w + 1 - bit_length(w), with w=0 → hll_w + 1.
    bit_length is length(bin(w)) — pure-integer, no float log2 edge."""
    return F.when(w == 0, F.lit(hll_w + 1)).otherwise(
        F.lit(hll_w + 1) - F.length(F.bin(w))
    )


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """The per-group HLL register table: (group…, bucket, m_b) with
    m_b = max rho over values hashing into the bucket. MAX is the sketch
    merge — associative, commutative, map-side combinable — so registers
    from any partitioning (or any pre-sketched shard of a 100 TB corpus)
    union + re-MAX into the same table. `p` is the precision: 2^p
    registers, the fixture default legibility-sized at 6, production
    12-14 (x63 gates the p=12 error contract)."""
    m = 1 << p
    h = hash32(F.col(value_col))
    return (
        df.select(*group_cols, h.alias("h"))
        .select(
            *group_cols,
            (F.col("h") % m).alias("bucket"),
            _rho(F.shiftright("h", p), 32 - p).alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_b"))
    )


def hll_estimate(
    regs: DataFrame, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Collapse a register table to the HLL cardinality estimate.

    Pure-integer core: S = Σ 2^(32-m_b) over present registers plus
    2^32 per absent register (absent ⇔ m_b = 0), all exact BIGINTs
    (≤ 64·2^32 < 2^39), so the indicator sum is partition-order-free.
    E_raw = alpha·m²·2^32 / S is one IEEE division of exact integers;
    the small-range correction E = m·ln(m/V) (when E_raw ≤ 2.5m and
    V = zero registers > 0) is ln of an exact rational. The result is
    snapped to the 1e-3 grid (HLL_EST_SCALE) on output."""
    m = 1 << p
    pow2_32 = 1 << 32
    # the Python shiftleft wrapper takes a literal shift; the SQL form
    # accepts a column shift
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 32 - m_b)")).alias("s_present"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    v = F.lit(m) - F.col("n_buckets")
    s = F.col("s_present") + v * F.lit(pow2_32)
    e_raw = (
        F.lit(hll_alpha(m) * m * m)
        * F.lit(float(pow2_32))
        / s.cast("double")
    )
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
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
    p: int = HLL_P,
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
        hll_registers(tok, "token", [group_col], p), [group_col], p
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


def hll_rollup(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    p: int = HLL_P,
    tag: str | None = None,
) -> DataFrame:
    """Distinct-cardinality at EVERY rollup level of ``group_cols``
    (finest → … → grand total, the SQL ``GROUP BY ROLLUP`` shape) from
    ONE scan of the data: the finest-level register table is computed
    once and MATERIALIZED — it is the shared intermediate of all levels
    — then each coarser level MAX-merges the register TABLE (≤ 2^p rows
    per fine group), never rescanning the input. This is the
    mergeability payoff of the HLL design (Flajolet et al. 2007, §3:
    registers form a monoid under element-wise MAX): any pre-aggregated
    shard — a day's partition, one source's sketch, yesterday's rollup —
    folds into any coarser total without touching raw data, which is
    exactly why COUNT(DISTINCT) dashboards over 100 TB are feasible.
    Each merge is EXACT, not approximate-on-approximate: merged
    registers are identical to registers computed directly at the
    coarser level (unit-tested), so every level carries the same error
    contract as a direct sketch.

    ``df`` is the pre-tokenized (group…, value) table (the caller owns
    tokenization so one explode can feed other consumers too). Group
    columns must be strings (masked-out levels emit NULL strings).
    Output: (level, *group_cols, hll_estimate) — ``level`` is the
    comma-joined retained prefix, ``'all'`` for the grand total.
    """
    from kafka_streams_learning_spark.operators.materialize import materialized

    fine = materialized(hll_registers(df, value_col, group_cols, p), tag=tag)
    parts = []
    for k in range(len(group_cols), -1, -1):
        keep = list(group_cols[:k])
        regs = (
            fine
            if k == len(group_cols)
            else fine.groupBy(*keep, "bucket").agg(F.max("m_b").alias("m_b"))
        )
        est = hll_estimate(regs, keep, p)
        cols = [F.lit(",".join(keep) if keep else "all").alias("level")]
        for c in group_cols:
            cols.append(
                F.col(c) if c in keep else F.lit(None).cast("string").alias(c)
            )
        parts.append(est.select(*cols, "hll_estimate"))
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out


def hll_token_rollup(
    df: DataFrame,
    group_cols: list[str],
    text_col: str = "text",
    p: int = HLL_P,
    tag: str | None = None,
) -> DataFrame:
    """`hll_rollup` over the corpus token stream: distinct-token counts
    per (source, lang), per source, and corpus-wide — one tokenize, one
    register build, sketch-sized merges upward (x68's operator)."""
    tok = df.select(
        *group_cols,
        F.explode(T.tokens(T.normalized_text(F.col(text_col)))).alias("token"),
    )
    return hll_rollup(tok, "token", group_cols, p, tag)


# ---------------------------------------------------------------------------
# Count-Min frequency sketch (Cormode & Muthukrishnan 2005): d counter
# rows × w buckets, update = +1 at one bucket per row, merge = elementwise
# SUM (associative, map-side combinable), point estimate = MIN over the d
# counters — an OVERestimate, never under. Everything is integer, so the
# sketch and its estimates replay bit-for-bit in the DuckDB oracle.

CMS_D = 4
CMS_W = 256


def _cms_probe_array(h: Column, d: int = CMS_D, w: int = CMS_W) -> Column:
    """array<struct<row_i,bucket>> of the d bucket probes for a
    32-bit base hash — the seeded-permutation family MinHash uses."""
    from kafka_streams_learning_spark.functions.hashing import perm_hash

    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                (perm_hash(h, i) % w).alias("bucket"),
            )
            for i in range(d)
        ]
    )


def cms_counters(
    df: DataFrame, value_col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """The (row_i, bucket, cnt) counter table of a Count-Min sketch over
    `value_col` occurrences. At most CMS_D × CMS_W rows TOTAL regardless
    of corpus size: the count aggregation partial-combines map-side, so
    the exchange carries sketch-sized state — the same merge contract as
    `hll_registers` (shards sketch independently, counters just add)."""
    h = hash32(F.col(value_col))
    return (
        df.select(F.explode(_cms_probe_array(h, d, w)).alias("p"))
        .select("p.row_i", "p.bucket")
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    queries: DataFrame,
    value_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Point-frequency estimates for `queries[value_col]`: MIN over the d
    probed counters (absent bucket ⇒ 0). The counter table is broadcast —
    it is at most CMS_D × CMS_W rows — so probing never shuffles the
    query side."""
    probes = queries.select(
        F.col(value_col),
        F.explode(_cms_probe_array(hash32(F.col(value_col)), d, w)).alias("p"),
    ).select(value_col, "p.row_i", "p.bucket")
    return (
        probes.join(F.broadcast(counters), ["row_i", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )


def cms_token_frequencies(
    df: DataFrame,
    k: int,
    text_col: str = "text",
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Calibration table for the Count-Min sketch: the k globally most
    frequent tokens with their exact count, the CMS estimate, and the
    overestimate delta (provably ≥ 0 — collisions only ADD). The exact
    heavy-hitter arm is the baseline the sketch replaces at scale: its
    token-key shuffle grows with the vocabulary, while the sketch's
    state is CMS_D×CMS_W counters forever."""
    tok = df.select(
        F.explode(T.tokens(T.normalized_text(F.col(text_col)))).alias("token")
    )
    counters = cms_counters(tok, "token", d, w)
    exact = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("token"))
        .limit(k)
    )
    est = cms_estimate(counters, exact.select("token"), "token", d, w)
    return exact.join(est, "token").select(
        "token",
        "n_exact",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("n_exact")).alias("overestimate"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership prefilter (Bloom 1970): BLOOM_K bit probes into
# an m-bit array packed 62 bits per BIGINT word (bit 63 overflows DuckDB's
# checked shift; 62 keeps every mask positive and portable). Build =
# bit_or aggregation (associative, mergeable); probe = pure bitwise
# expressions against the driver-resident word array — the pushed-down
# bloom-join pattern engines use to skip shuffles.

BLOOM_BITS = 1 << 14
BLOOM_WORD_BITS = 62
BLOOM_K = 3


def _bloom_probe_array(h: Column) -> Column:
    """array<struct<word,bit>> of the BLOOM_K bit positions for a hash."""
    from kafka_streams_learning_spark.functions.hashing import perm_hash

    probes = []
    for j in range(BLOOM_K):
        pos = perm_hash(h, j) % BLOOM_BITS
        probes.append(
            F.struct(
                (pos / F.lit(BLOOM_WORD_BITS)).cast("int").alias("word"),
                (pos % BLOOM_WORD_BITS).alias("bit"),
            )
        )
    return F.array(*probes)


def bloom_build(df: DataFrame, value_col: str) -> DataFrame:
    """(word, mask) rows of the Bloom filter over `value_col` — at most
    ceil(BLOOM_BITS/62) rows (~265). bit_or partial-aggregates map-side
    and merges associatively, so shards build independent filters that
    OR together — and the whole table collects to the driver in ~2 KB,
    ready to push into a scan as literal expressions."""
    probes = df.select(
        F.explode(_bloom_probe_array(hash32(F.col(value_col)))).alias("p")
    )
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), p.bit)")
    return (
        probes.select(F.col("p.word").alias("word"), mask.alias("m"))
        .groupBy("word")
        .agg(F.bit_or("m").alias("mask"))
    )


def bloom_contains(h: Column, words: list[int]) -> Column:
    """Membership test as a PURE expression: `words` is the dense
    driver-resident word array (index = word id, 0 = empty). All
    BLOOM_K probed bits must be set. No join, no shuffle — the filter
    rides inside whole-stage codegen on the scan, which is the entire
    point of blooming a 100 TB probe side. The per-bit mask comes from a
    62-entry power-of-two literal lookup (shiftleft's Python wrapper
    needs a literal shift; pow() would detour through doubles)."""
    from kafka_streams_learning_spark.functions.hashing import perm_hash

    arr = F.array(*[F.lit(int(w)) for w in words])
    powers = F.array(
        *[F.lit(1 << b).cast("long") for b in range(BLOOM_WORD_BITS)]
    )
    cond = None
    for j in range(BLOOM_K):
        pos = perm_hash(h, j) % BLOOM_BITS
        word = (pos / F.lit(BLOOM_WORD_BITS)).cast("int")
        bit = (pos % BLOOM_WORD_BITS).cast("int")
        hit = (
            F.element_at(arr, word + F.lit(1)).bitwiseAND(
                F.element_at(powers, bit + F.lit(1))
            )
            != 0
        )
        cond = hit if cond is None else (cond & hit)
    return cond


def bloom_words_dense(bloom: DataFrame) -> list[int]:
    """Collect a `bloom_build` table to the dense driver-side word array
    `bloom_contains` expects (missing words → 0)."""
    n_words = (BLOOM_BITS + BLOOM_WORD_BITS - 1) // BLOOM_WORD_BITS
    dense = [0] * n_words
    for r in bloom.collect():
        dense[r["word"]] = r["mask"]
    return dense


def bloom_decontamination(
    df: DataFrame,
    bench_mod: int = 97,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """x31's decontamination semantics with the Bloom filter standing in
    for the broadcast shingle SET: per non-benchmark document, the number
    of distinct shingles the bloom flags as benchmark members next to the
    exact count, plus the false-positive delta (bloom has no false
    negatives, so n_bloom_hits ≥ n_exact_hits always — the calibration
    row you consult before sizing BLOOM_BITS for a real eval suite).

    Scale shape: the filter builds from the (KB-sized) benchmark shingle
    set via a mergeable bit_or aggregation, collects to ~2 KB on the
    driver, and probes as PURE per-row expressions inside the corpus
    scan — zero joins and zero shuffles on the 100 TB side, strictly
    cheaper than x31's broadcast-hash-join probe. The exact arm keeps
    the broadcast join as ground truth."""
    from kafka_streams_learning_spark.functions.text import word_shingles
    from kafka_streams_learning_spark.operators.materialize import materialized

    base = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(F.col(text_col), k)).alias("_sh"),
    )
    # the postings feed THREE consumers (bloom build — collected eagerly —
    # the exact-arm bench set, and the corpus probe side); materializing
    # runs the tokenize+shingle pass once instead of three times (the
    # x07/x48 precedent)
    posts = materialized(
        base.select(
            "id", F.size("_sh").alias("n_shingles"), F.explode("_sh").alias("shingle")
        ),
        tag="x59-posts",
    )
    bench = posts.filter((F.col("id") % bench_mod) == 0).select("shingle").distinct()
    words = bloom_words_dense(bloom_build(bench, "shingle"))
    corpus = posts.filter((F.col("id") % bench_mod) != 0)
    return bloom_probe_score(corpus, bench, words, id_col=id_col)


def bloom_probe_score(
    posts: DataFrame,
    bench: DataFrame,
    words: list[int],
    id_col: str = "doc_id",
) -> DataFrame:
    """The shared decontamination probe + per-doc rollup: bloom probe as
    pure expressions, exact arm as a broadcast left join, integer hit
    counters per (id, n_shingles). Both x59 (batch) and s21 (streaming)
    run THIS code against the same oracle SQL, so their scoring cannot
    drift apart. `posts` may be batch or streaming: (id, n_shingles,
    shingle)."""
    marked = posts.withColumn(
        "bloom_hit", bloom_contains(hash32(F.col("shingle")), words)
    ).join(
        F.broadcast(bench.withColumn("exact_hit", F.lit(True))),
        "shingle",
        "left",
    )
    return (
        marked.groupBy("id", "n_shingles")
        .agg(
            F.sum(F.col("bloom_hit").cast("long")).alias("n_bloom_hits"),
            F.sum(F.coalesce(F.col("exact_hit"), F.lit(False)).cast("long")).alias(
                "n_exact_hits"
            ),
        )
        .select(
            F.col("id").alias(id_col),
            "n_shingles",
            "n_bloom_hits",
            "n_exact_hits",
            (F.col("n_bloom_hits") - F.col("n_exact_hits")).alias("n_false_pos"),
        )
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "semi",
) -> DataFrame:
    """Bloom-accelerated join: compile the small side's key set into a
    Bloom filter, prefilter the big side with pure per-row expressions
    INSIDE its scan, then run the real join on the survivors — the
    runtime-filter pattern (Spark's own `spark.sql.optimizer.
    runtimeFilter.bloomFilter.enabled` does this inside Catalyst for
    shuffle joins; this explicit form works on any plan and any join
    the optimizer won't touch, and its filter is engine-portable).

    Semantics are EXACTLY the plain join's (the bloom admits false
    positives, never false negatives, and the real join re-checks
    every survivor); the win is that non-matching big-side rows die in
    the scan instead of riding the exchange. ``how``: "semi", "inner",
    or "left_semi"-style membership via the same key column name on
    both sides.

    At 100 TB: the filter costs one broadcast-sized collect (~2 KB) and
    three bitwise expressions per row; every filtered row saves its
    shuffle/broadcast-probe cost. Worth it whenever the small side's
    selectivity on the big side is < ~50%. Catalog row x61 drives a
    real probe (orders vs a customer slice) and oracle-checks the
    output identical to the plain semi join; the plan shape (probe in
    the scan Filter, single broadcast re-check join) is pinned by
    tests/test_plans.py."""
    # the md5-based hash family is string-typed; hash the key's string
    # form (internal to the prefilter only — the real join re-checks on
    # the native type, so the cast cannot change semantics)
    keys = small.select(key).distinct()
    kb = keys.select(F.col(key).cast("string").alias(key))
    words = bloom_words_dense(bloom_build(kb, key))
    pre = big.filter(bloom_contains(hash32(F.col(key).cast("string")), words))
    if how == "semi":
        return pre.join(F.broadcast(keys), key, "semi")
    return pre.join(F.broadcast(small), key, how)


# ---------------------------------------------------------------------------
# Fixed-grid histogram quantile sketch: bucket counts over a uniform grid
# between the group's min and max. Counts are SUM-mergeable integers (the
# CMS contract); a quantile reads the first bucket whose cumulative count
# reaches the exact ordinal rank and answers with the bucket's upper
# edge — error bounded by one grid step, (vmax-vmin)/HISTQ_BUCKETS.
# Unlike Greenwald-Khanna (x24's approx arm, estimator-internal and NOT
# oracle-hashable), every step here is portable: integer counts, one IEEE
# bucket expression, one IEEE edge expression — the estimate itself goes
# through the DuckDB gate.

HISTQ_BUCKETS = 1024


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs: list[tuple[int, float]],
) -> DataFrame:
    """Per-group quantile estimates from the fixed-grid histogram, with
    the exact interpolated percentile (x24's portable contract) and the
    absolute error alongside — the calibration table for sizing
    HISTQ_BUCKETS. ``qs`` are (numerator-over-10000, display) pairs so
    rank arithmetic stays integer-exact (the x57 contract).

    Scale shape: one tiny per-group stats aggregate broadcasts back onto
    the scan; the histogram is ≤ groups × HISTQ_BUCKETS integer rows
    with map-side partial counts (mergeable across shards by SUM); the
    cumulative window and the rank probes run over the histogram, never
    the corpus. The exact arm (`percentile`) buffers each group's values
    — it is the documented expensive ground truth, like x54/x58's."""
    # NULL measurements are excluded up front: engines disagree on NULL
    # ordering inside the cumulative window (Spark first, DuckDB last)
    # and `percentile` skips NULLs while COUNT(*) would not — dropping
    # them keeps both arms consistent and portable
    df = df.filter(F.col(value_col).isNotNull())
    nb = HISTQ_BUCKETS
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    )
    v = F.col(value_col).cast("double")
    bucket = F.when(F.col("vmax") == F.col("vmin"), F.lit(0)).otherwise(
        F.least(
            F.floor(
                (v - F.col("vmin")) / (F.col("vmax") - F.col("vmin")) * F.lit(float(nb))
            ),
            F.lit(nb - 1),
        )
    )
    hist = (
        df.join(F.broadcast(stats), group_col)
        .select(group_col, bucket.alias("bucket"))
        .groupBy(group_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = df.groupBy(group_col).agg(
        *[
            F.percentile(value_col, disp).alias(f"e_{num}")
            for num, disp in qs
        ]
    )
    return histogram_quantile_collapse(hist, stats, exact, qs, group_col)


def histogram_quantile_collapse(
    hist: DataFrame,
    stats: DataFrame,
    exact: DataFrame,
    qs: list[tuple[int, float]],
    group_col: str,
) -> DataFrame:
    """Collapse a (group, bucket, cnt) histogram to the quantile table —
    shared by the batch builder above and the streaming twin (s19),
    which maintains `hist` as live state and collapses the final
    snapshot. `stats` carries (group, n, vmin, vmax); `exact` the
    per-q e_{num} percentile columns."""
    from pyspark.sql import Window

    nb = HISTQ_BUCKETS
    w = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    qarr = F.array(
        *[
            F.struct(F.lit(num).alias("qnum"), F.lit(disp).alias("q"))
            for num, disp in qs
        ]
    )
    probes = (
        cum.join(F.broadcast(stats), group_col)
        .select(group_col, "bucket", "cum", "n", F.explode(qarr).alias("p"))
        .select(group_col, "bucket", "cum", "n", "p.qnum", "p.q")
        .filter(F.col("cum") >= F.expr("(n * qnum + 9999) div 10000"))
        .groupBy(group_col, "q")
        .agg(F.min("bucket").alias("qb"))
    )
    est = F.col("vmin") + (F.col("qb") + F.lit(1)) * (
        F.col("vmax") - F.col("vmin")
    ) / F.lit(float(nb))
    # fold the per-q exact columns into one CASE keyed on the display
    # value; built in reverse so the first q claims the first branch
    exact_val = None
    for num, disp in reversed(qs):
        branch = F.col(f"e_{num}")
        exact_val = (
            branch
            if exact_val is None
            else F.when(F.col("q") == F.lit(disp), branch).otherwise(exact_val)
        )
    return (
        probes.join(F.broadcast(stats), group_col)
        .join(F.broadcast(exact), group_col)
        .select(
            group_col,
            "q",
            est.alias("hist_estimate"),
            exact_val.alias("exact_value"),
            F.abs(est - exact_val).alias("abs_err"),
        )
    )
