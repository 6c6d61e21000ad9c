"""Deterministic sampling / split operators for training-data pipelines.

A training corpus needs reproducible train/val/test assignment and
class-balanced subsampling that behave identically on every run, on any
engine, at any parallelism. Randomness here is the portable md5-derived
hash family (`functions/hashing.py`) — no RNG state, no seed plumbing, no
sampleBy approximation — so the DuckDB oracle replays every assignment
bit-for-bit and re-runs are stable even as the corpus grows (a document's
split never changes when other documents are added).

Reference scope note: the reference engine (its-rahulsoni/
kafka-streams-learning) has no sampling surface at all (SURVEY §2.14);
these are pipeline extensions in the same oracle-checked catalog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_streams_learning_spark.functions import hashing

SPLIT_SALT = "split"
BALANCE_SALT = "bal"


def keyed_hash(id_col: str, salt: str) -> Column:
    """The sampler family's salted id-hash — the ONE Spark-side
    definition of `hash60(salt|id)`; `keyed_hash_sql` is its oracle
    mirror. Every sampler (split/balance/mixture/quality) derives its
    decision from this pair, so the cross-engine contract lives in
    exactly one place."""
    return hashing.hash60(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))


def keyed_hash_sql(id_expr: str, salt: str) -> str:
    """DuckDB mirror of :func:`keyed_hash`."""
    return hashing.hash60_sql(f"'{salt}|' || CAST({id_expr} AS VARCHAR)")


def _bucket(id_col: str, salt: str, mod: int) -> Column:
    """Deterministic bucket in [0, mod) from the row id — hash60 is
    non-negative in a signed long, so `%` is safe in every engine."""
    return (keyed_hash(id_col, salt) % mod).cast("int")


def hash_split(
    df: DataFrame,
    splits: list[tuple[str, int]],
    id_col: str = "doc_id",
    salt: str = SPLIT_SALT,
) -> DataFrame:
    """Assign each row to a named split by hashing its id into one of 100
    buckets and carving the bucket range by the given percentages
    (e.g. [("train", 80), ("val", 10), ("test", 10)]).

    Scale shape: a pure per-row expression — no shuffle, no state, fully
    codegen'd next to the scan; at 100 TB the split column costs one md5
    per row and partition pruning survives untouched. Adding documents
    never reassigns existing ones (contrast `randomSplit`, which depends
    on partition layout and seed)."""
    assert sum(p for _, p in splits) == 100, "split percentages must total 100"
    bucket = _bucket(id_col, salt, 100)
    edge = 0
    expr = None
    for name, pct in splits:
        edge += pct
        cond = bucket < edge
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.select(
        F.col(id_col), bucket.alias("bucket"), expr.alias("split")
    )


def hash_split_bucket_sql(id_expr: str, salt: str = SPLIT_SALT) -> str:
    """DuckDB SQL computing the same bucket as :func:`hash_split`."""
    return f"CAST({keyed_hash_sql(id_expr, salt)} % 100 AS INT)"


def balanced_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = BALANCE_SALT,
) -> DataFrame:
    """Downsample every stratum to the size of the smallest one (exact
    class balancing): rows within a stratum are ranked by a deterministic
    hash of their id and the first `cap` survive.

    The cap is computed eagerly (one tiny aggregate collected to the
    driver) so the rank filter is a LITERAL — that lets Spark plan a
    `WindowGroupLimit`, pruning each task's input to its local top-cap
    rows BEFORE the per-stratum exchange. With few strata the exchange is
    inherently skewed; the partial limit bounds what each task ships to
    cap rows, so the skew costs memory proportional to cap, not to the
    stratum size."""
    cap = df.groupBy(strata_col).count().agg(F.min("count")).collect()[0][0]
    w = Window.partitionBy(strata_col).orderBy(keyed_hash(id_col, salt), F.col(id_col))
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(cap))
        .select(F.col(id_col), F.col(strata_col), F.col("rk"))
    )


def balanced_order_sql(id_expr: str, salt: str = BALANCE_SALT) -> str:
    """DuckDB SQL for the in-stratum ordering hash of :func:`balanced_sample`."""
    return keyed_hash_sql(id_expr, salt)


MIX_SALT = "mix"
_MIX_SCALE = float(1 << 60)  # exact power of two; hash60's range


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = MIX_SALT,
) -> DataFrame:
    """Deterministic domain-mixture sampler: draw from each stratum so the
    kept corpus approaches the target mixture `weights` (relative, need
    not sum to 1) while keeping as much data as possible — the standard
    pretraining-mix operation (e.g. MassiveText's per-source sampling
    weights). The scale factor T = min_s(n_s / w_s) saturates the
    scarcest stratum; every stratum keeps rate_s = w_s * T / n_s of its
    rows, chosen by a per-row hash threshold.

    Scale shape — the zero-shuffle-on-facts contrast to `balanced_sample`:
    the fact table is never exchanged. One tiny count aggregate (map-side
    partial, |strata| rows) joins the weight table, reduces to the scalar
    T, and broadcasts per-stratum rates back onto the scan; the keep
    decision is then a pure per-row expression (one md5 against a
    threshold). At 100 TB: one scan + one broadcast of |strata| rows.
    Rate-based sampling keeps counts binomially close to the target
    rather than exact — `balanced_sample` is the exact-count arm when
    that trade-off flips. Strata absent from `weights` get weight 0 (the
    inner join drops them); a document's keep decision never changes when
    other documents arrive (same hash-stability contract as
    `hash_split`)."""
    spark = df.sparkSession
    w_df = spark.createDataFrame(
        [(s, float(w)) for s, w in sorted(weights.items())], [strata_col, "wt"]
    )
    counts = df.groupBy(strata_col).count()
    joined = counts.join(F.broadcast(w_df), strata_col)
    t_row = joined.agg(F.min(F.col("count") / F.col("wt")).alias("t"))
    rates = joined.crossJoin(F.broadcast(t_row)).select(
        strata_col,
        F.least(F.lit(1.0), (F.col("wt") * F.col("t")) / F.col("count")).alias("rate"),
    )
    return _rate_keep(df.join(F.broadcast(rates), strata_col), id_col, salt).select(
        F.col(id_col), F.col(strata_col)
    )


def _rate_keep(df: DataFrame, id_col: str, salt: str) -> DataFrame:
    """Shared keep-filter of the rate-based samplers (mixture, quality):
    a row survives iff its salted id-hash clears the row's ``rate``
    threshold — one definition so the Spark filter and every oracle's
    `keyed_hash_sql` comparison can never drift apart."""
    h = keyed_hash(id_col, salt)
    return df.filter(h < F.floor(F.col("rate") * F.lit(_MIX_SCALE)).cast("long"))


def mixture_hash_sql(id_expr: str, salt: str = MIX_SALT) -> str:
    """DuckDB SQL computing the same keep-hash as :func:`mixture_sample`."""
    return keyed_hash_sql(id_expr, salt)


def temporal_split(
    df: DataFrame,
    frac_train: float,
    group_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Temporal train/heldout split with GROUP integrity: every group
    (user) lands wholly on one side, decided by its FIRST event time —
    train = the earliest `frac_train` of groups, heldout = the rest. The
    standard leakage guard when training on behavioral data: the heldout
    set is strictly "users who first appeared later", so no user
    contributes to both sides and the cut is a point in (anchor-) time.

    Exact form: anchors are |groups| rows (one partial-agg groupBy of the
    fact table), then ONE global rank window over those anchors — ranked
    by (anchor, group) so ties are deterministic. The global window is a
    single-partition sort of |groups| rows, NOT |events|; that is fine up
    to ~10M groups. Beyond that use :func:`temporal_split_approx`, which
    replaces the rank with an approx-percentile scalar cutoff and stays
    fully parallel (same output contract, cutoff placement within the
    sketch's rank error)."""
    anchors = df.groupBy(group_col).agg(F.min(ts_col).alias("anchor"))
    w = Window.orderBy("anchor", group_col)
    ranked = anchors.select(
        group_col,
        "anchor",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    is_train = F.col("rn") <= F.floor(F.lit(float(frac_train)) * F.col("n"))
    return ranked.select(
        group_col,
        "anchor",
        F.when(is_train, F.lit("train")).otherwise(F.lit("heldout")).alias("split"),
    )


def temporal_split_approx(
    df: DataFrame,
    frac_train: float,
    group_col: str = "user_id",
    ts_col: str = "ts",
    accuracy: int = 10000,
) -> DataFrame:
    """Scale arm of :func:`temporal_split`: the cutoff anchor is an
    approx_percentile scalar (GK sketch, fixed memory), broadcast back as
    a literal comparison — no global window, no single-partition sort;
    every stage is parallel at any group count. Groups whose anchor
    equals the cutoff go to train (<=), so the split is still total and
    deterministic for a given sketch result."""
    anchors = df.groupBy(group_col).agg(F.min(ts_col).alias("anchor"))
    cut = anchors.agg(
        F.expr(
            f"approx_percentile(anchor, {float(frac_train)!r}, {accuracy})"
        ).alias("cut")
    )
    return anchors.crossJoin(F.broadcast(cut)).select(
        group_col,
        "anchor",
        F.when(F.col("anchor") <= F.col("cut"), F.lit("train"))
        .otherwise(F.lit("heldout"))
        .alias("split"),
    )


QUALITY_SALT = "qsample"


def quality_weighted_sample(
    scored: DataFrame,
    rates: dict[str, float],
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
    salt: str = QUALITY_SALT,
) -> DataFrame:
    """Quality-weighted corpus selection: keep each document with the
    probability its quality bucket prescribes (e.g. CCNet head 1.0 /
    middle 0.5 / tail 0.125) — the soft alternative to hard-dropping
    the tail, used when low-quality slices should survive at reduced
    weight (the DCLM / FineWeb-style weighting step downstream of a
    quality classifier).

    Same determinism/scale contract as `mixture_sample`: the ≤|buckets|
    rate table broadcasts onto the scan and the keep decision is one
    per-row md5 threshold — zero shuffle on the scored table, and a
    document's fate never changes as other documents arrive. Rates are
    exact binary fractions in the catalog so both engines compare the
    hash against the identical integer threshold."""
    spark = scored.sparkSession
    r_df = spark.createDataFrame(
        [(b, float(r)) for b, r in sorted(rates.items())], [bucket_col, "rate"]
    )
    return _rate_keep(
        scored.join(F.broadcast(r_df), bucket_col), id_col, salt
    ).select(F.col(id_col), F.col(bucket_col))


def quality_hash_sql(id_expr: str, salt: str = QUALITY_SALT) -> str:
    """DuckDB SQL computing the same keep-hash as
    :func:`quality_weighted_sample`."""
    return keyed_hash_sql(id_expr, salt)


EPOCH_SALT = "epoch"


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = EPOCH_SALT,
) -> DataFrame:
    """Deterministic per-epoch training-order shuffle: every row gets a
    (shard, pos) coordinate that is a pure function of (id, epoch) —
    the reproducible alternative to `orderBy(rand())` for laying out
    training examples each epoch. Re-running any epoch replays the exact
    order (resumable training, bitwise-auditable data order); epochs
    decorrelate because the salt folds the epoch number into the hash.

    Scale shape: shard = id-hash mod n_shards (per-row expression), pos =
    rank within shard by a SECOND independent hash — ONE exchange on
    shard and a per-shard sort bounded by |corpus|/n_shards. Pick
    n_shards = target output-file count at scale (thousands): shards
    sort in parallel, no global sort of the corpus ever runs."""
    shard = _bucket(id_col, f"{salt}-shard|{epoch}", n_shards)
    order = keyed_hash(id_col, f"{salt}-pos|{epoch}")
    w = Window.partitionBy("shard").orderBy("ord", id_col)
    return (
        df.select(F.col(id_col), shard.alias("shard"), order.alias("ord"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )


def length_band_filter(
    df: DataFrame,
    lo_frac: float = 0.05,
    hi_frac: float = 0.95,
    length_col: str = "n_chars",
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Percentile band trim per group: keep rows whose length sits inside
    the [lo_frac, hi_frac] ordinal band of their group's length
    distribution — the standard per-language outlier trim (truncated
    boilerplate at the short end, concatenation accidents at the long
    end) applied before tokenization.

    Exact-ordinal contract (no interpolation, engine-portable): with
    n = group size, the lower threshold is the SMALLEST length whose
    cumulative count reaches ceil(lo_frac·n), the upper the smallest
    reaching ceil(hi_frac·n); ceil is computed on exact integers as
    -floor(-a/b) = (a + b - 1) DIV b, never through a float.

    Scale shape — the corpus is NEVER windowed: lengths collapse first to
    a (group, length, cnt) histogram (one map-side-combinable shuffle,
    |groups|·|distinct lengths| rows — bounded, lengths are ints); the
    cumulative window runs over that tiny histogram; the two thresholds
    per group then BROADCAST back onto the scan as a hash join + filter.
    A row_number window over the raw corpus would sort whole groups in
    single tasks — the skew trap this shape exists to avoid."""
    from pyspark.sql import Window

    hist = df.groupBy(group_col, length_col).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(length_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n_grp", F.sum("cnt").over(Window.partitionBy(group_col))
    )

    def _ceil_rank(frac_num: int, frac_den: int) -> Column:
        # ceil(n_grp * num / den) via integer DIV — `/` would route
        # through a double and lose exactness past 2^53 rows per group
        return F.expr(f"(n_grp * {frac_num} + {frac_den - 1}) div {frac_den}")

    # fractions as exact integer ratios over 10000 so no float touches the
    # rank computation (round, not int: int(0.3*10000) is 2999 — IEEE 0.3
    # times 1e4 lands just under 3000)
    lo_num, hi_num, den = round(lo_frac * 10000), round(hi_frac * 10000), 10000
    bands = cum.groupBy(group_col).agg(
        F.min(
            F.when(F.col("cum") >= _ceil_rank(lo_num, den), F.col(length_col))
        ).alias("lo_len"),
        F.min(
            F.when(F.col("cum") >= _ceil_rank(hi_num, den), F.col(length_col))
        ).alias("hi_len"),
    )
    return (
        df.join(F.broadcast(bands), group_col)
        .filter(
            (F.col(length_col) >= F.col("lo_len"))
            & (F.col(length_col) <= F.col("hi_len"))
        )
        .select(id_col, group_col, length_col, "lo_len", "hi_len")
    )
