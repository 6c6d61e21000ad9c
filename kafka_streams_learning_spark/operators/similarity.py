"""Similarity search over an `array<float>` embedding column.

- brute_force_topk — exact cosine top-k for a set of query vectors.
  Plan shape: the (small) query set is broadcast against the (huge)
  corpus — the corpus never shuffles; per-query ranking is a window over
  query_id, which shuffles only (query × k-ish) candidate rows after a
  cheap per-partition pre-ranking could be applied. This is the exact
  baseline and the oracle-checkable surface.

- random-hyperplane LSH (`rh_lsh_buckets` / `lsh_topk`) — the scale path:
  sign-pattern bucketing of a deterministic pseudo-random hyperplane set
  (seeded from the portable md5 hash family, so buckets are reproducible
  anywhere). Neighbors are only searched within matching buckets —
  sub-linear candidate generation at the cost of recall; candidates are
  re-scored exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from kafka_streams_learning_spark.functions.vectors import cosine, norm
from kafka_streams_learning_spark.operators.guards import (
    guard_exact_arm as _guard_exact_arm,
)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 50_000,
    force: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (self-matches
    excluded). Deterministic ranking: (cosine desc, neighbor id asc).
    Returns (query_id, neighbor_id, rank, score).

    This is the exact calibration arm: with a query set that scales with
    the corpus (the catalog's ``ANN_QUERY_MOD`` sampling) the cross join
    is O(N²/mod), so a corpus past ``max_rows`` raises
    ``ExactArmSizeError`` unless ``force=True`` — same mechanical guard
    as ``embedding_near_dup_pairs``; the scale paths are ``ivf_topk`` /
    ``lsh_topk`` / ``ann_jl_topk``."""
    _guard_exact_arm(corpus, max_rows, force, "brute_force_topk",
                     "ivf_topk/lsh_topk/ann_jl_topk")
    q = broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j of
    plane p is derived from md5(p||j) mapped into [-1, 1). Reproducible in
    any engine with md5 — no RNG state, no library dependence."""
    import hashlib

    comps = []
    for j in range(dim):
        h = int(hashlib.md5(f"{plane}|{j}".encode()).hexdigest()[:15], 16)
        comps.append((h / float(16**15)) * 2.0 - 1.0)
    return comps


def rh_lsh_buckets(
    df: DataFrame,
    n_planes: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-pattern bucket id per vector: bit p = 1 iff v · plane_p ≥ 0.

    Each plane dot is a zip_with + sequential aggregate fold against the
    plane literals — measured ~3× faster than an unrolled element_at sum
    (the fold stays one tight codegen loop instead of a 512-node
    expression tree), and bit-identical to DuckDB's list_sum for the
    oracle."""
    terms = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(w) for w in _hyperplane(dim, p)])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        terms.append(F.when(dot >= 0, F.lit(2**p)).otherwise(F.lit(0)))
    bucket = terms[0]
    for t in terms[1:]:
        bucket = bucket + t
    return df.select(F.col(id_col), F.col(vec_col), bucket.cast("long").alias("bucket"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine re-scoring + ranking. Equi-join on bucket → hash join,
    never a cross product."""
    cb = rh_lsh_buckets(corpus, n_planes, dim, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "bucket"
    )
    qb = broadcast(
        rh_lsh_buckets(queries, n_planes, dim, id_col, vec_col).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket"
        )
    )
    scored = (
        cb.join(qb, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def normalized_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, nv) with nv = v / ||v|| in double — computed ONCE per vector.
    Cosine of two normalized vectors is a plain dot product, so pairwise
    scoring drops from 3 array folds to 1. Zero-norm vectors are EXCLUDED
    (cosine is undefined for them, and under Spark 4's default ANSI mode
    the division would otherwise abort the job); oracle SQL mirrors the
    same exclusion."""
    nrm = norm(F.col(vec_col))
    return (
        df.select(F.col(id_col), F.col(vec_col), nrm.alias("_nrm"))
        .filter(F.col("_nrm") > 0)
        .select(
            F.col(id_col),
            F.transform(
                F.col(vec_col), lambda x: x.cast("double") / F.col("_nrm")
            ).alias("nv"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    k: int,
    centroid_mod: int,
    query_mod: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the 100 TB ANN scale path.

    Fully deterministic so the DuckDB oracle replays it bit-for-bit:
    centroids are the vectors with `id % centroid_mod == 0` (no RNG, no
    training iterations), every vector is assigned to its nearest centroid
    (ties → lowest centroid id), queries (`id % query_mod == 0`) probe
    their `nprobe` nearest centroids, and only vectors in probed clusters
    are scored exactly.

    Plan shape at scale: the centroid table is broadcast, so assignment is
    a map-side scan + one partial-aggregated groupBy (shuffle = one row
    per vector); the probe set is broadcast back, so candidate generation
    is a broadcast hash join on cluster id — the corpus itself never
    shuffles more than once, and scored candidates per query are bounded
    by nprobe × average cluster size instead of N. In production the
    assignment is computed once and persisted alongside the embeddings.

    The per-pair dots stay the aggregate/zip_with FOLD deliberately
    (r14 negative result): `nv`/`cv` are transform-built expression
    arrays, not materialized columns, and an unrolled dot over them
    re-evaluates the normalization per element reference — measured 2×
    SLOWER end to end (1.7 → 3.4 s warm at sf0.1). The full
    width-sweep verdict on unrolling lives in functions/vectors.py's
    module docstring."""

    def _pair_dot(a: str, b: str):
        return F.aggregate(
            F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    n = normalized_vectors(corpus, id_col, vec_col)
    cent = broadcast(
        n.filter(F.col(id_col) % centroid_mod == 0).select(
            F.col(id_col).alias("cid"), F.col("nv").alias("cv")
        )
    )
    dot = _pair_dot("nv", "cv")
    # scored feeds two plan arms, but deliberately UNpersisted: the probe
    # arm's `id % query_mod` filter pushes below the cross join, so it
    # only re-scores the tiny query subset — caching N×centroids rows to
    # save that would cost far more than it saves at scale
    scored = n.crossJoin(cent).withColumn("score", dot)
    # argmax by (score desc, cid asc): the struct ordering embeds the
    # tie-break, so one max_by pass map-side-aggregates the assignment
    assign = scored.groupBy(id_col).agg(
        F.max_by("cid", F.struct(F.col("score"), (-F.col("cid")).alias("neg"))).alias(
            "cluster"
        ),
        F.first("nv").alias("nv"),  # constant within the group
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("cid"))
    probed = broadcast(
        scored.filter(F.col(id_col) % query_mod == 0)
        .select(
            F.col(id_col).alias("query_id"), F.col("nv").alias("qv"), "cid", "score"
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", F.col("cid").alias("cluster"))
    )
    qdot = _pair_dot("qv", "nv")
    cand = (
        assign.join(probed, "cluster")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("score", qdot)
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "score")
    )


def rh_band_buckets(
    df: DataFrame,
    bands: int,
    planes_per_band: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Banded sign-pattern buckets: one output row per (vector, band),
    where band b's bucket is the sign pattern of its own
    `planes_per_band` hyperplanes (global plane index b*ppb+j, same
    md5-seeded family as `rh_lsh_buckets`). Banding is the classic LSH
    OR-amplification: a pair is a candidate iff it collides in ANY band,
    which keeps recall high for genuinely-similar pairs while each band's
    bucket join stays an equi-join.

    All bands·ppb plane dots for a vector are computed in ONE
    Arrow-batched stage (`pandas_udf`): at bands=32/ppb=4 that is 128
    projections per vector, and both JVM-side forms measured
    interpretation-bound — 128 unrolled fold expressions cost ~15 s per
    2,000 vectors (codegen compile of a 170 KB node) and a
    `transform`-over-plane-literal costs ~9 s (higher-order functions
    evaluate interpreted, ~4 ms/vector — linear, but hopeless at real
    corpus sizes). The Arrow stage is a vectorized matrix product at
    ~µs/vector, exactly the "Python only when the built-ins genuinely
    can't express it efficiently" boundary (same policy as the x14
    decode stage; plan_audit allows ArrowEvalPython, forbids
    BatchEvalPython).

    Bit-exactness for the oracle: the numpy loop runs over DIMENSIONS in
    order, accumulating `acc = acc + x_j * p_j` across all (vector,
    plane) cells — element-wise double multiply then add, the identical
    IEEE operation sequence as the SQL fold `aggregate(zip_with(...))`,
    so bucket signs match DuckDB's replay bit-for-bit. Null or
    wrong-length vectors yield a NULL dots array, exactly like the
    zip_with fold (null propagates, every band falls to bucket 0)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    n_planes = bands * planes_per_band
    planes_m = np.asarray(
        [_hyperplane(dim, p) for p in range(n_planes)], dtype=np.float64
    )

    def _dots_fn(vecs):  # pd.Series -> pd.Series; hints omitted — the
        # in-function 'pd' import is invisible to pandas_udf's
        # string-annotation resolver under `from __future__ import annotations`
        res: list = [None] * len(vecs)
        idx, rows = [], []
        for i, v in enumerate(vecs):
            if v is not None and len(v) == planes_m.shape[1]:
                idx.append(i)
                rows.append(np.asarray(v, dtype=np.float64))
        if rows:
            x = np.stack(rows)                          # (m, dim)
            acc = np.zeros((len(rows), planes_m.shape[0]))
            for j in range(planes_m.shape[1]):          # fold order: dim-sequential
                acc = acc + x[:, j:j + 1] * planes_m[None, :, j][0]
            for i, a in zip(idx, acc):
                res[i] = a.tolist()
        return pd.Series(res)

    # non-decorator form: local type hints ('pd' imported in-function)
    # aren't resolvable by pandas_udf's hint inference
    _dots = pandas_udf(_dots_fn, "array<double>")
    staged = df.select(F.col(id_col), _dots(F.col(vec_col)).alias("_dots"))

    def _bucket(b):
        # b is a RUNTIME column (the band index), so this expression is
        # written once, not once per band — the tree stays constant-size
        # in `bands`. Unrolling 32 bands × 4 planes into literal-indexed
        # case-whens produced a 170 KB Generate node whose codegen
        # compile alone cost ~15 s per query (measured); this form plans
        # in milliseconds with identical output.
        terms = []
        for j in range(planes_per_band):
            dot = F.element_at(
                F.col("_dots"), (b * planes_per_band + j + 1).cast("int")
            )
            terms.append(F.when(dot >= 0, F.lit(2**j)).otherwise(F.lit(0)))
        bucket = terms[0]
        for t in terms[1:]:
            bucket = bucket + t
        return bucket

    entries = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"), _bucket(b).cast("long").alias("bucket")
        ),
    )
    return staged.select(
        F.col(id_col), F.explode(entries).alias("bb")
    ).select(
        F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def embedding_near_dup_pairs_lsh(
    df: DataFrame,
    threshold: float,
    bands: int = 32,
    planes_per_band: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int | None = 256,
) -> DataFrame:
    """Near-duplicate pairs via banded random-hyperplane LSH — the
    100 TB-safe path for `embedding_near_dup_pairs`. Candidate pairs come
    from equi-joining the banded bucket table with itself on
    (band, bucket) — a hash join, never a cross product — then are
    re-scored EXACTLY with the same normalized-dot scorer as the exact
    variant, so every emitted pair's score is identical to the exact
    form; only pairs that collide in no band (increasingly unlikely as
    similarity rises) can be missed.

    Plan shape at scale: the bucket table (bands rows/vector) and the
    normalized vectors materialize once each to run-scoped parquet; pair
    generation shuffles on (band, bucket); the distinct + two id-joins
    for re-scoring shuffle only the candidate set. Recall tuning: at real
    near-dup thresholds (cos ≥ 0.9, θ ≤ 26°) each band collides with
    probability (1-θ/π)^ppb — 0.54 at ppb=4 — so ``bands`` independent
    bands miss a true pair with probability (1-0.54)^bands (~2e-11 at
    the default bands=32); weak-similarity pairs (the fixture catalog's
    0.35 threshold) trade some recall for pruning.

    ``bucket_cap`` is the hard memory/size guard (the x07 df-cap pattern
    applied to vector buckets): per (band, bucket), only the first
    ``bucket_cap`` members — ordered by a band-keyed deterministic hash,
    so each band keeps a DIFFERENT subset of a hot region — enter the
    pair self-join; every member past the cap additionally emits ONE
    star candidate against the bucket's rank-1 anchor, so a bucket of
    k vectors emits ≤ cap²/2 + (k-cap) candidates no matter the corpus
    (without the star, a member capped out of every band — probability
    (1-cap/k)^bands for a k-member hot region — would emit zero
    candidates and its true near-dups go unreported). Star candidates
    flow through the same exact re-scoring, so a dissimilar
    anchor-member pair is dropped by the threshold like any other false
    candidate; a similar one reconnects the member to the dense region
    for downstream connected components. Without the cap, bucket
    occupancy grows linearly with the corpus (a 10x corpus probe OOM'd
    exactly here: GC-thrash then heap exhaustion in the bucket
    self-join at default params, tools/scale_probe.py). The
    truncation is one row_number window over the bucket table —
    bands·N rows, one exchange, never the corpus re-shuffled."""
    from kafka_streams_learning_spark.functions import hashing
    from kafka_streams_learning_spark.operators.materialize import materialized

    if bucket_cap is not None and bucket_cap < 1:
        # same contract as dedup.lsh_candidate_pairs: cap < 1 would make
        # the rank-1 member its own star anchor (self-pair emission)
        raise ValueError("bucket_cap must be >= 1 (or None for uncapped)")
    # zero-norm vectors never survive re-scoring (normalized_vectors
    # excludes them, so the candidate joins drop their pairs) — excluding
    # them BEFORE bucketing keeps the star-closure guarantee airtight: an
    # anchor is always scoreable, so a capped-out member's star pair can
    # never silently vanish at the scoring join. Output is identical
    # either way; the bucket table just stops carrying dead rows.
    df = df.filter(norm(F.col(vec_col)) > 0)
    bb = rh_band_buckets(df, bands, planes_per_band, dim, id_col, vec_col)
    overflow = None
    if bucket_cap is not None:
        order = hashing.hash60(
            F.concat(F.col("band").cast("string"), F.lit("|"),
                     F.col(id_col).cast("string"))
        )
        w = Window.partitionBy("band", "bucket").orderBy(order, F.col(id_col))
        bb = materialized(
            bb.withColumn("_rk", F.row_number().over(w)).withColumn(
                "_anchor",
                F.first(id_col).over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            ),
            tag="neardup-bands",
        )
        overflow = bb.filter(F.col("_rk") > bucket_cap).select(
            F.least("_anchor", F.col(id_col)).alias("vec_a"),
            F.greatest("_anchor", F.col(id_col)).alias("vec_b"),
        )
        bb = bb.filter(F.col("_rk") <= bucket_cap).select(
            id_col, "band", "bucket"
        )
    else:
        bb = materialized(bb, tag="neardup-bands")
    cand = (
        bb.select(F.col(id_col).alias("vec_a"), "band", "bucket")
        .join(bb.select(F.col(id_col).alias("vec_b"), "band", "bucket"),
              ["band", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
    )
    if overflow is not None:
        cand = cand.unionByName(overflow)
    cand = cand.distinct()
    n = materialized(normalized_vectors(df, id_col, vec_col), tag="neardup-norm")
    prods = F.zip_with(F.col("na"), F.col("nb"), lambda x, y: x * y)
    return (
        cand.join(n.select(F.col(id_col).alias("vec_a"), F.col("nv").alias("na")),
                  "vec_a")
        .join(n.select(F.col(id_col).alias("vec_b"), F.col("nv").alias("nb")),
              "vec_b")
        .withColumn("score", F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x))
        .filter(F.col("score") >= threshold)
        .select("vec_a", "vec_b", "score")
    )


EXACT_ARM_MAX_ROWS = 50_000


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = EXACT_ARM_MAX_ROWS,
    force: bool = False,
) -> DataFrame:
    """Near-duplicate pairs (a < b) with cosine ≥ threshold. Vectors are
    normalized once per side before the pair join, so each of the O(n²)
    pairs costs one dot product instead of dot+2 norms (3× fewer flops —
    measured 74s → ~25s on the sf0.1 bench). Exact form is a self
    cross-join — the calibration/ground-truth arm, NEVER the production
    path; at 100 TB the LSH-bucketed variant
    (`embedding_near_dup_pairs_lsh`) bounds pair generation and
    re-scores candidates exactly the same way.

    Because nothing else stops a caller pointing this at a full corpus,
    the quadratic arm is mechanically guarded: if the input exceeds
    ``max_rows`` (a cheap ``limit(max_rows+1).count()`` probe, never a
    full scan) it raises unless ``force=True``. Fixtures are ≤ 2,000
    vectors at sf0.1, far under the default bound."""
    _guard_exact_arm(df, max_rows, force, "embedding_near_dup_pairs",
                     "embedding_near_dup_pairs_lsh")
    n = normalized_vectors(df, id_col, vec_col)
    a = n.select(F.col(id_col).alias("vec_a"), F.col("nv").alias("na"))
    b = n.select(F.col(id_col).alias("vec_b"), F.col("nv").alias("nb"))
    # the fold stays deliberately (r14 negative result): na/nb are
    # transform-built expression arrays and an unrolled dot re-evaluates
    # them per element reference — measured 2.5× slower (3.4 → 8.8 s
    # warm at sf0.1); width-sweep verdict in functions/vectors.py
    score = _pair_score("na", "nb")
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("score", score)
        .filter(F.col("score") >= threshold)
        .select("vec_a", "vec_b", "score")
    )


def _pair_score(a: str, b: str):
    """One aggregate-fold dot product per (already-normalized) pair."""
    prods = F.zip_with(F.col(a), F.col(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def semantic_near_dup_pairs(
    df: DataFrame,
    centroids: dict[int, list[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_cap: int | None = 512,
) -> DataFrame:
    """SemDeDup-style semantic dedup: exact cosine pairs (a < b, score ≥
    threshold) generated only WITHIN a k-means cluster. The second
    bounded-pair scale path next to the banded LSH (x26): cluster
    assignment is a zero-shuffle expression over driver-trained centroids
    (`clustering.kmeans_centroids`), then pairs come from an equi-join on
    the cluster id — pair count is Σ|cluster|², never n². At 100 TB pick
    k so clusters stay ~10³-10⁴ vectors (SemDeDup uses k in the tens of
    thousands); with few clusters the equi-join skews, which AQE skew
    splitting handles since the join is key-equal, not cartesian.
    Scoring matches `embedding_near_dup_pairs` exactly: normalize once
    per side, one dot product per pair.

    ``cluster_cap`` is the guard for when k is NOT sized to the corpus
    (the catalog's fixed-k fixture, or a production run whose corpus
    outgrew its clustering): per cluster, only the first cap members
    under a salted deterministic hash order generate pairs — Σ|cluster|²
    becomes ≤ k·cap², never quadratic in N. The r9 10x-corpus probe
    measured the uncapped form at 42x runtime for 10x data (2,500-member
    clusters → 3M pairs each); production SemDeDup avoids this by
    scaling k ~ N/10³, and the cap enforces the same bound mechanically.
    Fixture cluster sizes are ≤ 266 at sf0.1 (measured), so the default
    never binds at oracle scale."""
    from kafka_streams_learning_spark.operators import clustering

    assigned = clustering.assign_clusters(
        df, clustering._dense(centroids), vec_col=vec_col
    ).withColumn("cluster", clustering._relabel(centroids))
    nrm = norm(F.col(vec_col))
    base = (
        assigned.select(id_col, "cluster", F.col(vec_col), nrm.alias("_nrm"))
        .filter(F.col("_nrm") > 0)
        .select(
            F.col(id_col),
            F.col("cluster"),
            F.transform(
                F.col(vec_col), lambda x: x.cast("double") / F.col("_nrm")
            ).alias("nv"),
        )
    )
    if cluster_cap is not None:
        from kafka_streams_learning_spark.functions import hashing

        order = hashing.hash60(
            F.concat(F.lit("sem|"), F.col(id_col).cast("string"))
        )
        w = Window.partitionBy("cluster").orderBy(order, F.col(id_col))
        base = (
            base.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= cluster_cap)
            .drop("_rk")
        )
    a = base.select("cluster", F.col(id_col).alias("vec_a"), F.col("nv").alias("na"))
    b = base.select("cluster", F.col(id_col).alias("vec_b"), F.col("nv").alias("nb"))
    return (
        a.join(b, "cluster")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("score", _pair_score("na", "nb"))
        .filter(F.col("score") >= threshold)
        .select("cluster", "vec_a", "vec_b", "score")
    )


def _rademacher(out_comp: int, dim: int) -> list[float]:
    """Deterministic ±1 Rademacher row for output component `out_comp`:
    the sign of input position j comes from md5 parity — the dense ±1
    JL variant of Achlioptas (2003), reproducible in any engine with
    md5 and no RNG state (the `_hyperplane` recipe with a 2-point
    distribution)."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"jl|{out_comp}|{j}".encode()).hexdigest()[:15], 16) % 2
        == 0
        else -1.0
        for j in range(dim)
    ]


def jl_project(
    df: DataFrame,
    out_dim: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection x → Rx/√out_dim with a
    deterministic ±1 Rademacher matrix — the standard compression pass
    run over an embedding corpus BEFORE similarity search: pairwise
    distances survive within (1±ε) at out_dim = O(ln n/ε²), and every
    downstream ANN probe (x09/x13/x18) gets a dim/out_dim-fold cheaper
    dot product.

    Determinism/portability: the matrix is a pure function of md5 (no
    RNG), each projected component is a sequential left-fold dot
    (`F.aggregate` — bit-identical to DuckDB's `list_sum`, the measured
    x18 contract), and components snap to the 1e-6 fixed-point grid and
    ship as a comma-joined INTEGER string — no float formatting in the
    output, so rows hash identically across engines.

    Scale shape: one narrow per-row Arrow stage — ZERO shuffles; all
    out_dim components of a vector are computed in a single vectorized
    matrix product (`_jl_snapped_arrow` — see there for why expressions
    lost this slot in r14 and why the result is bit-identical). The ±1
    matrix is a deterministic md5 function baked into the kernel, never
    a join side."""
    snapped = _jl_snapped_arrow(out_dim, dim, scale)
    base = df.select(F.col(id_col), snapped(F.col(vec_col)).alias("_jlc"))
    return base.select(
        F.col(id_col),
        F.concat_ws(
            ",", *[F.get("_jlc", c).cast("string") for c in range(out_dim)]
        ).alias("proj_q"),
    )


def _jl_snapped_arrow(out_dim: int, dim: int, scale: int):
    """The out_dim grid-snapped JL components as ONE `array<long>`-valued
    Arrow-batched stage — the one Spark-side definition both `jl_project`
    (CSV output) and `jl_project_vectors` (search-ready array) derive
    from.

    Why Arrow and not expressions (r14): the previous per-component
    `aggregate(zip_with(...))` folds evaluate INTERPRETED (~1 µs per
    element), which measured ~0.9 ms/vector at out_dim=16 × dim=64 — the
    dominant cost of x50 and of x52's projection stage; and unrolling
    the folds into literal expression chains re-created the
    `rh_band_buckets` 170 KB-node codegen blow-up (measured again this
    round: 1.4 s/query → 9.5 s/query). This is the exact boundary that
    module's `_dots_fn` already adjudicated: a vectorized matrix product
    at ~µs/vector, "Python only when the built-ins genuinely can't
    express it efficiently" (plan_audit allows ArrowEvalPython, forbids
    BatchEvalPython).

    Bit-exactness for the oracle (the same argument, extended to the
    snap): the numpy loop runs over DIMENSIONS in order, accumulating
    `acc = acc + x_j * s_j` from a float64 zero — the identical IEEE
    sequence as the SQL fold (np.zeros' +0.0 start reproduces the fold's
    `0.0 + t1` exactly, signed zeros included); inputs widen f32→f64
    exactly like the fold's cast; and the snap `floor(acc·inv·scale+0.5)`
    applies the same three float64 ops in the same order before the
    int64 floor. Pinned by tests/test_properties.py::
    test_jl_project_matches_python_model (hypothesis, float32 inputs)
    and the x50/x52 oracle rows. NULL vectors and rows whose length ≠
    dim yield a NULL component array, exactly like the fold's
    zip_with null-padding. A NaN/Inf element (impossible under the
    floor-parity oracle contract, which no engine pair would survive,
    but pinned so a loosened contract can't silently diverge — VERDICT
    r14 item 8) follows the fold's `floor(double)` = Math.floor + JVM
    (long) cast: NaN → 0, out-of-range/±Inf saturate to Long.MIN/MAX
    (`_floor_cast_long`, parity test in tests/test_properties.py).
    Residual, documented divergence: a NULL ELEMENT inside a float
    vector reaches this kernel as NaN (Arrow's pandas conversion erases
    the child validity bitmap), so it takes the NaN path where the fold
    would NULL the row via `acc + NULL` — indistinguishable at this
    boundary, and doubly unreachable under the contract."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    r = np.asarray(
        [_rademacher(c, dim) for c in range(out_dim)], dtype=np.float64
    )  # (out_dim, dim)
    inv = 1.0 / math.sqrt(out_dim)
    fscale = float(scale)

    def _floor_cast_long(snapped):
        """JVM semantics of Spark's floor(double): (long) Math.floor(x).
        numpy's astype(int64) is platform-defined on NaN/out-of-range;
        Java defines NaN → 0 and saturation at Long.MIN/MAX."""
        hi, lo = np.iinfo(np.int64).max, np.iinfo(np.int64).min
        out = np.zeros(snapped.shape, dtype=np.int64)  # NaN slots stay 0
        big = snapped >= 9.223372036854775808e18  # 2**63
        small = snapped <= -9.223372036854775809e18  # < -2**63
        mid = ~(big | small | np.isnan(snapped))
        out[big] = hi
        out[small] = lo
        out[mid] = snapped[mid].astype(np.int64)  # exact: in-range doubles
        return out

    def _fn(vecs):  # pd.Series -> pd.Series (hints omitted: in-function
        # 'pd' import is invisible to pandas_udf's string-annotation
        # resolver under `from __future__ import annotations`)
        res: list = [None] * len(vecs)
        idx, rows = [], []
        for i, v in enumerate(vecs):
            if v is not None and len(v) == dim:
                idx.append(i)
                rows.append(np.asarray(v, dtype=np.float64))
        if rows:
            x = np.stack(rows)                      # (m, dim)
            acc = np.zeros((len(rows), out_dim))
            for j in range(dim):                    # fold order: dim-sequential
                acc = acc + x[:, j : j + 1] * r[:, j]
            comps = _floor_cast_long(np.floor(acc * inv * fscale + 0.5))
            for i, a in zip(idx, comps):
                res[i] = a.tolist()
        return pd.Series(res)

    return pandas_udf(_fn, "array<long>")


def jl_project_vectors(
    df: DataFrame,
    out_dim: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """(id, original vector, proj) with proj the grid-snapped JL
    components as array<double> (component = quantized integer / scale) —
    both engines search IDENTICAL projected vectors, so candidate sets
    replay exactly."""
    snapped = _jl_snapped_arrow(out_dim, dim, scale)
    base = df.select(
        F.col(id_col), F.col(vec_col), snapped(F.col(vec_col)).alias("_jlc")
    )
    proj = F.array(
        *[
            F.get("_jlc", c).cast("double") / F.lit(float(scale))
            for c in range(out_dim)
        ]
    )
    return base.select(F.col(id_col), F.col(vec_col), proj.alias("proj"))


def jl_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    out_dim: int = 16,
    dim: int = 64,
    overfetch: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN over the JL-compressed space: rank all pairs by
    cosine of the out_dim-dim projections (dim/out_dim-fold cheaper per
    pair than x09's exact scan), keep the top overfetch·k candidates per
    query, then re-score ONLY the survivors with the exact full-dim
    cosine — the compressed-scan + exact-re-rank pattern (the dense
    cousin of product-quantization search; x13/x18 remain the bucketed
    sub-linear arms).

    Identity contract (same as brute_force_topk's family): `queries` is
    assumed to share the corpus id space — rows where ``neighbor_id ==
    query_id`` are self-matches and are excluded. If you pass a query
    table with an INDEPENDENT id space, any accidental id collision
    silently drops a legitimate corpus candidate; disjoint ids mean no
    self-exclusion happens at all. Re-key one side first if your query
    set is not a corpus subset.

    Plan shape: corpus scans once with the projection inline; queries
    (with their projections) broadcast; the candidate cap is a literal
    rank filter, so each task prunes to its local top-M per query
    (WindowGroupLimit) BEFORE the query-key exchange, and the exact
    re-rank window reuses the same partitioning — one exchange total.
    The full-dim vector rides along only for the ≤M survivors per task,
    so the shuffle payload is bounded by tasks × M × dim, not n × dim.

    The projected corpus is MATERIALIZED first: `cosine` expands its
    argument three times (dot + both norms), so an inline projection
    would re-evaluate the 16×64-literal fold tree per pair and the
    codegen blow-up dominates runtime (~20s → ~3s measured at
    sf0.001). At scale this is the natural shape anyway — the projected
    table (x50's output) is computed once and searched many times. The
    projection NORM is precomputed per ROW on both sides too: a plain
    cosine() per pair would refold both 16-element norms for every
    (query, candidate) pair — two-thirds of the candidate-scan flops
    for values that are per-row constants."""
    from kafka_streams_learning_spark.functions.vectors import dot, norm as vnorm
    from kafka_streams_learning_spark.operators.materialize import materialized

    # the 16-dim candidate dot and norms stay the aggregate FOLD: the
    # r14 unrolled-expression sweep measured the alternatives across
    # widths — 16 terms NEUTRAL here (same-session A/B 2.4-2.8 s both
    # arms), 192 terms (x09's cosine) 4× WORSE, 1024 terms (the
    # projection) catastrophically worse — so the fold is the right
    # form at every width; the row's r14 win is the Arrow projection
    # stage, not the pair scan
    cp = materialized(
        jl_project_vectors(corpus, out_dim, dim, id_col, vec_col).withColumn(
            "nrm", vnorm(F.col("proj"))
        ),
        tag="x52-proj",
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("proj").alias("c_proj"),
        F.col("nrm").alias("c_nrm"),
    )
    qp = broadcast(
        jl_project_vectors(queries, out_dim, dim, id_col, vec_col)
        .withColumn("nrm", vnorm(F.col("proj")))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.col("proj").alias("q_proj"),
            F.col("nrm").alias("q_nrm"),
        )
    )
    denom = F.col("q_nrm") * F.col("c_nrm")
    cand = cp.join(qp, F.col("neighbor_id") != F.col("query_id")).withColumn(
        "pscore",
        F.when(denom > 0, dot(F.col("q_proj"), F.col("c_proj")) / denom),
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("pscore").desc(), F.col("neighbor_id")
    )
    pruned = (
        cand.withColumn("prank", F.row_number().over(wc))
        .filter(F.col("prank") <= overfetch * k)
        .withColumn("score", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        pruned.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def rh_lsh_plan(
    cos_threshold: float, planes_per_band: int, target_recall: float = 0.999
) -> dict:
    """Bands needed for the random-hyperplane LSH to reach
    ``target_recall`` on pairs at ``cos_threshold`` — the sizing
    companion to `embedding_near_dup_pairs_lsh` (as `dedup.lsh_plan`
    is to the MinHash variant). Per band, a pair at angle θ =
    arccos(s) collides with probability p = (1-θ/π)^ppb (Charikar
    2002); b bands miss it with (1-p)^b, so b =
    ⌈ln(1-recall)/ln(1-p)⌉. Driver-side pure math; pass the result's
    ``bands`` to the operator. Also returns the per-band collision
    probability and the realized recall at the threshold."""
    if not -1.0 < cos_threshold < 1.0:
        raise ValueError("cos_threshold must be in (-1, 1)")
    if not 0.0 < target_recall < 1.0:
        raise ValueError("target_recall must be in (0, 1)")
    theta = math.acos(cos_threshold)
    p_band = (1.0 - theta / math.pi) ** planes_per_band
    if p_band <= 0.0:
        raise ValueError("per-band collision probability is 0 at this threshold")
    bands = max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_band)))
    return {
        "bands": bands,
        "p_band": p_band,
        "recall_at_threshold": 1.0 - (1.0 - p_band) ** bands,
    }
