"""Vector expressions over `array<float>` embedding columns.

Dot product / norm / cosine as higher-order-function expressions
(`zip_with` + `aggregate`) — JVM-side, no UDF, no Arrow hop — so ANN
scans over billions of vectors stay inside codegen. Accumulation is in
DOUBLE for numeric stability regardless of the storage float width.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_n(a: Column, b: Column, n: int) -> Column:
    """`dot` for arrays whose length is STATICALLY known: the fold is
    unrolled into a left-associated sum of n products, which whole-stage
    codegen compiles — higher-order functions (`aggregate`/`zip_with`)
    evaluate INTERPRETED at ~1 µs per element, which r14 measured as the
    dominant cost of every per-pair ANN scan (x52's 16-dim candidate
    scan, x13's 64-dim centroid dots).

    Bit-exactness vs `dot`: the fold computes ((0.0+t1)+t2)+…+tn and the
    unrolled chain (t1+t2)+…+tn — identical IEEE sequences because
    0.0+t1 == t1 for every t1 except -0.0 (where the difference is the
    sign of a zero, which Spark's float ordering, the 1e-6 grid snap,
    and the DuckDB oracle's own UNROLLED sums — `_jl_comp_sql`, `_udot`
    — all treat as equal; this is the same adjudication the oracle side
    recorded when it unrolled). Length semantics match the fold exactly
    via the size guard: any row where either array's length ≠ n yields
    NULL, as zip_with's null-padding does in `dot`.

    ONLY use over CONCRETE arrays (a materialized/cached relation, a
    broadcast side, or a scanned column). Over a transform-built
    expression array the n element references re-evaluate the defining
    expression n times — measured 2-2.5x SLOWER than the fold on
    ivf_topk / embedding_near_dup_pairs (r14 negative result, recorded
    in OPTIMIZATION_r14.md), which is why those scorers keep `dot`."""
    terms = [
        F.get(a, j).cast("double") * F.get(b, j).cast("double")
        for j in range(n)
    ]
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    return F.when((F.size(a) == n) & (F.size(b) == n), s)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def norm_n(a: Column, n: int) -> Column:
    """`norm` with the statically-known-length unrolled dot (see dot_n)."""
    return F.sqrt(dot_n(a, a, n))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; zero-norm vectors yield NULL rather than NaN."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)
