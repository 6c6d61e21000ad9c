"""Vector expressions over `array<float>` embedding columns.

Dot product / norm / cosine as higher-order-function expressions
(`zip_with` + `aggregate`) — JVM-side, no UDF, no Arrow hop — so ANN
scans over billions of vectors stay inside codegen. Accumulation is in
DOUBLE for numeric stability regardless of the storage float width.

The fold form is a MEASURED decision, not a default (r14 unrolled-
expression sweep, OPTIMIZATION_r14.md): replacing the fold with a
literal left-associated `get(a,j)*get(b,j)` chain at statically-known
length was NEUTRAL at 16 terms (jl_topk's candidate scan, same-session
A/B), 4× WORSE at 192 terms (brute-force cosine: 3 dots × 64 dims per
pair), and ~7× worse at 1024 terms (the JL projection — giant
expression trees hit codegen/planning collapse; rh_band_buckets'
docstring records the same cliff at 512). The fold's tight loop beats
the unrolled tree at every width that matters; when a per-row vector
kernel is genuinely interpretation-bound, the answer is an Arrow batch
stage (`similarity._jl_snapped_arrow`, `rh_band_buckets._dots_fn`),
never expression unrolling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; zero-norm vectors yield NULL rather than NaN."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)
