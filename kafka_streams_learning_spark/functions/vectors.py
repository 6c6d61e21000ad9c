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


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; zero-norm vectors yield NULL rather than NaN."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)
