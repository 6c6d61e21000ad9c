"""Portable deterministic hashing primitives.

Dedup/sketch operators (MinHash, SimHash, fingerprints) need a hash that is
(a) computable as a pure Catalyst expression (JVM-side, codegen-friendly)
and (b) *reproducible outside Spark* so the DuckDB oracle can verify every
sketch bit-for-bit. `xxhash64`/`hash` are Spark-private algorithms, so we
derive integers from `md5` hex — identical in any engine.

At 100 TB this stays the right call: md5 on a short shingle is a few ns,
the expression pipelines inside whole-stage codegen, and there is no Python
in the path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 60-bit hashes (15 hex chars) keep values positive in a signed 64-bit long
# in every engine — no unsigned-overflow edge cases.
_HEX_CHARS_60 = 15
# 32-bit hashes (8 hex chars) for SimHash bit sampling.
_HEX_CHARS_32 = 8


def hash60(col: Column) -> Column:
    """Deterministic 60-bit non-negative hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, _HEX_CHARS_60), 16, 10).cast("long")


def hash32(col: Column) -> Column:
    """Deterministic 32-bit non-negative hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, _HEX_CHARS_32), 16, 10).cast("long")


def seeded_hash60(col: Column, seed: int) -> Column:
    """Family of independent 60-bit hash functions, indexed by seed —
    the MinHash "permutations". h_seed(x) = hash60(seed || '|' || x)."""
    return hash60(F.concat(F.lit(f"{seed}|"), col))


def hash60_sql(expr: str) -> str:
    """DuckDB SQL text computing the same value as :func:`hash60`."""
    return f"CAST('0x' || substr(md5({expr}), 1, {_HEX_CHARS_60}) AS BIGINT)"


def hash32_sql(expr: str) -> str:
    """DuckDB SQL text computing the same value as :func:`hash32`."""
    return f"CAST('0x' || substr(md5({expr}), 1, {_HEX_CHARS_32}) AS BIGINT)"


def seeded_hash60_sql(expr: str, seed: int) -> str:
    """DuckDB SQL mirror of :func:`seeded_hash60`."""
    return hash60_sql(f"'{seed}|' || {expr}")
