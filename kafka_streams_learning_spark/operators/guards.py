"""Mechanical size guards for the deliberately-quadratic calibration arms.

The catalog keeps two exact/uncapped diagnostics next to their bounded
production twins (`embedding_near_dup_pairs` ↔ the banded-LSH x26 path,
`sketch_calibration`'s uncapped candidate set ↔ the capped x11 path).
They exist to produce ground truth at fixture scale; nothing about their
PLAN stops a caller from running them on a 100 TB corpus, where the
cross-join / uncapped bucket join is guaranteed to fail slowly. These
guards convert that documentation-only risk into a mechanical one: a
cheap bounded row probe at plan-build time, raising with a pointer to
the scale-path twin unless the caller explicitly forces the run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class ExactArmSizeError(ValueError):
    """Raised when a calibration-only quadratic arm sees a real corpus."""


# (semanticHash, max_rows) -> bounded row probe; lives for the process
# like the sibling catalog memos — a fixture never mutates mid-process
_PROBE_CACHE: dict[tuple[int, int], int] = {}


def guard_exact_arm(
    df: DataFrame,
    max_rows: int,
    force: bool,
    arm: str,
    scale_twin: str,
) -> None:
    """Raise ``ExactArmSizeError`` if ``df`` has more than ``max_rows``
    rows and ``force`` is not set.

    The probe is ``df.limit(max_rows + 1).count()`` — Spark stops
    producing rows at the limit, so the cost is bounded by ``max_rows``
    regardless of corpus size (never a full scan) — and it is memoized
    per (semantic plan, max_rows), so plan-only consumers that construct
    the same arm repeatedly (the determinism sweep's two sessions, plan
    audits, bench warm repeats) pay the action once per process, the
    same construction-time-action discipline as the x13 count memo.
    """
    if force:
        return
    key = (df.semanticHash(), max_rows)
    probe = _PROBE_CACHE.get(key)
    if probe is None:
        probe = df.limit(max_rows + 1).count()
        _PROBE_CACHE[key] = probe
    if probe > max_rows:
        raise ExactArmSizeError(
            f"{arm} is the exact calibration arm (quadratic pair "
            f"generation) and its input exceeds max_rows={max_rows}; "
            f"use the bounded scale path {scale_twin} instead, or pass "
            f"force=True if you really want the exact form (expect "
            f"O(n^2) pairs)."
        )
