"""Mechanical enforcement of the gate-rotation policy (VERDICT r7 item 2).

The external driver verifies only a ~50-entry prefix of queries() per
round; gate_rotation.py orders the catalog least-recently-driver-verified
first so every row re-gates within ceil(catalog/50) rounds. These tests
make the guarantee fail-loud: the suite goes red if the UPCOMING gate
would leave any row staler than the bound, or if a round adds more new
rows than one prefix rotation can absorb. No Spark session needed — the
inputs are the committed CORRECTNESS_r*.json artifacts and the catalog.
"""

from __future__ import annotations

import math

import pytest

from kafka_streams_learning_spark.catalog import all_queries
from kafka_streams_learning_spark.gate_rotation import (
    GATE_PREFIX_CAP,
    MAX_NEW_ROWS_PER_ROUND,
    MAX_STALE_ROUNDS,
    current_round,
    gated_names,
    newest_green_rounds,
    rotation_sort,
)


@pytest.fixture(scope="module")
def newest() -> dict[str, int]:
    return newest_green_rounds()


def test_catalog_order_is_the_lru_rotation(newest):
    """all_queries() must BE the rotation order — a hand reorder (the
    rounds 5-7 failure mode) breaks the staleness bound silently."""
    names = [q.name for q in all_queries()]
    assert names == [
        q.name for q in rotation_sort(all_queries(), newest)
    ]
    # LRU invariant: no row inside the prefix was verified more recently
    # than any row outside it (never-gated = round 0 sorts first)
    rounds = [newest.get(n, 0) for n in names]
    inside, outside = rounds[:GATE_PREFIX_CAP], rounds[GATE_PREFIX_CAP:]
    if inside and outside:
        assert max(inside) <= min(outside)


def test_no_row_staler_than_bound_after_this_gate(newest):
    """Simulate the upcoming driver gate: prefix rows get re-verified at
    the current round, the rest keep their newest committed round. No
    row's staleness may then exceed MAX_STALE_ROUNDS. The bound itself
    is recomputed from the live catalog size, so growing the catalog
    past MAX_STALE_ROUNDS * 50 rows fails here instead of silently
    stretching the rotation period."""
    if not newest:  # fresh checkout without driver artifacts
        pytest.skip("no committed CORRECTNESS_r*.json")
    names = [q.name for q in all_queries()]
    bound = math.ceil(len(names) / GATE_PREFIX_CAP)
    assert bound <= MAX_STALE_ROUNDS, (
        f"catalog ({len(names)} rows) outgrew the {MAX_STALE_ROUNDS}-round "
        f"rotation guarantee at a {GATE_PREFIX_CAP}-row gate prefix"
    )
    cur = current_round(newest)
    stale = {}
    for i, name in enumerate(names):
        effective = cur if i < GATE_PREFIX_CAP else newest.get(name, 0)
        if cur - effective > MAX_STALE_ROUNDS:
            stale[name] = f"r{newest.get(name, 0):02d} at position {i + 1}"
    assert not stale, (
        f"rows that would exceed the {MAX_STALE_ROUNDS}-round driver-"
        f"verification staleness bound after the r{cur:02d} gate: {stale}"
    )


def test_new_catalog_rows_per_round_capped(newest):
    """Rows never attempted by any committed driver gate are this round's
    additions. More than MAX_NEW_ROWS_PER_ROUND of them would displace
    the rotation band out of the prefix and compound freshness debt —
    the exact r6/r7 failure (13 new rows -> the stale cohort GREW)."""
    if not newest:
        pytest.skip("no committed CORRECTNESS_r*.json")
    seen = gated_names()
    new_rows = [q.name for q in all_queries() if q.name not in seen]
    assert len(new_rows) <= MAX_NEW_ROWS_PER_ROUND, (
        f"{len(new_rows)} never-gated catalog rows this round "
        f"(cap {MAX_NEW_ROWS_PER_ROUND}): {new_rows}"
    )
