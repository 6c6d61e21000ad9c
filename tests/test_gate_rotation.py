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
    # explicit root → filename-based round (counts failure-only rounds);
    # a bare current_round(newest) is the pure-simulation shape and
    # deliberately ignores the live repo's artifact files (ADVICE r9)
    from kafka_streams_learning_spark.gate_rotation import repo_root

    cur = current_round(newest, repo_root())
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


# ---------------------------------------------------------------------------
# Properties of the LRU rotation itself (pure Python, no Spark). Two
# separately-honest claims: (1) when prefix rows gate GREEN, staleness is
# bounded over any history — growth within the new-row cap, any starting
# state; (2) a row whose gate attempt FAILS keeps its old round and so
# rotates straight back into the next prefix (retry priority). Under
# sustained mass failure no ordering can bound staleness — that case is
# what test_no_row_staler_than_bound_after_this_gate catches on the real
# history.

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    n_start=st.integers(min_value=1, max_value=150),
    rounds=st.integers(min_value=4, max_value=12),
    growth=st.lists(
        st.integers(min_value=0, max_value=MAX_NEW_ROWS_PER_ROUND),
        min_size=12, max_size=12,
    ),
)
def test_lru_rotation_bounds_staleness(n_start, rounds, growth):
    """With green gates, no row's gap since its last driver verification
    (or since entering the catalog) ever exceeds MAX_STALE_ROUNDS, as
    long as the catalog stays within MAX_STALE_ROUNDS × cap rows."""
    cap = GATE_PREFIX_CAP
    names = [f"q{i}" for i in range(n_start)]
    newest: dict[str, int] = {}
    entered = {n: 0 for n in names}
    for rnd in range(1, rounds + 1):
        for name in rotation_sort(names, newest)[:cap]:
            newest[name] = rnd
        for _ in range(growth[rnd % len(growth)]):
            if len(names) >= MAX_STALE_ROUNDS * cap:
                break
            n = f"q{len(names)}"
            names.append(n)
            entered[n] = rnd
        for n in names:
            last = max(newest.get(n, 0), entered[n])
            assert rnd - last <= MAX_STALE_ROUNDS, (
                n, rnd, newest.get(n), entered[n], len(names),
            )


@settings(max_examples=100, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=150),
    bad=st.integers(min_value=0, max_value=149),
    rounds=st.integers(min_value=3, max_value=8),
)
def test_failed_row_rotates_back_into_the_prefix(n, bad, rounds):
    """A row that keeps FAILING its gate keeps round 0 in `newest`, so it
    re-enters every subsequent prefix (never silently parked): failures
    get retried at the next opportunity, they don't count as fresh.
    With n > cap the never-gated backlog drains first — ceil(n/cap)
    rounds until every OTHER row has a green round — after which the
    still-never-green row fronts every prefix."""
    cap = GATE_PREFIX_CAP
    names = [f"q{i}" for i in range(n)]
    bad_name = f"q{bad % n}"
    newest: dict[str, int] = {}
    backlog_rounds = math.ceil(n / cap)
    for rnd in range(1, rounds + 1):
        prefix = rotation_sort(names, newest)[:cap]
        for name in prefix:
            if name != bad_name:
                newest[name] = rnd
        if rnd > backlog_rounds:
            assert bad_name in prefix


def test_rotation_survives_corrupt_artifacts(tmp_path):
    """A truncated/corrupt CORRECTNESS file must not kill query listing —
    it is skipped for green rows, but its FILENAME still counts as a
    gated round (ADVICE r8: an all-failure round must still advance the
    simulated upcoming-gate round, else the staleness-bound test is
    weakened by a round)."""
    import json

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": {"rows_match": True, "schema_match": True,
                          "hash_match": True}})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text("{ TRUNCATED")
    newest = newest_green_rounds(str(tmp_path))
    assert newest == {"a": 1}
    # r02 was attempted (the file exists), so the upcoming round is 3
    assert current_round(newest, str(tmp_path)) == 3
    assert rotation_sort(["a", "b"], newest) == ["b", "a"]


def test_current_round_counts_all_failure_rounds(tmp_path):
    """ADVICE r8 item 2: a committed round whose every row FAILED must
    still advance current_round — green rows alone would be off by one."""
    import json

    (tmp_path / "CORRECTNESS_r04.json").write_text(
        json.dumps({"a": {"rows_match": True, "schema_match": True,
                          "hash_match": True}})
    )
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps({"a": {"rows_match": False, "schema_match": False,
                          "hash_match": False}})
    )
    newest = newest_green_rounds(str(tmp_path))
    assert newest == {"a": 4}  # r05 failure does not demote the green
    from kafka_streams_learning_spark.gate_rotation import latest_gated_round

    assert latest_gated_round(str(tmp_path)) == 5
    assert current_round(newest, str(tmp_path)) == 6


def test_rows_only_rows_detected_and_flagged(tmp_path):
    """VERDICT r8 'What's wrong' #2, policy-as-code: a row whose NEWEST
    verification is rows-only (no value hash) is surfaced by
    rows_only_names(); a later hash-green round clears it."""
    import json

    from kafka_streams_learning_spark.gate_rotation import rows_only_names

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "hashed": {"rows_match": True, "schema_match": True,
                   "hash_match": True},
        "weak": {"rows_match": True, "schema_match": True,
                 "hash_match": None},
        "cleared": {"rows_match": True, "schema_match": True},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "cleared": {"rows_match": True, "schema_match": True,
                    "hash_match": True},
    }))
    assert rows_only_names(str(tmp_path)) == {"weak"}


def test_gate_prefix_md_flags_every_rows_only_row():
    """The committed GATE_PREFIX.md must carry the 'rows-only' flag on
    every row whose newest driver verification lacked a value hash, so
    weaker evidence can never silently rotate a row out of the gate."""
    import os

    from kafka_streams_learning_spark.gate_rotation import (
        repo_root,
        rows_only_names,
    )

    weak = rows_only_names()
    path = os.path.join(repo_root(), "GATE_PREFIX.md")
    if not weak:
        return  # today: every row has an oracle and hash-matched
    with open(path) as fh:
        text = fh.read()
    for name in weak:
        assert f"{name}  (rows-only" in text, (
            f"{name} verified rows-only but not flagged in GATE_PREFIX.md"
        )


def test_no_rows_only_rows_remain():
    """VERDICT r9 item 7: every catalog row has a full-strength oracle —
    zero rows whose newest driver verification was the weaker rows-only
    check. A new non-SQL-expressible op that genuinely cannot have an
    oracle must be added to the documented allowlist here, not slipped
    past the assertion."""
    from kafka_streams_learning_spark.gate_rotation import rows_only_names

    allowed_rows_only: set[str] = set()  # nothing is exempt today
    assert rows_only_names() <= allowed_rows_only, (
        f"rows-only catalog rows appeared: {rows_only_names() - allowed_rows_only}; "
        "give them oracle_sql() entries or add a documented exemption"
    )


def test_catalog_growth_frozen_at_waiver():
    """VERDICT r9 item 6: the catalog may not grow past
    CATALOG_SIZE_WAIVER (109 at freeze time) while the driver gate stays
    a 50-row prefix — every added row dilutes the 3-round staleness
    bound. New operators replace lower-value rows or ship gate-neutral;
    raising the waiver is an explicit reviewed act in the commit that
    adds the row."""
    from kafka_streams_learning_spark.gate_rotation import CATALOG_SIZE_WAIVER

    names = [q.name for q in all_queries()]
    assert len(names) <= CATALOG_SIZE_WAIVER, (
        f"catalog grew to {len(names)} rows past the {CATALOG_SIZE_WAIVER} "
        "freeze; replace a lower-value row, ship gate-neutral, or bump "
        "CATALOG_SIZE_WAIVER deliberately with the staleness math"
    )
