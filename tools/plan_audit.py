"""Catalog-wide physical-plan anti-pattern sweep.

tests/test_plans.py pins ~40 hand-chosen plan shapes; this sweep is the
complement — EVERY batch catalog row's plan is checked against the two
hard scale rules that hold with no per-query judgment:

- **No row-at-a-time Python UDFs** (`BatchEvalPython`): the hot path
  must stay JVM-side or Arrow-batched (`ArrowEvalPython` from Pandas
  UDFs is allowed where declared; row-at-a-time never is).
- **No CartesianProduct**: every join must be key-based or a broadcast
  nested loop against a driver-small side. A plain cartesian over two
  distributed relations is the one shape that cannot survive scale.
  (The documented exact arms x09/x10 cross-join a BROADCAST query set,
  which plans as BroadcastNestedLoopJoin — not whitelisted here because
  it never appears as CartesianProduct.)

Streaming rows are skipped: their queries RUN during construction and
their stateful shapes are pinned by dedicated tests in
tests/test_streaming.py / test_plans.py.

Usage: python tools/plan_audit.py [sf_dir]    (default sf0.001)
Exits 1 on any violation. Also importable: `audit(spark, sf_dir)`
returns the violation list (used by tests/test_plans.py to make the
sweep a CI gate).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORBIDDEN = ("BatchEvalPython", "CartesianProduct")


def audit(spark, sf_dir: str) -> list[tuple[str, str]]:
    """[(query_name, forbidden_node)] across all batch catalog rows."""
    from kafka_streams_learning_spark.catalog import REFERENCE_QUERIES
    from kafka_streams_learning_spark.catalog_ext import EXTENSION_QUERIES
    from kafka_streams_learning_spark.plans import explain as E

    violations: list[tuple[str, str]] = []
    for spec in REFERENCE_QUERIES + EXTENSION_QUERIES:
        plan = E.formatted_plan(spec.spark(spark, sf_dir))
        for node in FORBIDDEN:
            if node in plan:
                violations.append((spec.name, node))
    return violations


def main() -> int:
    from kafka_streams_learning_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    violations = audit(spark, sf_dir)
    for name, node in violations:
        print(f"VIOLATION {name}: {node}")
    if not violations:
        from kafka_streams_learning_spark.catalog_ext import EXTENSION_QUERIES
        from kafka_streams_learning_spark.catalog import REFERENCE_QUERIES

        n = len(REFERENCE_QUERIES) + len(EXTENSION_QUERIES)
        print(f"OK: no {'/'.join(FORBIDDEN)} in any of {n} batch plans")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
