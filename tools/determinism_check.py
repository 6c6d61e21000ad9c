"""Partition-count invariance sweep: the determinism audit.

The catalog's cross-engine hash gate proves Spark-vs-DuckDB agreement at
ONE parallelism; this sweep proves the stronger in-engine claim the
docstrings make everywhere — results are PARTITION-ORDER-FREE (exact
integer sums, snapped doubles, fixed-order folds) — by executing every
batch row under two different `spark.sql.shuffle.partitions` settings
(session-level conf, two sessions over one context) and comparing the
order-insensitive value hashes. A float aggregate that silently depended
on partition boundaries (the bug class the integer-cents / snap6
contracts exist to prevent) fails here even though a single-setting
oracle run could pass by luck.

Streaming rows are skipped: their state-shard invariance is covered by
the dedicated checkpoint/recovery and `state_partitions` tests.

Usage: python tools/determinism_check.py [sf_dir] [p1] [p2]
(defaults: sf0.001, 32, 5). Exits 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from kafka_streams_learning_spark import get_spark
    from kafka_streams_learning_spark.catalog import REFERENCE_QUERIES
    from kafka_streams_learning_spark.catalog_ext import EXTENSION_QUERIES
    from tools.oracle_check import table_hash

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    p1 = sys.argv[2] if len(sys.argv) > 2 else "32"
    p2 = sys.argv[3] if len(sys.argv) > 3 else "5"

    base = get_spark("determinism-check")
    base.sparkContext.setLogLevel("ERROR")
    sessions = []
    for p in (p1, p2):
        s = base.newSession()
        s.conf.set("spark.sql.shuffle.partitions", p)
        # per-query state (model caches, materializations) must not leak
        # a result computed under the OTHER parallelism — it cannot: the
        # caches key on sf only and their contents are themselves the
        # partition-free contract under test, so sharing them is the
        # stricter check (a cache filled at p1 must reproduce at p2)
        sessions.append(s)

    bad = []
    for spec in REFERENCE_QUERIES + EXTENSION_QUERIES:
        hashes = []
        for s in sessions:
            df = spec.spark(s, sf_dir)
            rows = [tuple(r) for r in df.collect()]
            hashes.append((len(rows), table_hash(df.columns, rows)))
        if hashes[0] != hashes[1]:
            bad.append(spec.name)
            print(f"MISMATCH {spec.name}: p={p1} -> {hashes[0]}, "
                  f"p={p2} -> {hashes[1]}")
    if not bad:
        n = len(REFERENCE_QUERIES) + len(EXTENSION_QUERIES)
        print(f"OK: {n} batch queries hash-identical at "
              f"shuffle.partitions={p1} and {p2} ({sf_dir})")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
