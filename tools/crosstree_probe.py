"""Cross-TREE A/B probe (VERDICT r14 item 2): time catalog rows from an
arbitrary engine tree — a `git archive` checkout of a verdict commit, or
this repo — with bench-identical setup, so two trees can be compared on
the same host with fresh JVMs and alternating invocation order.

Each invocation carries its own window-admissibility evidence: the batch
canary (x03_fingerprint, warm median-of-3 — CPU/page-cache pressure) and
the streaming canary (fixed 2-micro-batch count, fresh checkpoint per
sample — checkpoint/state-store I/O pressure) are timed before AND after
the row pass, using the TARGET tree's own operators, with the same clean
bands as tools/bench_paired.py. A sample whose canaries are out of band
is inadmissible; discard it, don't average it.

Usage: python tools/crosstree_probe.py <tree_root> [sf_dir] [row ...]
Prints one JSON line {"tree":..., "canary":[c0,c1], "canary_stream":
[s0,s1], "clean": bool, "queries": {...}, "total": ...}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

tree = os.path.abspath(sys.argv[1])
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
rows = sys.argv[3:]
sys.path.insert(0, tree)

# same bands as tools/bench_paired.py (duplicated literally: this script
# must not import from THIS repo once the target tree owns sys.path)
CANARY_HOT_THRESHOLD_S = 1.26  # 2x the cold clean ref (0.63)
STREAM_CANARY_HOT_THRESHOLD_S = 1.6
_STREAM_CANARY_SCHEMA = "key string, v long"


def main() -> int:
    from kafka_streams_learning_spark import get_spark
    from kafka_streams_learning_spark.catalog import all_queries
    from kafka_streams_learning_spark.catalog_ext import warm_shared_artifacts
    from kafka_streams_learning_spark.catalog_streaming import (
        REPLAY_CHUNKS,
        S24_LINEITEM_COLS,
        warm_streaming_stagings,
    )
    from kafka_streams_learning_spark.sources.batch import load_table
    from kafka_streams_learning_spark.sources.replay import (
        replay_stream,
        shared_replay_table,
        stage_explicit_chunks,
    )
    from kafka_streams_learning_spark.streaming import runner
    from kafka_streams_learning_spark.streaming.windows import (
        streaming_count_by_key,
    )

    spark = get_spark("crosstree-probe")
    spark.sparkContext.setLogLevel("ERROR")

    specs = {s.name: s for s in all_queries()}
    unknown = [r for r in rows if r not in specs]
    if unknown:
        raise SystemExit(f"unknown rows: {unknown}")

    # bench.py's exact setup split: stagings + shared artifacts are
    # harness scaffolding, paid before anything is timed
    load_table(spark, sf_dir, "events").limit(1000).write.format("noop").mode(
        "overwrite"
    ).save()
    shared_replay_table(spark, sf_dir, "events", REPLAY_CHUNKS)
    shared_replay_table(spark, sf_dir, "documents", REPLAY_CHUNKS, order_by="doc_id")
    shared_replay_table(spark, sf_dir, "orders", REPLAY_CHUNKS, order_by="o_orderdate")
    shared_replay_table(
        spark, sf_dir, "orders", REPLAY_CHUNKS, order_by="o_orderdate",
        columns=("o_orderkey", "o_custkey", "o_orderdate"),
    )
    shared_replay_table(
        spark, sf_dir, "lineitem", REPLAY_CHUNKS, order_by="l_shipdate",
        columns=("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"),
    )
    shared_replay_table(
        spark, sf_dir, "lineitem", REPLAY_CHUNKS, order_by="l_shipdate",
        columns=S24_LINEITEM_COLS,
    )
    warm_shared_artifacts(spark, sf_dir)
    warm_streaming_stagings(spark, sf_dir)

    import tempfile

    canary_stage = tempfile.mkdtemp(prefix="ksl-stream-canary-")
    chunks = [
        [(f"k{i % 100}", i) for i in range(c * 5000, (c + 1) * 5000)]
        for c in range(2)
    ]
    stage_explicit_chunks(spark, chunks, _STREAM_CANARY_SCHEMA, canary_stage)
    seq = [0]

    def stream_canary() -> float:
        samples = []
        for i in range(4):  # first run primes, untimed
            seq[0] += 1
            name = f"stream_canary_{seq[0]}"
            t0 = time.time()
            counted = streaming_count_by_key(
                replay_stream(spark, canary_stage, _STREAM_CANARY_SCHEMA),
                "key",
            )
            runner.run_to_memory(counted, name, "update", state_partitions=4)
            if i:
                samples.append(time.time() - t0)
            spark.catalog.dropTempView(name)
        return round(statistics.median(samples), 3)

    canary_spec = specs["x03_fingerprint"]

    def batch_canary() -> float:
        samples = []
        for i in range(4):
            t0 = time.time()
            canary_spec.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            if i:
                samples.append(time.time() - t0)
            spark.catalog.clearCache()
        return round(statistics.median(samples), 3)

    c0, s0 = batch_canary(), stream_canary()
    timings: dict[str, float] = {}
    for name in rows:
        spark.sparkContext.setJobDescription(f"crosstree {name}")
        t0 = time.time()
        specs[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        for t in spark.catalog.listTables():
            if t.isTemporary and "_out_" in t.name:
                spark.catalog.dropTempView(t.name)
    c1, s1 = batch_canary(), stream_canary()

    clean = all(c <= CANARY_HOT_THRESHOLD_S for c in (c0, c1)) and all(
        s <= STREAM_CANARY_HOT_THRESHOLD_S for s in (s0, s1)
    )
    print(json.dumps({
        "tree": tree,
        "sf_dir": sf_dir,
        "canary": [c0, c1],
        "canary_stream": [s0, s1],
        "clean": clean,
        "total": round(sum(timings.values()), 2),
        "queries": timings,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
