"""s05 KTable-enrichment phase probe (VERDICT r12 item 3).

Attributes s05's micro-batch time across its three phases —
(a) changelog staging (setup, cached per process), (b) KTable
materialization (the 2-batch foreachBatch upsert), (c) snapshot read +
broadcast enrich join over the 2-chunk orders replay — and A/Bs the
r13 upsert changes (adaptive num_buckets + persisted batch) against the
r12 shape (fixed num_buckets=16), 3 reps each, with value-hash parity
between variants asserted per rep.

Usage: python tools/ktable_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_learning_spark import get_spark  # noqa: E402
from kafka_streams_learning_spark.catalog_streaming import (  # noqa: E402
    REPLAY_CHUNKS,
    STATE_SHARDS,
    _s05_changelog,
)
from kafka_streams_learning_spark.operators.joins import enrich_join  # noqa: E402
from kafka_streams_learning_spark.sources.replay import (  # noqa: E402
    replay_stream,
    run_staging_dir,
    shared_replay_table,
)
from kafka_streams_learning_spark.streaming import ktable, runner  # noqa: E402


def result_hash(df) -> str:
    rows = sorted(
        "\x1f".join("<NULL>" if v is None else str(v) for v in r) for r in df.collect()
    )
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def run_s05(spark, sf: str, num_buckets: int | None, tag: str,
            fpt: int = 1) -> tuple[dict, str]:
    timings: dict[str, float] = {}
    t0 = time.time()
    staged, chlog_schema, dim_rows = _s05_changelog(spark, sf)
    timings["staging"] = round(time.time() - t0, 3)

    t0 = time.time()
    snapshot_dir = run_staging_dir("snap")
    ktable.materialize_ktable(
        replay_stream(spark, staged, chlog_schema),
        snapshot_dir, key="c_custkey", version_col="_version",
        num_buckets=num_buckets,
        expected_rows=None if num_buckets is not None else dim_rows,
    )
    timings["materialize"] = round(time.time() - t0, 3)

    t0 = time.time()
    dim = ktable.read_snapshot(spark, snapshot_dir).drop("_version")
    orders = shared_replay_table(
        spark, sf, "orders", REPLAY_CHUNKS, order_by="o_orderdate",
        files_per_trigger=fpt,
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    joined = enrich_join(
        orders.withColumn("c_custkey", F.col("o_custkey")), dim, on="c_custkey"
    ).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
        "c_name", "c_mktsegment", "c_acctbal",
    )
    name = f"s05_probe_{tag}"
    runner.run_to_memory(joined, name, "append", state_partitions=STATE_SHARDS)
    out = spark.table(name)
    h = result_hash(out)
    timings["join"] = round(time.time() - t0, 3)
    timings["total"] = round(sum(timings.values()), 3)
    return timings, h


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    results: dict[str, list[dict]] = {"r12_nb16": [], "r13_adaptive": []}
    for rep in range(reps):
        from kafka_streams_learning_spark.sources.replay import (
            ALL_STAGED_ONE_BATCH,
        )

        t16, h16 = run_s05(spark, sf, 16, f"nb16_{rep}", fpt=1)
        tad, had = run_s05(spark, sf, None, f"ad_{rep}",
                           fpt=ALL_STAGED_ONE_BATCH)
        assert h16 == had, f"hash divergence rep {rep}: {h16} != {had}"
        results["r12_nb16"].append(t16)
        results["r13_adaptive"].append(tad)
        print(json.dumps({"rep": rep, "nb16": t16, "adaptive": tad,
                          "hash_parity": True}))

    def med(rows, k):
        v = sorted(r[k] for r in rows)
        return v[len(v) // 2]

    print(json.dumps({
        "sf": sf, "reps": reps, "hash_parity": True,
        "median": {
            v: {k: med(rows, k) for k in ("staging", "materialize", "join", "total")}
            for v, rows in results.items()
        },
    }))


if __name__ == "__main__":
    main()
