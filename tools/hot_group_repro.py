"""Micro-repro: how does `applyInPandasWithState` cost scale with the
rows-per-group-per-batch volume?

The r12 skew probe hung >13 min in one executor task, 100% JVM CPU
inside `ApplyInPandasWithStateWriter` -> Arrow `MessageSerializer` ->
`DirectByteBufferOutputStream.grow` while feeding the hot shard's group
(one user = 50% of the stream) to the Python worker. This isolates the
variable: ONE group (n_shards=1), ONE micro-batch, N rows, timing the
whole `sliding_count_stream` run as N doubles. Linear cost = transport
is fine and skew is merely a balance problem; superlinear = Spark's
state-API group transport has a volume cliff the engine must bound.

Usage: python tools/hot_group_repro.py [sizes...]  (default 50k..800k)
Prints one JSON line per size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402


def main() -> int:
    sizes = [int(s) for s in sys.argv[1:]] or [
        50_000, 100_000, 200_000, 400_000, 800_000
    ]

    from kafka_streams_learning_spark import get_spark
    from kafka_streams_learning_spark.sources.replay import (
        replay_stream,
        run_staging_dir,
    )
    from kafka_streams_learning_spark.streaming import runner, stateful

    spark = get_spark("hot-group-repro")
    spark.sparkContext.setLogLevel("ERROR")

    base = np.datetime64("2024-01-01T00:00:00", "us")
    schema = "user_id long, event_id long, ts timestamp"
    for n in sizes:
        # one user, event-time sorted, one chunk file = one micro-batch
        rng = np.random.default_rng(7)
        ts = np.sort(
            base + rng.integers(0, 30 * 86400_000_000, n).astype(
                "timedelta64[us]")
        )
        stage = run_staging_dir("hotrepro")
        pq.write_table(
            pa.table({
                "user_id": pa.array(np.zeros(n, "int64")),
                "event_id": pa.array(np.arange(n, dtype="int64")),
                "ts": pa.array(ts),
            }),
            os.path.join(stage, "chunk-00001.parquet"),
        )
        stream = replay_stream(
            spark, stage, schema, files_per_trigger=10
        )
        t0 = time.time()
        out = stateful.sliding_count_stream(
            stream, 24 * 3600 * 1_000_000, n_shards=1
        )
        name = f"hotrepro_{n}_{int(t0)}"
        runner.run_to_memory(out, name, "append", state_partitions=1)
        cnt = spark.table(name).count()
        print(json.dumps({
            "rows_per_group_batch": n,
            "seconds": round(time.time() - t0, 2),
            "out_rows": cnt,
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
