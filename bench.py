"""Benchmark harness (BASELINE.md): runs every catalog query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Execution is forced with the noop batch sink — full pipeline runs on the
executors, nothing is collected to the driver — so the number measures the
engine, not result transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_streams_learning_spark import get_spark
from kafka_streams_learning_spark.catalog import all_queries


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen/scan path once so the first timed query doesn't
    # absorb session spin-up (a cluster amortizes startup over hours)
    from kafka_streams_learning_spark.sources.batch import load_table

    load_table(spark, sf_dir, "events").limit(1000).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for spec in all_queries():
        # time construction + execution: streaming specs (s*) run their
        # query during construction; batch specs build lazily and execute
        # in the noop write
        t0 = time.time()
        df = spec.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[spec.name] = round(time.time() - t0, 3)
        # free persisted intermediates (LSH buckets, shingle postings) so
        # cache pressure from one query can't tax the next one's timing
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
