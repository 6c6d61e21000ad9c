"""Capture .explain("formatted") / streaming executed plans for the r14
optimization round's touched queries, into plans/r14/<query>_<suffix>.txt.

Usage:
    python tools/dump_r14_plans.py <tree_root> <suffix> [sf_dir] [rows...]

`tree_root` is the engine tree to import (the current repo, or a
`git archive` checkout of the r13 end-of-round commit for the "before"
side). Output always lands in THIS repo's plans/r14/.

Batch rows are captured with plans.explain.formatted_plan (the exact
text `.explain("formatted")` prints). Streaming rows run their query to
completion and capture the LAST micro-batch's executed plan via
`StreamingQuery.explainInternal(extended=True)` — the only plan that
shows the real state-store operators (StateStoreSave, stream-stream
join state, etc.); a pre-execution explain of a streaming DataFrame
shows only an unresolved source placeholder. The capture hooks
runner.run_to_memory so the catalog row's OWN construction runs
unchanged.
"""

from __future__ import annotations

import os
import sys

# override with KSL_PLANS_OUT for later rounds (r15+ reuse the same tool)
OUT_DIR = os.environ.get("KSL_PLANS_OUT", "/root/repo/plans/r14")

STREAM_ROWS_DEFAULT = [
    "s03_stream_fraud_alerts",
    "s04_stream_interval_join",
    "s05_stream_ktable_enrich",
    "s23_stream_outer_interval_join",
]


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    rows = sys.argv[4:] or STREAM_ROWS_DEFAULT
    sys.path.insert(0, tree)

    from kafka_streams_learning_spark import get_spark
    from kafka_streams_learning_spark.catalog import all_queries
    from kafka_streams_learning_spark.plans.explain import formatted_plan
    from kafka_streams_learning_spark.streaming import runner

    by_name = {q.name: q for q in all_queries()}
    unknown = [r for r in rows if r not in by_name]
    if unknown:
        raise SystemExit(f"unknown rows: {unknown}")

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("dump-r14-plans")
    spark.sparkContext.setLogLevel("ERROR")

    captured: dict[str, str] = {}
    orig_run = runner.run_to_memory

    def capturing_run(
        df,
        name,
        output_mode="update",
        checkpoint=None,
        state_partitions=None,
        shard_count=None,
        arrow_batch_rows=None,
    ):
        """Same contract (and signature — ADVICE r14) as run_to_memory,
        but keeps the query handle alive long enough to read the executed
        plan of the final batch. Mirrors the real runner's state-
        parallelism sizing and per-query Arrow batch override so the
        captured plan ran under the row's true execution config; shard
        pinning is skipped (fresh throwaway checkpoint, no restart)."""
        spark_ = df.sparkSession
        runner._ensure_state_parallelism(spark_, state_partitions)
        ckpt = checkpoint or runner._checkpoint()
        arrow_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
        prior_arrow = spark_.conf.get(arrow_key, None)
        if arrow_batch_rows is not None:
            spark_.conf.set(arrow_key, str(arrow_batch_rows))
        try:
            q = (
                df.writeStream.outputMode(output_mode)
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.processAllAvailable()
            captured["last"] = q._jsq.explainInternal(True)
            q.stop()
            q.awaitTermination()
        finally:
            if arrow_batch_rows is not None:
                if prior_arrow is not None:
                    spark_.conf.set(arrow_key, prior_arrow)
                else:
                    spark_.conf.unset(arrow_key)

    for row in rows:
        spec = by_name[row]
        spark.sparkContext.setJobDescription(f"plan-dump {row}")
        if row.startswith("s"):
            runner.run_to_memory = capturing_run
            try:
                spec.spark(spark, sf_dir)
            finally:
                runner.run_to_memory = orig_run
            text = captured.pop("last", "<no streaming query captured>")
        else:
            text = formatted_plan(spec.spark(spark, sf_dir))
        path = os.path.join(OUT_DIR, f"{row}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {row} — {suffix} (tree: {tree}, sf_dir: {sf_dir})\n"
                f"# streaming rows: StreamingQuery.explainInternal(extended) "
                f"of the final micro-batch; batch rows: explain('formatted')\n\n"
            )
            f.write(text + "\n")
        print(f"wrote {path} ({len(text)} chars)")
        for t in spark.catalog.listTables():
            if t.isTemporary and "_out_" in t.name:
                spark.catalog.dropTempView(t.name)

    spark.stop()


if __name__ == "__main__":
    main()
