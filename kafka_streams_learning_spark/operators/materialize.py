"""Run-scoped intermediate materialization.

`materialized(df)` computes an intermediate once and feeds it to multiple
plan arms by writing it to a run-scoped parquet table and scanning that.
Unlike `.persist()`, nothing stays pinned in executor memory after the
query finishes (a persisted-without-unpersist intermediate leaks cache
across catalog runs). At cluster scale this IS the standard shape: a
materialized intermediate table on shared storage, readable by every
downstream stage, with its own footer stats for pushdown.

The write happens eagerly at call time (not at first downstream action) —
that is what guarantees the intermediate computes exactly once even when
several plan arms consume it.

Pass `tag` for intermediates a catalog query re-creates on every run:
tagged calls reuse one stable directory per tag (overwrite mode), so a
long-lived session running the catalog N times holds one copy per tag
instead of N. Untagged calls get a fresh directory each time (for
intermediates whose lifetime must be independent of later calls).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialized(df: DataFrame, tag: str | None = None) -> DataFrame:
    from kafka_streams_learning_spark.sources.replay import (
        run_named_dir,
        run_staging_dir,
    )

    path = run_named_dir(f"mat-{tag}") if tag else run_staging_dir("mat")
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
