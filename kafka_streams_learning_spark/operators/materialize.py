"""Run-scoped intermediate materialization.

`materialized(df)` computes an intermediate once and feeds it to multiple
plan arms by writing it to a run-scoped parquet table and scanning that.
Unlike `.persist()`, nothing stays pinned in executor memory after the
query finishes (a persisted-without-unpersist intermediate leaks cache
across catalog runs). At cluster scale this IS the standard shape: a
materialized intermediate table on shared storage, readable by every
downstream stage, with its own footer stats for pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialized(df: DataFrame) -> DataFrame:
    from kafka_streams_learning_spark.sources.replay import run_staging_dir

    path = run_staging_dir("mat")
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
