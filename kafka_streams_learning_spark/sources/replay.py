"""Fixture replay streaming source (SURVEY §7.1).

Replays a bounded fixture table as a Structured Streaming source in
event-time order, split into N deterministic chunks — each chunk becomes
one micro-batch (file source + maxFilesPerTrigger=1). This reproduces the
reference's producer-driven test setup (`producers/OrderProducer.java:28-35`)
without a broker, so every streaming operator is testable hermetically.

The chunking is by event-time rank, so batch k contains strictly earlier
data than batch k+1 — the deterministic arrival order the reference's
manual tests assume, and the setup that makes watermark/late-data tests
meaningful (a late row can be planted by assigning it to a later chunk).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_learning_spark.sources.batch import load_table


def stage_replay_chunks(
    df: DataFrame,
    staging_dir: str,
    chunks: int,
    order_by: str,
) -> str:
    """Materialize `df` into `chunks` single-file parquet chunks in
    event-time order. Returns the directory to stream from.

    The ntile ordering includes every remaining column as a tiebreaker:
    equal event times must land in a deterministic chunk, or order-
    sensitive operators (running counts, keyed-state buffers) replay
    nondeterministically versus their batch oracles."""
    _ORDERABLE = {
        "string", "long", "integer", "short", "byte", "double", "float",
        "boolean", "date", "timestamp", "timestamp_ntz", "decimal",
    }
    tiebreak = [
        F.col(f.name)
        for f in df.schema.fields
        if f.name != order_by and f.dataType.typeName().split("(")[0] in _ORDERABLE
    ]
    ranked = df.withColumn(
        "_chunk", F.ntile(chunks).over(Window.orderBy(F.col(order_by), *tiebreak))
    ).persist()  # sort once; each chunk write filters the cached ranking
    try:
        # chunks are written sequentially ON PURPOSE: the file stream
        # source orders files by modification time, and increasing mtimes
        # are what guarantee chunk k replays before chunk k+1
        for i in range(1, chunks + 1):
            chunk_dir = os.path.join(staging_dir, f"chunk={i:05d}")
            (
                ranked.filter(F.col("_chunk") == i)
                .drop("_chunk")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(chunk_dir)
            )
    finally:
        ranked.unpersist()
    return staging_dir


def stage_explicit_chunks(
    spark: SparkSession,
    rows_per_chunk: list[list],
    schema: str,
    staging_dir: str,
) -> str:
    """Test-oriented replay staging: each element of `rows_per_chunk`
    becomes one micro-batch verbatim — exact control over arrival order
    (for late/out-of-order scenarios)."""
    for i, rows in enumerate(rows_per_chunk, start=1):
        chunk_dir = os.path.join(staging_dir, f"chunk={i:05d}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(chunk_dir)
    return staging_dir


def replay_stream(spark: SparkSession, staging_dir: str, schema) -> DataFrame:
    """Open a staged replay directory as a streaming DataFrame, one staged
    chunk (= one data file) per micro-batch."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staging_dir)
    )


def replay_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    staging_dir: str,
    chunks: int = 4,
    order_by: str = "ts",
) -> DataFrame:
    """Fixture table → event-time-ordered replay stream."""
    df = load_table(spark, sf_dir, name)
    stage_replay_chunks(df, staging_dir, chunks, order_by)
    return replay_stream(spark, staging_dir, df.schema)
