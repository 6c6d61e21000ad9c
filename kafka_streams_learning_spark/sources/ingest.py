"""Streaming file ingest with quarantine routing.

The production shape of the jsonl/csv corpus ingest: shards keep landing
in a directory (object-store prefix), a streaming query picks up each new
file exactly once (checkpointed file-source offsets), parses against the
pinned schema, and routes clean rows and malformed lines to SEPARATE
durable outputs — the reference's consume-and-route stance (`SURVEY §2.1
S2` / P2 malformed→"UNKNOWN") applied to file drops. Restarting the
query resumes from the checkpoint: already-ingested shards are never
re-parsed, new shards are picked up — the poller contract
(`ProductCountApp.java:31-36` changelog-restore, here as source offsets).

`Trigger.AvailableNow` drains everything present then stops, so the same
entry point serves both the scheduled batch-backfill ("catch up, exit")
and the test harness; a long-lived deployment passes
``continuous=True`` to keep polling.

The split writes both sinks per micro-batch inside ``foreachBatch``. The
batch is persisted first — Spark disallows plans whose only referenced
column from a PERMISSIVE source is the corrupt-record column (the
quarantine side is exactly that), and the documented workaround is to
cache the parsed frame; it is also the scale contract (parse once, both
splits read the parsed form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as SqlT

from kafka_streams_learning_spark.sources.jsonl import CORRUPT_COL


def _full_schema(schema: SqlT.StructType) -> SqlT.StructType:
    return SqlT.StructType(
        list(schema.fields) + [SqlT.StructField(CORRUPT_COL, SqlT.StringType())]
    )


def read_jsonl_stream(
    spark: SparkSession, path: str, schema: SqlT.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of `jsonl.read_jsonl`: schema-pinned, PERMISSIVE,
    corrupt lines captured — one micro-batch per file-source trigger."""
    reader = spark.readStream.schema(_full_schema(schema)).option(
        "mode", "PERMISSIVE"
    ).option("columnNameOfCorruptRecord", CORRUPT_COL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def read_csv_stream(
    spark: SparkSession, path: str, schema: SqlT.StructType,
    header: bool = True, sep: str = ",",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of `csv_.read_csv` (same quarantine contract)."""
    reader = (
        spark.readStream.schema(_full_schema(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", "true" if header else "false")
        .option("sep", sep)
        .option("enforceSchema", "false")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.csv(path)


def run_quarantine_ingest(
    stream: DataFrame,
    clean_dir: str,
    quarantine_dir: str,
    checkpoint: str,
    continuous: bool = False,
):
    """Drive a PERMISSIVE-parsed stream into (clean parquet, quarantine
    parquet). With ``continuous=False`` (default) the query drains all
    currently-available input (`Trigger.AvailableNow`) and stops —
    rerunning with the same checkpoint ingests only NEW files. With
    ``continuous=True`` it returns the running StreamingQuery for a
    long-lived poller (caller stops it).

    Exactly-once output: each micro-batch lands in a Hive-style
    ``ingest_batch=<batch_id>`` subdirectory written with OVERWRITE
    semantics. ``batch_id`` is stable across restarts of the same
    checkpoint, so a micro-batch replayed after a mid-batch crash (e.g.
    dying between the clean-side write and the checkpoint commit)
    rewrites the same directory instead of appending duplicates —
    the standard idempotent-foreachBatch pattern. Readers see an extra
    ``ingest_batch`` int partition column on ``spark.read.parquet(dir)``;
    ``read_ingested`` strips it."""

    def _route(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            (
                batch.filter(F.col(CORRUPT_COL).isNull())
                .drop(CORRUPT_COL)
                .write.mode("overwrite")
                .parquet(f"{clean_dir}/ingest_batch={batch_id}")
            )
            (
                batch.filter(F.col(CORRUPT_COL).isNotNull())
                .select(F.col(CORRUPT_COL).alias("raw_line"))
                .write.mode("overwrite")
                .parquet(f"{quarantine_dir}/ingest_batch={batch_id}")
            )
        finally:
            batch.unpersist()

    writer = stream.writeStream.foreachBatch(_route).option(
        "checkpointLocation", checkpoint
    )
    if continuous:
        return writer.start()
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return q


def read_ingested(spark: SparkSession, path: str) -> DataFrame:
    """Read an ingest output directory, dropping the ``ingest_batch``
    bookkeeping partition column the idempotent writer adds."""
    df = spark.read.parquet(path)
    return df.drop("ingest_batch") if "ingest_batch" in df.columns else df
