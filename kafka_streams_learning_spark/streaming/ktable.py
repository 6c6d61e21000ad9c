"""KTable maintenance: a changing dimension as a latest-per-key snapshot
(SURVEY §2.1 S3, §7.4 option b).

Kafka's `builder.table(topic)` materializes a compacted topic as the
latest value per key (`joins/stream_ktable/StreamTableJoinExample.java:
114-140`). The Spark-native equivalent maintained here: a changelog
stream upserts into a versioned parquet snapshot via `foreachBatch` —
each micro-batch unions the incoming changes with the current snapshot
and keeps `max_by(version)` per key. Facts then join the snapshot as a
broadcast stream-static join, which is deterministic ("join against the
latest snapshot", the semantic the reference's own comments pin down at
`StreamTableJoinExample.java:85-88`).

At production scale the snapshot is a Delta/Iceberg table and the upsert
is a MERGE keyed on the primary key (shuffle = changed keys only, not
the snapshot); the versioned-directory scheme here emulates exactly that
contract with plain parquet so the engine has no lake-format dependency.
Writes go to a fresh `v{N}` directory and a `_CURRENT` pointer flips
afterwards — readers never observe a half-written snapshot (the same
atomic-pointer trick Delta's transaction log performs).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_learning_spark.operators.joins import latest_per_key

_POINTER = "_CURRENT"


def _current_version(snapshot_dir: str) -> int | None:
    ptr = os.path.join(snapshot_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="ascii") as fh:
        return int(fh.read().strip())


def read_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame | None:
    """The current latest-per-key snapshot, or None before the first
    upsert."""
    v = _current_version(snapshot_dir)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(snapshot_dir, f"v{v}"))


def upsert_snapshot(
    batch_df: DataFrame, snapshot_dir: str, key: str, version_col: str
) -> None:
    """One micro-batch of changelog rows → new snapshot version.
    union(current, batch) → latest_per_key → write v{N+1} → flip pointer."""
    spark = batch_df.sparkSession
    current = read_snapshot(spark, snapshot_dir)
    merged = batch_df if current is None else current.unionByName(batch_df)
    snap = latest_per_key(merged, key, version_col)
    v = (_current_version(snapshot_dir) or 0) + 1
    snap.write.mode("overwrite").parquet(os.path.join(snapshot_dir, f"v{v}"))
    tmp = os.path.join(snapshot_dir, _POINTER + ".tmp")
    with open(tmp, "w", encoding="ascii") as fh:
        fh.write(str(v))
    os.replace(tmp, os.path.join(snapshot_dir, _POINTER))


def materialize_ktable(
    changelog: DataFrame, snapshot_dir: str, key: str, version_col: str
) -> None:
    """Drive a changelog stream to completion, maintaining the snapshot —
    the `builder.table()` materialization pass."""
    import tempfile

    os.makedirs(snapshot_dir, exist_ok=True)
    q = (
        changelog.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, _epoch: upsert_snapshot(df, snapshot_dir, key, version_col)
        )
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ksl-ktbl-"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
