"""Sharded parquet sink — the write side of a 100 TB pipeline.

The reference's sinks are Kafka topics (`SURVEY §2.2 K1`,
`joins/stream_ktable/StreamTableJoinExample.java:172`); a batch corpus
engine's equivalent durable sink is a sharded columnar layout. The two
failure modes at scale are (a) one file per task — millions of tiny
files — and (b) `coalesce(n)` — n tasks doing all the work with no
parallelism upstream. This writer avoids both:

- rows route to ``n_shards`` via the portable id hash (same family as
  `hash_split`, so a row's shard is stable across runs and engines);
- ``repartition(n_shards, shard)`` makes shard == task == file, so file
  count is exactly what you asked for and every shard writes in
  parallel;
- ``maxRecordsPerFile`` caps file size as a backstop (a skewed shard
  rolls over into part-files instead of producing one huge file);
- ``sortWithinPartitions(id)`` lays rows out id-ordered inside each
  file, which parquet turns into tight min/max column statistics — so
  downstream point-lookups and range scans prune row groups.

Read-back is ordinary `spark.read.parquet` — the layout is engine-
neutral (DuckDB reads the same directory with `parquet_scan`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_learning_spark.functions import hashing

SHARD_SALT = "shard"


def shard_column(id_col: str, n_shards: int, salt: str = SHARD_SALT):
    """Deterministic shard id in [0, n_shards) — hash-stable across runs,
    engines, and corpus growth (same contract as `sampling.hash_split`)."""
    h = hashing.hash60(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    return (h % n_shards).cast("int")


def write_sharded(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    max_records_per_file: int = 1_000_000,
    salt: str = SHARD_SALT,
) -> None:
    """Write ``df`` as ``n_shards`` parquet shards partitioned by the id
    hash: one directory, `shard=K/` subdirs, one part-file per shard
    (plus rollover files past ``max_records_per_file``)."""
    out = df.withColumn("shard", shard_column(id_col, n_shards, salt))
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions(id_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(path)
    )


def shard_plan(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    bytes_col: str | None = None,
    salt: str = SHARD_SALT,
) -> DataFrame:
    """Dry-run of :func:`write_sharded`: per-shard (n_rows, n_bytes) so a
    pipeline can audit balance before paying the write. One partial-agg
    groupBy over n_shards keys; ``bytes_col`` defaults to nothing —
    callers pass e.g. ``length(text)`` precomputed into a column."""
    out = df.withColumn("shard", shard_column(id_col, n_shards, salt))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if bytes_col is not None:
        aggs.append(F.sum(bytes_col).alias("n_bytes"))
    return out.groupBy("shard").agg(*aggs)
