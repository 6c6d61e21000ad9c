"""Bucketed storage layout: the shuffle-free co-located join path.

The reference co-locates joins by routing both streams through Kafka
repartition topics keyed the same way (`joins/stream_stream/
StreamStreamJoinExample.java:131-141`, `joins/stream_ktable/
StreamTableJoinExample.java:74-88` — "both sides must share the key").
The batch-at-scale equivalent is a bucketed table layout: pay the
partition-by-key shuffle ONCE at write time, then every subsequent join
or aggregation on the bucket key plans with zero Exchange on that side.

At 100 TB this is the difference between re-shuffling the fact table for
every downstream join (network-bound, skew-exposed) and a map-side
sort-merge over pre-sorted bucket files. Both sides must agree on bucket
count and key — same discipline the reference enforces for its
repartition topics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int,
    *keys: str,
    sort: bool = True,
) -> None:
    """Persist `df` hash-bucketed (and per-bucket sorted) on `keys`.

    The one-time shuffle happens here; `sort=True` additionally sorts
    within each bucket file so later sort-merge joins skip their Sort as
    well. `path` keeps the data out of the default warehouse (explicit
    location; tests use a tmpdir)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.option("path", path).format("parquet").saveAsTable(table)


def write_partitioned(df: DataFrame, path: str, *cols: str) -> None:
    """Persist `df` directory-partitioned on `cols` (hive layout:
    `path/col=value/...`). The complement of bucketing: bucketing
    co-locates by hash for joins, directory partitioning prunes whole
    directories for filters. At 100 TB a date/category predicate then
    skips the bytes entirely — the scan never opens non-matching
    partitions (PartitionFilters in the plan, pinned by test). Keep
    partition columns low-cardinality; high-cardinality keys belong in
    bucket specs, not directories (small-file explosion)."""
    df.write.mode("overwrite").partitionBy(*cols).parquet(path)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table. The bucket spec rides the catalog entry, so
    Catalyst knows the data is already hash-distributed on the bucket
    keys and drops the Exchange a join/groupBy on those keys would
    otherwise insert."""
    return spark.table(table)
