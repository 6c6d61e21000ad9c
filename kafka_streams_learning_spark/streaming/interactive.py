"""Interactive queries over live streaming state (SURVEY §2.11 IQ1/IQ2).

The reference opens a `ReadOnlyWindowStore` against the RocksDB files the
stream thread is writing and fetches one key's counts across a window
range (`windows/tumbling/OrderCountTumblingWindow.java:130-145`). Spark 4
exposes the same capability as a DataFrame source: the `statestore`
format reads a streaming query's checkpointed state directly — no sink
table required, and the read is a normal batch query (predicate pushdown
and all), across every partition's store.

Two access paths, mirroring the two the reference demonstrates:
- `read_state` — the raw store scan (key struct, value struct per row);
- `fetch_window_counts` — IQ1 verbatim: (key, window-start range) →
  (window_start, count) rows, flattened to columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_state(
    spark: SparkSession, checkpoint: str, store_name: str | None = None
) -> DataFrame:
    """Read a streaming query's state store as a batch DataFrame."""
    reader = spark.read.format("statestore")
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    return reader.load(checkpoint)


def fetch_window_counts(
    spark: SparkSession,
    checkpoint: str,
    key: object,
    from_ts: str,
    to_ts: str,
    key_field: str = "key.key",
    window_field: str = "key.window",
    count_field: str = "value.count",
) -> DataFrame:
    """`store.fetch(key, from, to)` (IQ1): one key's windowed counts with
    window start in [from_ts, to_ts], straight from live state."""
    return (
        read_state(spark, checkpoint)
        .select(
            F.col(key_field).alias("key"),
            F.col(f"{window_field}.start").alias("window_start"),
            F.col(f"{window_field}.end").alias("window_end"),
            F.col(count_field).alias("cnt"),
        )
        .filter(
            (F.col("key") == key)
            & (F.col("window_start") >= F.lit(from_ts).cast("timestamp"))
            & (F.col("window_start") <= F.lit(to_ts).cast("timestamp"))
        )
    )
