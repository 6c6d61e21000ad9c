"""Batch parquet sources for the fixture tables.

Equivalent role to the reference's Kafka topic sources (SURVEY §2.1 S1/S2,
`basics/WordCountApp.java:49`, `state_store/ProductCountApp.java:61-64`) in
batch mode: a declarative scan that Catalyst can push filters/projections
into. At 100 TB the same call reads a partitioned parquet/lakehouse table;
predicate pushdown + partition pruning come from expressing filters on the
DataFrame rather than in Python.
"""

from __future__ import annotations

from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@lru_cache(maxsize=256)
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as
    raw int64 (spark.sql.legacy.parquet.nanosAsLong) and we convert."""
    schema = pq.read_schema(path)
    out = []
    for field in schema:
        t = field.type
        if getattr(t, "unit", None) == "ns":
            out.append(field.name)
    return tuple(out)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Plain `spark.read.parquet` — no collect, no
    schema munging — so pushdown and pruning stay available. Nanosecond
    timestamp columns are converted long→timestamp right after the scan
    (integer DIV: int64 nanos exceed double precision)."""
    path = f"{sf_dir}/{name}.parquet"
    # Both confs are runtime-settable and required for correct results in
    # ANY session, not just ones built by session.py (external harnesses
    # construct their own vanilla SparkSession): nanosAsLong to read the
    # TIMESTAMP(NANOS) fixture columns at all, UTC so window bucketing and
    # timestamp rendering are deterministic regardless of host timezone.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Fixture generators have stored TIMESTAMP(MICROS, isAdjustedToUTC=false)
    # in some revisions; by default Spark reads those as TIMESTAMP_NTZ, which
    # breaks TIMESTAMP-only expressions (unix_micros) and changes the
    # rendered type versus the DuckDB oracle. Pin inference off so naive
    # parquet timestamps always surface as TIMESTAMP in the UTC session —
    # identical values to the NTZ read, stable type across fixture revisions.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    for c in _nanos_ts_columns(path):
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for `spark.sql` use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
