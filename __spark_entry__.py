"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query smoke check at sf0.001.
`queries()` — every implemented operator (SURVEY.md §2 + extensions).
`oracle_sql()` — DuckDB-equivalent SQL per query (None-oracle queries are
omitted → driver records the weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_learning_spark.catalog import all_queries

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the stateful fraud running-alert (SURVEY §2.6 A5) —
    re-key → threshold filter → per-key running count → alert rows."""
    from kafka_streams_learning_spark.catalog import REFERENCE_QUERIES

    by_name = {q.name: q for q in REFERENCE_QUERIES}
    return by_name["q08_fraud_running_alert"].spark(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark for q in all_queries()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in all_queries() if q.oracle is not None}
