"""Kafka source/sink builders (SURVEY §2.1 S1/S2, §2.2 K1).

Config-surface parity with the reference's topic plumbing. The container
has no broker and no spark-sql-kafka package, so these builders construct
the reader/writer declaratively and fail with a clear message only at
`.load()`/`.start()` time if the Kafka connector jars are absent — the
rest of the engine never imports this module.

Reference mapping:
- `builder.stream(topic, Consumed.with(String, String))`
  (`basics/WordCountApp.java:49`)              → kafka_string_stream
- `builder.stream(topic, Consumed.with(String, JsonPOJOSerde))`
  (`state_store/ProductCountApp.java:61-64`)   → kafka_json_stream
- `.to(topic, Produced.with(...))`
  (`processor/FraudDetectionApp.java:104`)     → write_kafka
- `auto.offset.reset` earliest/latest
  (`OrderTimestampStreamApp.java:59`)          → starting_offsets
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_string_stream(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka topic → (key string, value string, ingest_ts timestamp)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
            F.col("timestamp").alias("ingest_ts"),
        )
    )


def kafka_json_stream(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    schema,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka topic with JSON values → decoded struct column `v` plus the
    raw envelope. Parse failure → v IS NULL (JsonPOJOSerde's
    exception-to-null path, `serdes/JsonPOJOSerde.java:30-38`)."""
    raw = kafka_string_stream(spark, bootstrap, topic, starting_offsets)
    return raw.withColumn("v", F.from_json("value", schema))


def write_kafka(
    df: DataFrame,
    bootstrap: str,
    topic: str,
    checkpoint: str,
    key_col: str = "key",
    value_cols: list[str] | None = None,
):
    """Publish a stream to a Kafka topic as JSON values. Note: the Kafka
    sink is at-least-once (no transactional producer in Spark's sink);
    exactly-once requires an idempotent consumer or a file/Delta sink —
    SURVEY §4.2 documents the caveat."""
    value = (
        F.to_json(F.struct(*[F.col(c) for c in value_cols]))
        if value_cols
        else F.to_json(F.struct("*"))
    )
    out = df.select(
        F.col(key_col).cast("string").alias("key"), value.alias("value")
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
