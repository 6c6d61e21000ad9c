"""Kafka source/sink integration tests (SURVEY S1/S2/K1).

The sandbox ships neither a broker nor the spark-sql-kafka connector
jars, so the end-to-end tests are GATED on `KSL_KAFKA_BOOTSTRAP`: point
it at a reachable broker (with the kafka connector on the session
classpath, e.g. `--packages org.apache.spark:spark-sql-kafka-0-10_2.13`)
and the round-trip tests run for real; otherwise they skip and only the
environment-independent construction contract is checked. This is the
permanent resolution of the Kafka parity question — see README
"Kafka integration" for the replay-source equivalence argument.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from kafka_streams_learning_spark.sources.kafka import (
    kafka_json_stream,
    kafka_string_stream,
    write_kafka,
)

BOOTSTRAP = os.environ.get("KSL_KAFKA_BOOTSTRAP")

needs_broker = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="set KSL_KAFKA_BOOTSTRAP=<host:port> (with spark-sql-kafka jars "
    "on the classpath) to run Kafka integration tests",
)


def test_kafka_source_constructs_or_fails_clearly(spark):
    """Environment-independent contract: with connector jars present the
    builder yields a streaming frame with the documented (key, value,
    ingest_ts) projection; without them it fails at `.load()` with
    SPECIFICALLY the missing-data-source error (DATA_SOURCE_NOT_FOUND /
    "Failed to find data source: kafka") — never a silent wrong plan and
    never an unrelated analysis error swallowed by a loose match. Uses the
    real broker address when KSL_KAFKA_BOOTSTRAP is set."""
    try:
        df = kafka_string_stream(spark, BOOTSTRAP or "localhost:9092", "probe-topic")
    except Exception as e:  # no connector jars in this environment
        msg = str(e)
        assert (
            "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find data source: kafka" in msg
        ), f"expected missing-kafka-data-source error, got: {msg[:300]}"
    else:
        assert df.isStreaming
        assert [f.name for f in df.schema.fields] == ["key", "value", "ingest_ts"]


@needs_broker
def test_kafka_string_roundtrip(spark, tmp_path):
    """Produce via Spark's batch kafka writer, consume via
    kafka_string_stream, count per key — the WordCountApp topology shape
    (`basics/WordCountApp.java:49`) against a real broker."""
    topic = f"ksl-it-{uuid.uuid4().hex[:8]}"
    rows = [("a", "one"), ("a", "two"), ("b", "three")]
    (
        spark.createDataFrame(rows, "key string, value string")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )
    stream = kafka_string_stream(spark, BOOTSTRAP, topic)
    q = (
        stream.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("ksl_it_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.key: r.n for r in spark.table("ksl_it_counts").collect()}
    assert got == {"a": 2, "b": 1}


@needs_broker
def test_kafka_json_stream_decodes_and_routes_malformed(spark, tmp_path):
    """JSON values decode via the POJO-serde-equivalent schema; malformed
    payloads yield v IS NULL (`serdes/JsonPOJOSerde.java:30-38`)."""
    topic = f"ksl-it-{uuid.uuid4().hex[:8]}"
    payloads = ['{"order_id": "7", "amount": 3}', "not json"]
    (
        spark.createDataFrame([(p,) for p in payloads], "value string")
        .selectExpr("CAST(NULL AS STRING) AS key", "value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )
    stream = kafka_json_stream(
        spark, BOOTSTRAP, topic, "order_id string, amount long"
    )
    q = (
        stream.select("value", "v")
        .writeStream.format("memory")
        .queryName("ksl_it_json")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.value: r.v for r in spark.table("ksl_it_json").collect()}
    assert rows['{"order_id": "7", "amount": 3}'].order_id == "7"
    assert rows["not json"] is None


@needs_broker
def test_kafka_sink_roundtrip(spark, tmp_path):
    """write_kafka publishes (key, JSON value) rows readable back from the
    topic (`processor/FraudDetectionApp.java:104`). At-least-once: assert
    set-wise containment, not exact offsets."""
    topic_in = f"ksl-it-{uuid.uuid4().hex[:8]}"
    topic_out = f"ksl-it-{uuid.uuid4().hex[:8]}"
    (
        spark.createDataFrame([("k1", "v1"), ("k2", "v2")], "key string, val string")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic_in)
        .save()
    )
    stream = kafka_string_stream(spark, BOOTSTRAP, topic_in).select(
        "key", F.col("value").alias("val")
    )
    q = write_kafka(
        stream, BOOTSTRAP, topic_out, str(tmp_path / "ck"), value_cols=["val"]
    )
    q.processAllAvailable()
    q.stop()
    out = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", topic_out)
        .option("startingOffsets", "earliest")
        .load()
        .select(F.col("key").cast("string"), F.col("value").cast("string"))
        .collect()
    )
    got = {(r.key, r.value) for r in out}
    assert {("k1", '{"val":"v1"}'), ("k2", '{"val":"v2"}')} <= got
