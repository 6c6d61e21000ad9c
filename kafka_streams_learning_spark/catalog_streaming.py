"""Streaming-mode catalog queries: the correctness gate run through the
*streaming* engine, not just batch expressions.

Each callable stages the fixture table as an event-time-ordered replay
stream (4 micro-batches), runs the streaming operator to completion, and
returns the final state — which must hash-match the same DuckDB batch
oracle as the batch form. Streaming-vs-batch equivalence is exactly what
the declared semantics promise once all input is consumed (SURVEY §5.2-1).

s01/s02 use `complete` output mode into a memory sink (final state = full
result, including still-open windows — matching the batch oracle).
s03 exercises the custom stateful operator (applyInPandasWithState): the
alert stream's append-mode emissions, concatenated across micro-batches,
must equal the batch running-count oracle.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_learning_spark.catalog import QuerySpec
from kafka_streams_learning_spark.sources.replay import replay_table
from kafka_streams_learning_spark.streaming import runner, stateful, windows

REPLAY_CHUNKS = 4
ALERT_VALUE_THRESHOLD = 100.0  # events.value gate for s03 (~20% qualify)
ALERT_AFTER = 3


def _fresh_name(prefix: str) -> str:
    return f"{prefix}_{uuid.uuid4().hex[:8]}"


# s01 — running count per key, streamed (A1 via the streaming engine)


def _s01(spark: SparkSession, sf: str) -> DataFrame:
    stream = replay_table(
        spark, sf, "events", tempfile.mkdtemp(prefix="ksl-replay-"), REPLAY_CHUNKS
    )
    counted = windows.streaming_count_by_key(stream, "user_id", count_name="cnt")
    name = _fresh_name("s01_out")
    runner.run_to_memory(counted, name, "complete")
    return spark.table(name)


_S01_SQL = "SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1"

# s02 — tumbling-window count, streamed (A3 via the streaming engine)


def _s02(spark: SparkSession, sf: str) -> DataFrame:
    stream = replay_table(
        spark, sf, "events", tempfile.mkdtemp(prefix="ksl-replay-"), REPLAY_CHUNKS
    )
    counted = windows.streaming_tumbling_count(stream, "ts", "1 day", "user_id")
    name = _fresh_name("s02_out")
    runner.run_to_memory(counted, name, "complete")
    return spark.table(name)


_S02_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS window_end,
       user_id, COUNT(*) AS cnt
FROM events GROUP BY 1, 2, 3
"""

# s03 — stateful fraud alerts, streamed (A5 via applyInPandasWithState)


def _s03(spark: SparkSession, sf: str) -> DataFrame:
    stream = replay_table(
        spark, sf, "events", tempfile.mkdtemp(prefix="ksl-replay-"), REPLAY_CHUNKS
    ).select(
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").alias("record_id"),
        F.col("value").alias("amount"),
        "ts",
    )
    alerts = stateful.fraud_alert_stream(
        stream, "key", ALERT_VALUE_THRESHOLD, ALERT_AFTER
    )
    name = _fresh_name("s03_out")
    runner.run_to_memory(alerts, name, "append")
    return spark.table(name).select("key", "record_id", "amount", "running_cnt")


_S03_SQL = f"""
SELECT CAST(user_id AS VARCHAR) AS key, event_id AS record_id,
       value AS amount, running_cnt
FROM (
  SELECT *, COUNT(*) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS running_cnt
  FROM events WHERE value >= {ALERT_VALUE_THRESHOLD}
)
WHERE running_cnt > {ALERT_AFTER}
"""


STREAMING_QUERIES: list[QuerySpec] = [
    QuerySpec("s01_stream_count_by_key", _s01, _S01_SQL,
              "running count per key through the streaming engine (A1)"),
    QuerySpec("s02_stream_tumbling_count", _s02, _S02_SQL,
              "tumbling-window count through the streaming engine (A3)"),
    QuerySpec("s03_stream_fraud_alerts", _s03, _S03_SQL,
              "stateful alert operator through the streaming engine (A5)"),
]
