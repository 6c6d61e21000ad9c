"""Custom stateful streaming operators (SURVEY §2.6 A5, §2.10, §7.5).

`fraud_alert_stream` re-expresses the reference's Processor-API fraud
detector (`processor/FraudProcessor.java:36-84`) Spark-natively: keyed
state holds one counter per customer (the explicit KeyValueStore,
`:51-53`); each qualifying record increments it and, once the counter
*exceeds* `alert_after`, an alert row is emitted per record
(`context.forward`, `:61-83`). State is partitioned by key across
executors and checkpointed (the changelog-topic equivalent,
`FraudProcessor.java:22`); each micro-batch touches only the keys present
in the batch, Arrow-batched — no per-row Python round-trips.

Implementation: `applyInPandasWithState` (stable since Spark 3.4).
Spark 4's `transformWithStateInPandas` is the successor API; it requires
the protobuf package at the Python worker, which this container lacks, so
`fraud_alert_stream_tws` is provided but gated behind an import check.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState

ALERT_OUTPUT_SCHEMA = (
    "key string, record_id long, amount double, running_cnt long, alert string"
)
_STATE_SCHEMA = "cnt long"


def _alert_fn(threshold: float, alert_after: int):
    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cnt = state.get[0] if state.exists else 0
        out_rows = []
        for pdf in pdfs:
            # deterministic in-batch order: by record ts then id (the
            # streaming analogue of the batch oracle's ORDER BY)
            pdf = pdf.sort_values(["ts", "record_id"])
            for row in pdf.itertuples():
                amount = float(row.amount)
                if amount < threshold:  # below-gate records don't count (:41-43)
                    continue
                cnt += 1
                if cnt > alert_after:  # strictly >, fires from the 4th (:61)
                    out_rows.append(
                        {
                            "key": key[0],
                            "record_id": int(row.record_id),
                            "amount": amount,
                            "running_cnt": cnt,
                            "alert": (
                                f"High-value order streak for {key[0]}: "
                                f"{cnt} orders >= {threshold:.0f}"
                            ),
                        }
                    )
        state.update((cnt,))
        if out_rows:
            yield pd.DataFrame(out_rows)

    return fn


def fraud_alert_stream(
    df: DataFrame,
    key_col: str,
    threshold: float,
    alert_after: int = 3,
) -> DataFrame:
    """Streaming fraud alerts over a stream with columns
    (key_col, record_id, amount, ts). Emits one alert row per qualifying
    record from the (alert_after+1)-th onward, exactly once per record."""
    return df.groupBy(key_col).applyInPandasWithState(
        _alert_fn(threshold, alert_after),
        outputStructType=ALERT_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def fraud_alert_stream_tws(
    df: DataFrame,
    key_col: str,
    threshold: float,
    alert_after: int = 3,
) -> DataFrame:
    """transformWithStateInPandas variant (Spark ≥ 4 successor API —
    richer state types, timers, TTL). Same semantics as
    `fraud_alert_stream`; requires the protobuf package on workers."""
    if not _has_protobuf():
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package on "
            "Python workers, which is not installed in this environment; "
            "use fraud_alert_stream (applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    threshold_ = threshold
    alert_after_ = alert_after

    class FraudAlertProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.count = handle.getValueState("qualifying_count", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            cnt = self.count.get()[0] if self.count.exists() else 0
            out_rows = []
            for pdf in rows:
                pdf = pdf.sort_values(["ts", "record_id"])
                for row in pdf.itertuples():
                    amount = float(row.amount)
                    if amount < threshold_:
                        continue
                    cnt += 1
                    if cnt > alert_after_:
                        out_rows.append(
                            {
                                "key": key[0],
                                "record_id": int(row.record_id),
                                "amount": amount,
                                "running_cnt": cnt,
                                "alert": (
                                    f"High-value order streak for {key[0]}: "
                                    f"{cnt} orders >= {threshold_:.0f}"
                                ),
                            }
                        )
            self.count.update((cnt,))
            if out_rows:
                yield pd.DataFrame(out_rows)

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=FraudAlertProcessor(),
        outputStructType=ALERT_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )
