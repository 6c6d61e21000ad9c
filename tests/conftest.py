from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from kafka_streams_learning_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # Small local session for tests; engine defaults otherwise identical to
    # production (AQE, UTC, RocksDB state store).
    s = get_spark(
        "engine-tests",
        master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": "4"},
    )
    yield s
