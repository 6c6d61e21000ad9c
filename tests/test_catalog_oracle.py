"""Batch-equivalence golden tests (SURVEY §5.2-1): every catalog query runs
through the engine and through DuckDB; rows, schema, and order-insensitive
value hashes must match. This is a local replica of the driver's gate."""

from __future__ import annotations

import duckdb
import pytest

from kafka_streams_learning_spark.catalog import all_queries
from kafka_streams_learning_spark.sources.batch import TABLES
from tools.oracle_check import table_hash

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("spec", all_queries(), ids=lambda s: s.name)
def test_query_matches_oracle(spark, duck, spec):
    sdf = spec.spark(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert len(srows) >= 0  # rows-only contract: runs and has stable schema
        assert sdf.columns
        return
    res = duck.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"row count {len(srows)} != oracle {len(drows)}"
    assert sorted(sdf.columns) == sorted(dcols)
    assert table_hash(sdf.columns, srows) == table_hash(dcols, drows)
