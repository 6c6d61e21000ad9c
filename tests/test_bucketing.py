"""Bucketed-layout tests: the write-once-shuffle-never-again contract.

The reference pays its co-location cost per-join via Kafka repartition
topics (`StreamStreamJoinExample.java:131-141`); the batch-at-scale
answer is bucketing — one shuffle at write time, then every join and
aggregation on the bucket key plans with zero Exchange. These tests pin
that plan property, which is the entire point of the layout."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from kafka_streams_learning_spark.operators import bucketing
from kafka_streams_learning_spark.plans import explain as E
from kafka_streams_learning_spark.sources.batch import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    tmp = tempfile.mkdtemp(prefix="bucketed_")
    bucketing.write_bucketed(
        load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        "b_orders", f"{tmp}/orders", 8, "o_custkey",
    )
    bucketing.write_bucketed(
        load_table(spark, SF_DIR, "customer").select(
            "c_custkey", "c_name", "c_acctbal"
        ),
        "b_customer", f"{tmp}/customer", 8, "c_custkey",
    )
    yield "b_orders", "b_customer"
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(tmp, ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # co-bucketed same-count same-key tables must sort-merge join with
    # ZERO shuffle exchanges — the layout already satisfies the join's
    # distribution requirement (broadcast disabled so the plan can't
    # sidestep the property under test)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders, customer = bucketed_tables
        o = bucketing.read_bucketed(spark, orders)
        c = bucketing.read_bucketed(spark, customer)
        j = o.join(c, o.o_custkey == c.c_custkey)
        plan = E.formatted_plan(j)
        assert "SortMergeJoin" in plan
        assert E.exchange_count(j) == 0, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    # aggregation on the bucket key reuses the layout's distribution too
    orders, _ = bucketed_tables
    agg = bucketing.read_bucketed(spark, orders).groupBy("o_custkey").count()
    assert E.exchange_count(agg) == 0


def test_partitioned_layout_prunes_directories(spark):
    # a filter on the partition column must become a PartitionFilter —
    # pruned directories are never opened, so the predicate costs zero
    # bytes of non-matching data at any scale
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="partitioned_")
    try:
        bucketing.write_partitioned(
            load_table(spark, SF_DIR, "events").select(
                "event_id", "user_id", "ts", "event_type"
            ),
            tmp, "event_type",
        )
        df = spark.read.parquet(tmp).filter("event_type = 'purchase'")
        plan = E.formatted_plan(df)
        pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
        assert pf and "event_type" in pf[0], plan
        want = (
            load_table(spark, SF_DIR, "events")
            .filter("event_type = 'purchase'").count()
        )
        assert df.count() == want and want > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    # layout must not change results: bucketed join == plain join
    orders, customer = bucketed_tables
    bo = bucketing.read_bucketed(spark, orders)
    bc = bucketing.read_bucketed(spark, customer)
    got = bo.join(bc, bo.o_custkey == bc.c_custkey).count()
    po = load_table(spark, SF_DIR, "orders")
    pc = load_table(spark, SF_DIR, "customer")
    want = po.join(pc, po.o_custkey == pc.c_custkey).count()
    assert got == want and got > 0


def test_enrich_join_bucketed_fallback_no_exchange(spark, bucketed_tables):
    # the non-broadcast arm of the enrichment join: a dimension too big
    # to broadcast, co-bucketed with the facts, must sort-merge join with
    # zero Exchange on the fact side — the 100 TB fallback path
    from kafka_streams_learning_spark.operators import joins

    orders, customer = bucketed_tables
    o = bucketing.read_bucketed(spark, orders).withColumnRenamed(
        "o_custkey", "custkey"
    )
    c = bucketing.read_bucketed(spark, customer).withColumnRenamed(
        "c_custkey", "custkey"
    )
    j = joins.enrich_join(o, c, on="custkey", dim_bucketed=True)
    plan = E.formatted_plan(j)
    assert "SortMergeJoin" in plan
    assert E.exchange_count(j) == 0, plan


def test_enrich_join_bucketed_arm_zero_exchange(spark, bucketed_tables):
    # the non-broadcast fallback of enrich_join: when the dimension
    # outgrows the broadcast budget, co-bucketed layouts must give the
    # SAME zero-fact-side-shuffle property through the operator's own API
    from kafka_streams_learning_spark.operators import joins

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders, customer = bucketed_tables
        o = bucketing.read_bucketed(spark, orders).withColumnRenamed(
            "o_custkey", "custkey"
        )
        c = bucketing.read_bucketed(spark, customer).withColumnRenamed(
            "c_custkey", "custkey"
        )
        j = joins.enrich_join(o, c, on="custkey", dim_bucketed=True)
        plan = E.formatted_plan(j)
        assert "SortMergeJoin" in plan
        assert E.exchange_count(j) == 0, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_write_sharded_layout_and_roundtrip(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from kafka_streams_learning_spark.sources import sink

    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "sharded")
    sink.write_sharded(docs, path, n_shards=4, max_records_per_file=100)
    back = spark.read.parquet(path)
    # round-trip: same rows (shard column added)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns) | {"shard"}
    # every shard directory exists; file rollover respects the cap
    for s in range(4):
        files = glob.glob(f"{path}/shard={s}/*.parquet")
        assert files, f"shard {s} missing"
        for f in files:
            assert pq.ParquetFile(f).metadata.num_rows <= 100
    # shard assignment matches the plan's accounting
    plan = {r["shard"]: r["n_rows"] for r in sink.shard_plan(docs, 4).collect()}
    got = {r["shard"]: r["cnt"] for r in back.groupBy("shard")
           .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == plan
    # no shard grossly imbalanced (hash uniformity)
    assert max(plan.values()) <= 3 * min(plan.values())
