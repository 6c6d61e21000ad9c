"""Sequence packing (operators/packing.py): stream contiguity, sequence
arithmetic, and the one-exchange plan contract."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_streams_learning_spark.functions.text import subword_count
from kafka_streams_learning_spark.operators import packing
from kafka_streams_learning_spark.plans import explain as E
from kafka_streams_learning_spark.sources.batch import load_table

from .conftest import SF_DIR

BUDGET = 128


def _packed(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return packing.pack_sequences(docs, budget=BUDGET, n_buckets=4)


def test_buckets_are_contiguous_token_streams(spark):
    rows = _packed(spark).orderBy("bucket", "tok_start").collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert len(by_bucket) == 4
    for docs in by_bucket.values():
        expect_start = 0
        for r in docs:
            assert r["tok_start"] == expect_start  # no gaps, no overlap
            expect_start += r["n_tokens"]


def test_sequence_arithmetic(spark):
    for r in _packed(spark).collect():
        if r["n_tokens"] == 0:
            assert r["n_seqs"] == 0
            continue
        assert r["seq_first"] == r["tok_start"] // BUDGET
        assert r["seq_last"] == (r["tok_start"] + r["n_tokens"] - 1) // BUDGET
        assert r["n_seqs"] == r["seq_last"] - r["seq_first"] + 1
        # a doc spans exactly ceil-ish many sequences of the budget
        assert r["n_seqs"] >= math.ceil(r["n_tokens"] / BUDGET)


def test_token_totals_conserved(spark):
    docs = load_table(spark, SF_DIR, "documents")
    want = docs.select(
        F.sum(subword_count(F.col("text"))).alias("s")
    ).first()["s"]
    got = _packed(spark).agg(F.sum("n_tokens").alias("s")).first()["s"]
    assert got == want


def test_packing_is_single_exchange(spark):
    assert E.exchange_count(_packed(spark)) == 1


def test_training_layout_two_exchanges_and_component_agreement(spark):
    from kafka_streams_learning_spark.operators.pipeline import (
        clean_corpus,
        training_layout,
    )
    from kafka_streams_learning_spark.operators import sampling

    docs = load_table(spark, SF_DIR, "documents")
    out = training_layout(docs, 0.55, ("en",), 80, budget=BUDGET, n_buckets=4)
    # two exchanges end-to-end: fingerprint window + packing window
    assert E.exchange_count(out) == 2
    rows = out.collect()
    got_ids = {r["doc_id"] for r in rows}
    # agreement with the standalone components it composes
    clean_ids = {r["doc_id"] for r in clean_corpus(docs, 0.55, ("en",)).collect()}
    split = {
        r["doc_id"]: r["split"]
        for r in sampling.hash_split(
            docs, [("train", 80), ("val", 10), ("test", 10)]
        ).collect()
    }
    assert got_ids == {i for i in clean_ids if split[i] == "train"}
    # packed contiguously within each bucket
    by_bucket = {}
    for r in sorted(rows, key=lambda r: (r["bucket"], r["tok_start"])):
        by_bucket.setdefault(r["bucket"], []).append(r)
    for docs_in_b in by_bucket.values():
        expect = 0
        for r in docs_in_b:
            assert r["tok_start"] == expect
            expect += r["n_tokens"]
