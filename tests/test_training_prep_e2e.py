"""End-to-end walkthrough test: tools/prepare_training_data.py at
sf0.001 — ingest-with-quarantine → clean → decontaminate → split →
pack → sharded sink, closed by the script's own DuckDB oracle
assertion (row count + value hash of the final layout).

The catalog verifies every stage in isolation; this pins the
COMPOSITION (column contracts between stages, the bucket-partitioned
sink round-trip, benchmark-exclusion semantics) as one command a user
would actually run.
"""

from __future__ import annotations

import os

from tools.prepare_training_data import main as prep_main

SF_DIR = "/root/testdata/sf0.001"


def test_prepare_training_data_end_to_end(spark, tmp_path):
    out = str(tmp_path / "prep")
    assert prep_main([SF_DIR, out]) == 0
    layout = os.path.join(out, "training_layout")
    buckets = [d for d in os.listdir(layout) if d.startswith("bucket=")]
    assert buckets, "no bucket shards written"
    final = spark.read.parquet(layout)
    assert final.count() > 0
    # quarantine caught exactly the injected malformed lines; the clean
    # side kept every well-formed row (asserted inside main as well —
    # re-checked here so a softened script assert can't silently pass)
    from kafka_streams_learning_spark.sources.ingest import read_ingested

    assert read_ingested(spark, os.path.join(out, "quarantine")).count() == 7
