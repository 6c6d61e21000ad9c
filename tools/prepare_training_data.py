"""End-to-end "corpus in, training shards out" walkthrough (VERDICT r8
item 8) — the x40 pipeline as a user-facing artifact rather than a
catalog row, with the quarantine ingest and benchmark decontamination
stages the catalog keeps as separate rows chained in front.

One command:

    python tools/prepare_training_data.py [sf_dir] [out_dir]

Stages (every one is an existing, oracle-verified operator — this script
only composes them):

  1. INGEST   — the corpus arrives as jsonl shards (we stage the sf
                documents table as 4 shards and inject malformed lines);
                `run_quarantine_ingest` streams them in with checkpointed
                exactly-once file offsets, routing clean rows and broken
                lines to separate parquet outputs (sources/ingest.py).
  2. CLEAN    — language ID + quality gate + exact-dedup survivor
                selection, fused into one scan + one exchange
                (operators/pipeline.clean_corpus).
  3. DECONTAM — drop documents sharing any 3-word shingle with the
                benchmark stand-in set (operators/dedup.contamination_hits,
                broadcast semi-join — x31's operator).
  4. SPLIT    — deterministic salted hash split, train/holdout
                (operators/sampling.hash_split — x19's operator).
  5. PACK     — concat-and-chunk the train split into budget-sized
                sequence locations (operators/packing.pack_sequences —
                x37/x40's operator).
  6. SINK     — the training layout lands as parquet sharded by pack
                bucket (a dataloader reads one bucket per worker).

Then a final ORACLE ASSERTION: DuckDB replays stages 2-5 as one SQL
query over the *ingested clean parquet* and the script asserts row
count + order-insensitive value hash equality with the Spark layout
(same canonicalizer as tools/oracle_check.py). Exits non-zero on any
mismatch, leftover quarantine miscount, or empty output.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_check import table_hash  # same canonicalizer as the gate

N_SHARDS = 4
N_MALFORMED = 7          # injected broken jsonl lines (quarantine must catch)
TRAIN_PCT = 80
CONTAM_MAX_RATIO = 0.5   # decontamination drop threshold
BENCH_MOD = 97
SHINGLE_K = 3


def stage_jsonl_shards(spark, sf_dir: str, in_dir: str) -> int:
    """Write the documents table as N_SHARDS jsonl files + malformed lines
    (the corpus-drop directory an ingest poller would watch)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    rows = tbl.to_pylist()
    os.makedirs(in_dir, exist_ok=True)
    per = (len(rows) + N_SHARDS - 1) // N_SHARDS
    for s in range(N_SHARDS):
        chunk = rows[s * per:(s + 1) * per]
        with open(os.path.join(in_dir, f"shard-{s:03d}.jsonl"), "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")
            for m in range(N_MALFORMED if s == 0 else 0):
                f.write(f'{{"doc_id": {m}, "text": truncated-no-close\n')
    return len(rows)


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out_root = argv[1] if len(argv) > 1 else "/tmp/ksl_training_prep"
    if os.path.exists(out_root):
        shutil.rmtree(out_root)
    in_dir = os.path.join(out_root, "drops")
    clean_dir = os.path.join(out_root, "ingested")
    quar_dir = os.path.join(out_root, "quarantine")
    ckpt_dir = os.path.join(out_root, "checkpoint")
    layout_dir = os.path.join(out_root, "training_layout")

    from pyspark.sql import functions as F
    from pyspark.sql import types as SqlT

    from kafka_streams_learning_spark import get_spark
    from kafka_streams_learning_spark.catalog_ext import (
        CLEAN_LANGS,
        CLEAN_MIN_QUALITY,
        PACK_BUCKETS,
        PACK_BUDGET,
    )
    from kafka_streams_learning_spark.operators import packing, sampling
    from kafka_streams_learning_spark.operators.dedup import contamination_hits
    from kafka_streams_learning_spark.operators.pipeline import clean_corpus
    from kafka_streams_learning_spark.sources.ingest import (
        read_ingested,
        read_jsonl_stream,
        run_quarantine_ingest,
    )

    spark = get_spark("prepare-training-data")
    spark.sparkContext.setLogLevel("ERROR")

    # -- 1. ingest ---------------------------------------------------------
    n_in = stage_jsonl_shards(spark, sf_dir, in_dir)
    schema = SqlT.StructType([
        SqlT.StructField("doc_id", SqlT.LongType()),
        SqlT.StructField("text", SqlT.StringType()),
        SqlT.StructField("lang", SqlT.StringType()),
        SqlT.StructField("source", SqlT.StringType()),
        SqlT.StructField("n_chars", SqlT.LongType()),
    ])
    run_quarantine_ingest(
        read_jsonl_stream(spark, in_dir, schema, max_files_per_trigger=1),
        clean_dir, quar_dir, ckpt_dir,
    )
    docs = read_ingested(spark, clean_dir)
    n_clean = docs.count()
    n_quar = read_ingested(spark, quar_dir).count()
    print(f"[1 ingest]   {n_in} rows in {N_SHARDS} shards -> "
          f"{n_clean} clean, {n_quar} quarantined")
    assert n_quar == N_MALFORMED, (n_quar, N_MALFORMED)
    assert n_clean == n_in, (n_clean, n_in)

    # -- 2..5 clean -> decontaminate -> split -> pack ----------------------
    cleaned = clean_corpus(docs, CLEAN_MIN_QUALITY, CLEAN_LANGS)
    contaminated = (
        contamination_hits(docs, BENCH_MOD, SHINGLE_K)
        .filter(F.col("contamination_ratio") >= CONTAM_MAX_RATIO)
        .select("doc_id")
    )
    survivors = (
        cleaned
        .filter(F.col("doc_id") % BENCH_MOD != 0)   # benchmark docs never train
        .join(F.broadcast(contaminated), "doc_id", "left_anti")
        .select("doc_id", "lang_guess", "quality")
    )
    split = sampling.hash_split(
        survivors, [("train", TRAIN_PCT), ("holdout", 100 - TRAIN_PCT)]
    )
    train = (
        survivors
        .join(split.filter(F.col("split") == "train").select("doc_id"), "doc_id")
        .join(docs.select("doc_id", "text"), "doc_id")
    )
    layout = packing.pack_sequences(
        train, PACK_BUDGET, PACK_BUCKETS,
        carry_cols=["lang_guess", "quality"],
    )

    # -- 6. sharded sink ---------------------------------------------------
    layout.write.mode("overwrite").partitionBy("bucket").parquet(layout_dir)
    final = spark.read.parquet(layout_dir).select(
        "doc_id", "lang_guess", "quality", "bucket", "tok_start",
        "n_tokens", "seq_first", "seq_last", "n_seqs",
    )
    rows = [tuple(r) for r in final.collect()]
    cols = final.columns
    n_buckets_out = len([d for d in os.listdir(layout_dir)
                         if d.startswith("bucket=")])
    print(f"[2-6 layout] {len(rows)} train docs packed into "
          f"{n_buckets_out} bucket shards at {layout_dir}")
    assert rows, "empty training layout"

    # -- oracle ------------------------------------------------------------
    import duckdb

    from kafka_streams_learning_spark.catalog_ext import _X01_SQL, _lang_sql
    from kafka_streams_learning_spark.catalog_ext import _NORM  # noqa: N811
    from kafka_streams_learning_spark.operators.sampling import (
        hash_split_bucket_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT doc_id, text, lang, source, n_chars "
        f"FROM parquet_scan('{clean_dir}/*/*.parquet')"
    )
    langs_in = ", ".join(f"'{x}'" for x in CLEAN_LANGS)
    sql = f"""
WITH stats AS ({_X01_SQL}),
lang AS ({_lang_sql()}),
keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5({_NORM})),
toks AS (SELECT doc_id, list_filter(string_split_regex({_NORM}, '\\s+'),
                                    x -> x != '') AS tk FROM documents),
sh AS (SELECT doc_id, list_distinct(list_transform(
           generate_series(1, greatest(len(tk) - {SHINGLE_K} + 1, 0)),
           i -> list_aggregate(list_slice(tk, i, i + {SHINGLE_K} - 1),
                               'string_agg', ' '))) AS shingles FROM toks),
post AS (SELECT doc_id AS id, len(shingles) AS n_shingles,
                unnest(shingles) AS shingle FROM sh),
bench AS (SELECT DISTINCT shingle FROM post WHERE id % {BENCH_MOD} = 0),
contam AS (
  SELECT p.id AS doc_id
  FROM post p JOIN bench b USING (shingle)
  WHERE p.id % {BENCH_MOD} != 0
  GROUP BY p.id, p.n_shingles
  HAVING COUNT(*) / p.n_shingles >= {CONTAM_MAX_RATIO}
),
surv AS (
  SELECT d.doc_id, d.text, lang.lang_guess, stats.quality
  FROM documents d
  JOIN keep USING (doc_id)
  JOIN lang ON lang.doc_id = d.doc_id
  JOIN stats ON stats.doc_id = d.doc_id
  WHERE lang.lang_guess IN ({langs_in})
    AND stats.quality >= {CLEAN_MIN_QUALITY}
    AND d.doc_id % {BENCH_MOD} != 0
    AND d.doc_id NOT IN (SELECT doc_id FROM contam)
    AND {hash_split_bucket_sql('d.doc_id')} < {TRAIN_PCT}
),
p AS ({packing.pack_sql(PACK_BUDGET, PACK_BUCKETS, table="surv")})
SELECT p.doc_id, s.lang_guess, s.quality, p.bucket, p.tok_start,
       p.n_tokens, p.seq_first, p.seq_last, p.n_seqs
FROM p JOIN surv s USING (doc_id)
"""
    cur = con.execute(sql)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    h_spark, h_oracle = table_hash(cols, rows), table_hash(o_cols, o_rows)
    print(f"[oracle]     spark={len(rows)} rows {h_spark[:12]}  "
          f"duckdb={len(o_rows)} rows {h_oracle[:12]}")
    assert len(rows) == len(o_rows), (len(rows), len(o_rows))
    assert h_spark == h_oracle, "value-hash mismatch vs DuckDB oracle"
    print(f"OK: verified training layout at {layout_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
