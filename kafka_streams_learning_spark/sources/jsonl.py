"""JSONL (newline-delimited JSON) corpus source.

Raw LLM corpora ship as JSONL shards (one document object per line)
before anyone converts them to columnar form; this is the file-source
sibling of the reference's JSON POJO topic consumption (SURVEY §2.1 S2,
`serialization/JsonConsumerApp.java`) with the same malformed-input
stance as P2 (`rekey` malformed → "UNKNOWN"): bad lines are ROUTED, not
thrown, so one corrupt shard can't kill a 100 TB ingest.

Scale contract:

- the schema is ALWAYS pinned by the caller — schema inference reads
  the data once just to guess types (a full extra pass at corpus scale)
  and can flip types between shards; a pinned schema is also what makes
  the read a single streaming pass;
- PERMISSIVE mode + an explicit corrupt-record column turns malformed
  lines into rows with the raw line preserved, so the ingest splits
  into (clean, quarantine) with one scan and no job failure;
- compression: gzip shards are NOT splittable (one task per shard —
  fine when shards are ≤ a few hundred MB, which is how public corpora
  are cut); use zstd/bzip2 or uncompressed for monolithic files;
- JSONL is the INGEST format, not the working format: parse once,
  write `sink.write_sharded` parquet, and run the pipeline against the
  columnar layout (pushdown/pruning don't exist on JSON).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as SqlT

CORRUPT_COL = "_corrupt_record"

# the documents-table contract (TESTDATA.md) as a pinned JSONL schema
DOCUMENTS_SCHEMA = SqlT.StructType(
    [
        SqlT.StructField("doc_id", SqlT.LongType()),
        SqlT.StructField("text", SqlT.StringType()),
        SqlT.StructField("lang", SqlT.StringType()),
        SqlT.StructField("source", SqlT.StringType()),
        SqlT.StructField("n_chars", SqlT.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession, path: str, schema: SqlT.StructType
) -> DataFrame:
    """Schema-pinned JSONL scan with malformed lines captured in
    ``_corrupt_record`` (NULL for clean rows). Single pass, no
    inference, never throws on bad input."""
    # StructType.add MUTATES in place — build a fresh struct so the
    # caller's schema (often a module constant) survives repeated reads
    full = SqlT.StructType(
        list(schema.fields) + [SqlT.StructField(CORRUPT_COL, SqlT.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_clean_quarantine(
    df: DataFrame, source: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the corrupt column, quarantined raw lines).

    The parsed frame is MATERIALIZED (parquet) before splitting — this
    is simultaneously (a) required by Spark, which disallows plans whose
    referenced columns are only the corrupt-record column (the
    quarantine side would be exactly that query against the raw JSON),
    and (b) the scale contract anyway: JSON parses once, both splits and
    every downstream pass read the columnar copy.

    Staging lifecycle: with ``source`` (the input path), the parquet
    copy lives under a tag DERIVED FROM THAT PATH — repeated re-ingests
    of the same input reclaim their previous generation (disk stays
    bounded at one live copy per input), while ingests of different
    inputs can never invalidate each other. Without ``source``, each
    call gets its own process-lifetime staging dir — fully isolated,
    but re-ingesting in a loop accumulates one copy per call until the
    interpreter exits; long-lived pollers should pass the path."""
    import hashlib

    from kafka_streams_learning_spark.operators.materialize import materialized

    tag = (
        "jsonl-" + hashlib.md5(source.encode()).hexdigest()[:12]
        if source is not None
        else None
    )
    parsed = materialized(df, tag=tag)
    clean = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine
