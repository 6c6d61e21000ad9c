"""CSV corpus source — the delimited-text sibling of `sources/jsonl.py`.

Tabular corpus drops (metadata sidecars, labels, URL lists) ship as CSV
at least as often as JSONL; same ingest stance as S2/P2 in SURVEY §2
(`serialization/JsonConsumerApp.java` → malformed input ROUTED, never
thrown): a corrupt line lands in quarantine with the raw text preserved,
so one bad shard cannot kill a 100 TB ingest.

Scale contract (shared with JSONL where applicable):

- schema ALWAYS pinned by the caller — CSV inference reads the data
  once just to guess types and is even less stable than JSON inference
  (everything is a string until proven otherwise);
- PERMISSIVE mode + an explicit corrupt-record column turns short rows,
  long rows, and type-mismatched cells into quarantine rows with the
  raw line preserved — one scan, no job failure;
- splittability: UNCOMPRESSED csv splits by newline and parallelizes
  per-block; `multiLine=true` (quoted embedded newlines) makes each
  file ONE task — avoid it on monolithic files, and keep gzip shards
  small for the same reason as JSONL;
- CSV is the INGEST format, not the working format: parse once, write
  sharded parquet, run the pipeline on the columnar copy.

The (clean, quarantine) split reuses `jsonl.split_clean_quarantine` —
it operates on the parsed frame and is format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as SqlT

from kafka_streams_learning_spark.sources.jsonl import (  # noqa: F401
    CORRUPT_COL,
    split_clean_quarantine,
)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: SqlT.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Schema-pinned CSV scan with malformed lines captured in
    ``_corrupt_record`` (NULL for clean rows). Single pass, no
    inference, never throws on bad input."""
    full = SqlT.StructType(
        list(schema.fields) + [SqlT.StructField(CORRUPT_COL, SqlT.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", "true" if header else "false")
        .option("sep", sep)
        # pinned-schema reads must not silently reorder on a shuffled
        # header; enforceSchema=false makes a mismatched header an error
        # surfaced per-file instead of silent positional misbinding
        .option("enforceSchema", "false")
        .csv(path)
    )
