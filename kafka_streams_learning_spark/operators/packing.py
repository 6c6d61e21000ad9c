"""Sequence packing: lay a document corpus out into fixed-token-budget
training sequences (the standard LLM pretraining "concat-and-chunk").

Documents are concatenated in a deterministic hash order and the token
stream is cut every ``budget`` tokens; a document therefore spans one or
more sequences (``seq_first``..``seq_last``) and may straddle a cut —
exactly how pretraining dataloaders pack. The token measure is the
vocabulary-free BPE proxy `functions.text.subword_count` (the same
estimator x01 reports).

Scale shape: a global concatenation order would serialize the cumsum
into one window partition, so the stream is sharded first — ``bucket =
hash60(salt|id) % n_buckets`` — and each bucket packs independently
(sequence ids are bucket-scoped, `(bucket, seq)` is globally unique).
The whole operator is ONE hash-partition exchange + per-bucket sort +
running-sum window; no joins, no Python. At 100 TB you set ``n_buckets``
to the target shard count (10⁴–10⁵): each bucket is an independent,
boundedly-sized packing stream, and adding documents only perturbs the
buckets they hash into. Hash order also decorrelates neighboring
documents (source/time locality), which is what sequence packing wants.

No reference-repo counterpart (SURVEY §2.14 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_streams_learning_spark.functions import hashing
from kafka_streams_learning_spark.functions.text import subword_count

PACK_SALT = "pack"


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = PACK_SALT,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Assign every document its packed location: ``(bucket, tok_start,
    n_tokens, seq_first, seq_last, n_seqs)`` where ``tok_start`` is the
    document's offset in its bucket's concatenated token stream and
    ``seq_*`` are the ``budget``-sized sequences it lands in.

    Deterministic: order within a bucket is (hash, id); integer window
    cumsum — nothing float-dependent, so the oracle replays exactly.
    Zero-token documents are kept (n_seqs = 0, seq_last < seq_first
    by convention) rather than silently dropped. ``carry_cols`` ride
    along into the output unchanged (no extra join needed)."""
    carry_cols = carry_cols or []
    h = hashing.hash60(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    base = df.select(
        F.col(id_col),
        *carry_cols,
        h.alias("__h"),
        (h % n_buckets).cast("int").alias("bucket"),
        subword_count(F.col(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok_end = F.sum("n_tokens").over(w)
    tok_start = (tok_end - F.col("n_tokens")).alias("tok_start")
    seq_first = F.floor((tok_end - F.col("n_tokens")) / F.lit(budget)).alias("seq_first")
    seq_last = F.floor((tok_end - 1) / F.lit(budget)).alias("seq_last")
    return base.select(
        id_col,
        *carry_cols,
        "bucket",
        tok_start,
        "n_tokens",
        seq_first,
        seq_last,
        (
            F.greatest(
                F.floor((tok_end - 1) / F.lit(budget))
                - F.floor((tok_end - F.col("n_tokens")) / F.lit(budget))
                + 1,
                F.lit(0),
            )
            * F.when(F.col("n_tokens") > 0, 1).otherwise(0)
        ).alias("n_seqs"),
    )


def pack_sql(
    budget: int,
    n_buckets: int,
    table: str = "documents",
    id_expr: str = "doc_id",
    salt: str = PACK_SALT,
) -> str:
    """DuckDB mirror of :func:`pack_sequences` (same hash, same order,
    same integer arithmetic)."""
    h = hashing.hash60_sql(f"'{salt}|' || CAST({id_expr} AS VARCHAR)")
    toks = r"len(list_filter(string_split_regex(text, '\s+'), x -> x != ''))"
    subwords = (
        rf"CAST(ceil(length(regexp_replace(text, '\s+', '', 'g')) / 4.0) AS BIGINT)"
        rf" + {toks}"
    )
    return f"""
WITH t AS (
  SELECT {id_expr}, {h} AS h, {subwords} AS n_tokens FROM {table}
), o AS (
  -- DuckDB SUM(BIGINT) yields HUGEINT; pin back to BIGINT to match Spark
  SELECT {id_expr}, h, CAST(h % {n_buckets} AS INT) AS bucket, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY h % {n_buckets} ORDER BY h, {id_expr}
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_end
  FROM t
)
SELECT {id_expr}, bucket, tok_end - n_tokens AS tok_start, n_tokens,
       CAST(floor((tok_end - n_tokens) / {budget}) AS BIGINT) AS seq_first,
       CAST(floor((tok_end - 1) / {budget}) AS BIGINT) AS seq_last,
       greatest(CAST(floor((tok_end - 1) / {budget}) AS BIGINT)
         - CAST(floor((tok_end - n_tokens) / {budget}) AS BIGINT) + 1, 0)
         * (CASE WHEN n_tokens > 0 THEN 1 ELSE 0 END) AS n_seqs
FROM o
"""
