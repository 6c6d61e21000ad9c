"""Text-analysis operators over a documents table.

Column-level building blocks live in `functions/text.py`; these operators
assemble them into DataFrame transforms. Everything is Catalyst
expressions — a 100 TB corpus sweep is one pass over the `text` column
with no Python in the path and full column pruning at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_learning_spark.functions import text as T


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token counts and quality heuristics."""
    t = F.col(text_col)
    return df.select(
        id_col,
        T.token_count(t).alias("n_tokens"),
        T.subword_count(t).alias("n_subwords"),
        T.stopword_ratio(t).alias("stop_ratio"),
        T.punct_ratio(t).alias("punct_ratio"),
        T.quality_score(t).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-token language guess per document."""
    return df.select(id_col, T.lang_guess(F.col(text_col)).alias("lang_guess"))


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized-text md5 fingerprint per document."""
    return df.select(id_col, T.fingerprint(F.col(text_col)).alias("fp"))


def token_topk(df: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """Global top-k tokens by frequency (tie-break: token asc).

    Scale shape: explode → partial count per partition → one shuffle on
    token → total count → TakeOrdered(k) — the classic heavy-hitters plan;
    no global sort of the full token table."""
    tok = df.select(F.explode(T.tokens(T.normalized_text(F.col(text_col)))).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(k)
