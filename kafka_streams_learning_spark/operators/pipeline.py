"""End-to-end corpus-cleaning composition — the workload a training-data
pipeline actually runs, assembled from the catalog's own building blocks:

    language ID → quality gate → exact-dedup survivor selection

All per-document features (language scores, quality heuristics, dedup
fingerprint) are pure Catalyst expressions, so they fuse into ONE
column-pruned scan of the text column; duplicate-survivor selection is a
row_number window over the fingerprint — one shuffle total. At 100 TB the
cleaning sweep is scan-bound plus a single exchange, with no per-stage
materialization and no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_streams_learning_spark.functions import text as T


def clean_corpus(
    df: DataFrame,
    min_quality: float,
    langs: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The cleaned corpus: documents that (a) identify as one of `langs`,
    (b) score at least `min_quality`, and (c) are their duplicate group's
    canonical survivor (lowest id per normalized-text fingerprint —
    survivorship is decided over ALL documents, then the filters apply).
    Returns (doc_id, lang_guess, n_tokens, quality)."""
    t = F.col(text_col)
    feats = df.select(
        id_col,
        T.lang_guess(t).alias("lang_guess"),
        T.token_count(t).alias("n_tokens"),
        T.quality_score(t).alias("quality"),
        T.fingerprint(t).alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy(F.col(id_col))
    return (
        feats.withColumn("_rk", F.row_number().over(w))
        .filter(
            (F.col("_rk") == 1)
            & F.col("lang_guess").isin(*langs)
            & (F.col("quality") >= min_quality)
        )
        .select(id_col, "lang_guess", "n_tokens", "quality")
    )


def training_layout(
    df: DataFrame,
    min_quality: float,
    langs: tuple[str, ...],
    train_pct: int,
    budget: int,
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The full prep pipeline, fused: clean (lang + quality + dedup
    survivor) → deterministic hash split → concat-and-chunk packing of
    the TRAIN split. Output is the training-sequence layout: one row per
    surviving train document with its (bucket, tok_start, seq_first,
    seq_last) location plus the cleaning features that justified keeping
    it.

    Plan shape — TWO exchanges end-to-end: the dedup-survivor window
    (partition by fingerprint) and the packing window (partition by
    bucket). Everything else — language scores, quality, the split
    decision — is expression-only and fuses into the scan; the split uses
    the SAME salt/hash as `sampling.hash_split`, so a document's split
    here always agrees with x19's standalone assignment."""
    from kafka_streams_learning_spark.operators import packing, sampling

    t = F.col(text_col)
    feats = df.select(
        id_col,
        text_col,
        T.lang_guess(t).alias("lang_guess"),
        T.quality_score(t).alias("quality"),
        T.fingerprint(t).alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy(F.col(id_col))
    split_bucket = sampling._bucket(id_col, sampling.SPLIT_SALT, 100)
    survivors = (
        feats.withColumn("_rk", F.row_number().over(w))
        .filter(
            (F.col("_rk") == 1)
            & F.col("lang_guess").isin(*langs)
            & (F.col("quality") >= min_quality)
            & (split_bucket < train_pct)
        )
        .select(id_col, text_col, "lang_guess", "quality")
    )
    return packing.pack_sequences(
        survivors,
        budget=budget,
        n_buckets=n_buckets,
        id_col=id_col,
        text_col=text_col,
        carry_cols=["lang_guess", "quality"],
    )
