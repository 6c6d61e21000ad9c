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


ROLLING_K = 8  # chars per rolling window
ROLLING_BASE = 128  # Horner base; 128^8 = 2^56 keeps the hash in a signed long
ROLLING_BOTTOM = 4  # bottom-k sketch size


def rolling_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Rabin-Karp rolling-hash document fingerprint: every ROLLING_K-char
    window hashes via Horner's rule (acc*B + char — no powers, no
    overflow), and the bottom-ROLLING_BOTTOM distinct hashes form the
    sketch. Two documents sharing long substrings share window hashes, so
    sketch overlap estimates containment — the winnowing-style complement
    to the whole-document fingerprint (`fingerprints`) and the word-level
    MinHash (x06). Pure expression: shuffle-free single pass. Documents
    shorter than the window get an empty sketch (Spark's `sequence(1, 0)`
    DESCENDS rather than returning empty — the guard is load-bearing)."""
    t = F.col(text_col)
    n = F.length(t)
    # char codes extracted ONCE per document (split+ascii is one pass),
    # then each window folds over an 8-int slice — identical hash values
    # to folding ascii(substring(t, p, 1)) per position, but ~K× fewer
    # string ops. The one-element-array transform wrapper binds the codes
    # array to a lambda variable, guaranteeing single evaluation (a plain
    # column reference would be re-inlined into every window by
    # CollapseProject and recompute the split per window).
    codes = F.transform(F.split(t, ""), F.ascii)
    window_hash = lambda chars, i: F.aggregate(  # noqa: E731
        F.slice(chars, i, ROLLING_K),
        F.lit(0).cast("long"),
        lambda acc, c: acc * ROLLING_BASE + c,
    )
    hashes = F.transform(
        F.array(codes),
        lambda chars: F.transform(
            F.sequence(F.lit(1), n - F.lit(ROLLING_K - 1)),
            lambda i: window_hash(chars, i),
        ),
    )[0]
    sketch = F.slice(F.array_sort(F.array_distinct(hashes)), 1, ROLLING_BOTTOM)
    empty = F.array().cast("array<long>")
    return df.select(
        id_col,
        F.when(n >= ROLLING_K, sketch).otherwise(empty).alias("fp_sketch"),
    )


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII scrubbing pass: redacted text + per-pattern match counts
    (emails, IPv4 addresses, phone numbers). Pure regexp expressions —
    the 100 TB sweep is one codegen'd pass over the text column, no
    Python, no shuffle."""
    t = F.col(text_col)
    return df.select(id_col, T.redacted_text(t).alias("clean_text"), *T.pii_counts(t))


def tfidf_topk(
    df: DataFrame, k: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k terms per document by smooth TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, sklearn-style), ties broken by term asc.
    Documents with no tokens produce no rows (mirrored by the oracle).

    Cross-engine portability: JVM `Math.log` and C libm `log` disagree by
    1 ulp on ~9% of inputs (measured), so the idf is QUANTIZED —
    round(ln(x), 9) — before use; the rounded doubles matched bitwise on
    all 6000 probed inputs, and every downstream op (+1, ×tf) is exact
    IEEE on identical inputs.

    Scale shape: explode → per-(doc,term) count with map-side partial
    agg → doc-frequency agg on term → broadcast N → top-k per doc. The
    literal rank filter plans a WindowGroupLimit, so each task keeps only
    its local top-k per doc before the final exchange."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.explode(T.tokens(T.normalized_text(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    ndocs = F.broadcast(df.agg(F.count(F.lit(1)).alias("n_docs")))
    idf = F.round(F.log((F.col("n_docs") + 1) / (F.col("dfreq") + 1)), 9) + F.lit(1.0)
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(ndocs)
        .withColumn("score", F.col("tf").cast("double") * idf)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "dfreq", "rank", "score")
    )


def token_topk(df: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """Global top-k tokens by frequency (tie-break: token asc).

    Scale shape: explode → partial count per partition → one shuffle on
    token → total count → TakeOrdered(k) — the classic heavy-hitters plan;
    no global sort of the full token table."""
    tok = df.select(F.explode(T.tokens(T.normalized_text(F.col(text_col)))).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(k)


def repetition_stats(
    df: DataFrame,
    k: int = 2,
    threshold: float = 0.10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Within-document repetition score: the fraction of duplicate k-word
    shingles inside each document — the Gopher/MassiveText-style
    repetition quality gate (heavily self-repeating documents are dropped
    or down-weighted before pretraining).

    Zero-shuffle by construction: the shingle array, its distinct form,
    and the ratio are per-row expressions on a single scan, so at 100 TB
    this runs at full scan speed with no exchange — the cheapest quality
    signal in the pipeline. The reference has no corpus-quality operators;
    this extends its text surface (SURVEY §2.9) for training-data work.
    """
    # staged projections, not one big select: each stage references the
    # previous alias, so the expensive expression (the shingle array /
    # its distinct size) is planned ONCE — inlining them into a single
    # select would embed a full copy of the shingling chain per
    # referencing column (Catalyst's CollapseProject keeps non-cheap
    # multiply-referenced aliases staged, which is exactly what we want)
    base = df.select(
        F.col(id_col), T.word_shingles(F.col(text_col), k).alias("_sh")
    )
    sized = base.select(
        F.col(id_col),
        F.size("_sh").alias("n_shingles"),
        F.size(F.array_distinct("_sh")).alias("n_distinct"),
    )
    ratio = (F.col("n_shingles") - F.col("n_distinct")) / F.col("n_shingles")
    return sized.select(
        F.col(id_col),
        "n_shingles",
        "n_distinct",
        ratio.alias("dup_ratio"),
        (ratio > F.lit(threshold)).alias("is_repetitive"),
    )
