"""Text-analysis operators over a documents table.

Column-level building blocks live in `functions/text.py`; these operators
assemble them into DataFrame transforms. Everything is Catalyst
expressions — a 100 TB corpus sweep is one pass over the `text` column
with no Python in the path and full column pruning at the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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
ROLLING_BASE = 128  # Horner base
ROLLING_BOTTOM = 4  # bottom-k sketch size
# fold-state mask: the accumulator is clamped to 55 bits at EVERY Horner
# step, so acc*128 ≤ 2^62 and the +codepoint (≤ 0x10FFFF) can never reach
# 2^63 — without it, one 8-char window of high-codepoint text (e.g. CJK,
# ord ≈ 2^15) overflows BIGINT: Spark's long silently wraps while DuckDB
# RAISES, so the engines diverge exactly when the corpus goes non-ASCII.
# ASCII-only hash values change too (top bit folds away) — consistently
# on both engines, and nothing pins absolute sketch values.
ROLLING_MASK = (1 << 55) - 1


def rolling_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Rabin-Karp rolling-hash document fingerprint: every ROLLING_K-char
    window hashes via Horner's rule (acc*B + char — no powers, no
    overflow), and the bottom-ROLLING_BOTTOM distinct hashes form the
    sketch. Two documents sharing long substrings share window hashes, so
    sketch overlap estimates containment — the winnowing-style complement
    to the whole-document fingerprint (`fingerprints`) and the word-level
    MinHash (x06). Shuffle-free single pass, Arrow-vectorized: the
    per-window Horner fold is numpy over a sliding-window view — the r9
    x26 lesson (Spark higher-order functions evaluate INTERPRETED, and
    the nested transform/aggregate fold measured ~3 s per 5k-doc pass
    at sf0.1; the vectorized form is ~10x cheaper and byte-identical).
    Exactness: codepoints come from a utf-32 reinterpretation (== ord(),
    exactly the DuckDB oracle's `ord(substr(...))`), the fold masks at
    every step in int64 (max intermediate (2^55-1)*128 + c < 2^63), and
    np.unique == array_sort ∘ array_distinct. Documents shorter than
    the window get an empty sketch."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    k, base, mask, bottom = ROLLING_K, ROLLING_BASE, ROLLING_MASK, ROLLING_BOTTOM

    def _sketch_fn(texts):  # pd.Series -> pd.Series; hints omitted — the
        # in-function 'pd' import is invisible to pandas_udf's
        # string-annotation resolver under `from __future__ import annotations`
        out = []
        empty = np.empty(0, dtype=np.int64)
        for t in texts:
            if t is None or len(t) < k:
                out.append(empty)
                continue
            cp = np.frombuffer(
                t.encode("utf-32-le", "surrogatepass"), dtype=np.uint32
            ).astype(np.int64)
            sw = np.lib.stride_tricks.sliding_window_view(cp, k)
            acc = np.zeros(sw.shape[0], dtype=np.int64)
            for j in range(k):
                acc = (acc * base + sw[:, j]) & mask
            out.append(np.unique(acc)[:bottom])
        return pd.Series(out)

    _sketch = pandas_udf(_sketch_fn, "array<long>")
    return df.select(id_col, _sketch(F.col(text_col)).alias("fp_sketch"))


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


# Gopher-rule thresholds (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Appendix A1.1 —
# the published MassiveText quality-filter rule set).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.10
GOPHER_MAX_BULLET_RATIO = 0.90
GOPHER_MAX_ELLIPSIS_RATIO = 0.30
GOPHER_MIN_ALPHA_RATIO = 0.80
GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_REQ_STOP = 2


def gopher_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/MassiveText rule-based quality gate: every published rule as
    a per-document metric plus the combined pass/fail verdict. Extends the
    reference's scalar surface (SURVEY §2.9) the way a pretraining
    pipeline needs — x01's heuristics score documents, this one GATES them
    with the industry-standard rule set.

    Zero-shuffle by construction: every metric is a Catalyst expression
    over one scan of the text column (word list and line list are each
    built once via staged projections, same CollapseProject reasoning as
    `repetition_stats`). At 100 TB this is scan-bound with no exchange and
    no Python; the `passes` flag makes the downstream filter a pushable
    predicate on this pass's output."""
    t = F.col(text_col)
    # stage 1: the two array builds (words, non-empty left-trimmed lines)
    base = df.select(
        F.col(id_col),
        t,
        T.tokens(t).alias("_toks"),
        # lowercased once here: the 8 stopword membership tests below all
        # reference this column — inlining the transform would make
        # Catalyst replay the lowercase pass per stopword
        F.transform(T.tokens(t), F.lower).alias("_toks_lower"),
        F.filter(
            F.transform(F.split(t, "\n"), F.ltrim),
            lambda line: line != F.lit(""),
        ).alias("_lines"),
    )
    # stage 2: counts off the arrays (each array referenced several times,
    # so they must already be named columns, not inline expressions)
    first = lambda line: F.substring(line, 1, 1)  # noqa: E731
    counted = base.select(
        F.col(id_col),
        F.size("_toks").alias("n_words"),
        F.aggregate(
            F.transform("_toks", F.length), F.lit(0), lambda a, x: a + x
        ).alias("_sum_wlen"),
        (
            F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
            + (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / F.lit(3)
        ).alias("_n_symbols"),
        F.size("_lines").alias("_n_lines"),
        F.size(
            F.filter(F.col("_lines"), lambda l: first(l).isin("-", "*", "•"))
        ).alias("_n_bullet"),
        F.size(
            F.filter(
                F.col("_lines"),
                lambda l: F.endswith(F.rtrim(l), F.lit("..."))
                | F.endswith(F.rtrim(l), F.lit("…")),
            )
        ).alias("_n_ellipsis"),
        F.size(
            F.filter(F.col("_toks"), lambda w: w.rlike("[A-Za-z]"))
        ).alias("_n_alpha"),
        sum(
            (
                F.array_contains(F.col("_toks_lower"), F.lit(w)).cast("int")
                for w in GOPHER_REQUIRED_STOPWORDS
            ),
            F.lit(0),
        ).alias("n_req_stop"),
    )
    # stage 3: ratios + verdict (guarded divisions; an empty document
    # fails the word-count rule, so zeroed ratios never flip the verdict)
    nz = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))  # noqa: E731
    ratios = counted.select(
        F.col(id_col),
        "n_words",
        nz(F.col("_sum_wlen"), F.col("n_words")).alias("mean_word_len"),
        nz(F.col("_n_symbols"), F.col("n_words")).alias("symbol_ratio"),
        nz(F.col("_n_bullet"), F.col("_n_lines")).alias("bullet_line_ratio"),
        nz(F.col("_n_ellipsis"), F.col("_n_lines")).alias("ellipsis_line_ratio"),
        nz(F.col("_n_alpha"), F.col("n_words")).alias("alpha_word_ratio"),
        "n_req_stop",
    )
    return ratios.select(
        "*",
        (
            F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
            & F.col("mean_word_len").between(GOPHER_MIN_MEAN_WLEN, GOPHER_MAX_MEAN_WLEN)
            & (F.col("symbol_ratio") < GOPHER_MAX_SYMBOL_RATIO)
            & (F.col("bullet_line_ratio") < GOPHER_MAX_BULLET_RATIO)
            & (F.col("ellipsis_line_ratio") < GOPHER_MAX_ELLIPSIS_RATIO)
            & (F.col("alpha_word_ratio") > GOPHER_MIN_ALPHA_RATIO)
            & (F.col("n_req_stop") >= GOPHER_MIN_REQ_STOP)
        ).alias("passes"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    embedding/RAG prep step (chunk_tokens window advancing by stride).
    Chunk starts are 0, stride, 2·stride … < n_tokens; the last chunk may
    be partial; empty documents produce no chunks.

    Scale shape: tokenize once, generate starts with `sequence`, and
    `posexplode` — a pure narrow pipeline (no shuffle, no Python); output
    rows ≈ input tokens / stride, produced streaming inside one codegen
    stage, so a 100 TB corpus chunks in a single scan-shaped pass."""
    toks = T.tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    e = df.select(
        F.col(id_col), toks.alias("__toks"), n.alias("__n"),
        F.posexplode(starts).alias("chunk_idx", "tok_start"),
    )
    piece = F.slice(F.col("__toks"), F.col("tok_start") + 1, chunk_tokens)
    return e.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("tok_start").cast("long").alias("tok_start"),
        F.least(F.lit(chunk_tokens), F.col("__n") - F.col("tok_start"))
        .cast("long")
        .alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def vocab_coverage(
    df: DataFrame, vocab_size: int, text_col: str = "text"
) -> DataFrame:
    """Frequency-ranked vocabulary with corpus coverage: the top
    ``vocab_size`` tokens, each with count, rank, and the cumulative
    fraction of all token occurrences covered through that rank — the
    standard pre-tokenizer diagnostic ("how big must V be for 95%
    coverage?").

    Scale shape: explode → partial-agg count per token (one shuffle on
    token); ranking + running coverage are a single global window over
    the DISTINCT-TOKEN table — |vocab| rows, not corpus rows (natural
    text vocabularies are millions at most; the corpus itself never
    sorts). The literal rank filter collapses to TakeOrderedAndProject
    below the window: each task keeps a partial top-V before the
    singleton-partition exchange (plan-tested)."""
    tok = df.select(
        F.explode(T.tokens(T.normalized_text(F.col(text_col)))).alias("token")
    )
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # rank-filter FIRST (rank-only window → WindowGroupLimit prunes
    # map-side), cumsum SECOND: the filter keeps a prefix of the same
    # ordering, so the running sum over survivors equals the running sum
    # over everything — and a mixed rank+sum window would disable the
    # group-limit pruning.
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= vocab_size)
        .withColumn("cum_cnt", F.sum("cnt").over(cum))
        .crossJoin(F.broadcast(total))
        .select(
            "token",
            "cnt",
            "rank",
            (F.col("cum_cnt") / F.col("total")).alias("coverage"),
        )
    )


LOGPROB_SCALE = 1_000_000  # fixed-point grid for cross-engine logprob sums


def unigram_model(
    df: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    tag: str = "x43-token-counts",
) -> tuple[DataFrame, DataFrame]:
    """Fit the unigram LM of `unigram_logprob` on a corpus and return
    its two tables: ``vocab_q`` (token → fixed-point logprob ``q``, at
    most ``vocab_size`` rows — broadcast it into scoring joins) and
    ``unk_q`` (ONE row holding the UNK logprob). Separated out so the
    model trains once in batch and then scores OTHER frames — including
    a document stream (s16's stream-static join).

    The token-count table is MATERIALIZED once (one corpus explode + one
    token-key shuffle with map-side partial agg) and then feeds every
    model arm — vocab cut, total mass, in-vocab mass — as cheap scans of
    a |distinct-token| table; the top-V cut collapses to
    TakeOrderedAndProject (partial top-V per task, same shape as
    `vocab_coverage`)."""
    from kafka_streams_learning_spark.operators.materialize import materialized

    tok = df.select(
        F.explode(T.tokens(T.normalized_text(F.col(text_col)))).alias("token")
    )
    # `tag` keys the run-scoped materialization: two models fit in ONE
    # query (x56's target + corpus) must not reclaim each other's
    # generations mid-plan
    counts = materialized(
        tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt")), tag=tag
    )
    return model_from_counts(counts, vocab_size)


def model_from_counts(
    counts: DataFrame, vocab_size: int
) -> tuple[DataFrame, DataFrame]:
    """The unigram-model math given an already-aggregated (token, cnt)
    table — split out so callers holding a shared count table (x56 fits
    two models from ONE corpus scan) skip the tokenize pass entirely.
    `counts` should be materialized (or tiny): it feeds three arms."""
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    vocab = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= vocab_size)
        .drop("rank")
    )
    scalars = counts.agg(F.sum("cnt").alias("n_total")).crossJoin(
        vocab.agg(F.sum("cnt").alias("n_vocab"))
    )

    scale = F.lit(float(LOGPROB_SCALE))
    denom = F.col("n_total") + F.lit(1)

    def _q(p: Column) -> Column:
        # floor() on a double already yields LONG in Spark; the grid snap
        # uses only IEEE mul/add/floor, matching the DuckDB oracle op-for-op
        return F.floor(F.log(p) * scale + F.lit(0.5))

    vocab_q = vocab.crossJoin(F.broadcast(scalars)).select(
        "token", _q(F.col("cnt") / denom).alias("q")
    )
    unk_q = scalars.select(
        _q((F.col("n_total") - F.col("n_vocab") + F.lit(1)) / denom).alias("unk_q")
    )
    return vocab_q, unk_q


def unigram_logprob(
    df: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style unigram language-model score per document — the
    cheap stand-in for the KenLM perplexity filter (Wenzek et al. 2019,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): fit a unigram LM on the corpus itself, score each document
    by its mean token log-probability, and let downstream consumers
    keep the head of the distribution.

    Model contract (deterministic, engine-portable):

    - vocabulary = top-``vocab_size`` tokens by (count desc, token);
      everything else folds into one UNK type whose count is the
      residual corpus mass;
    - with ``N`` = total token occurrences and ``C`` = in-vocab
      occurrences, ``p(tok) = cnt/(N+1)`` and
      ``p(UNK) = (N-C+1)/(N+1)`` — the +1 keeps the UNK mass non-empty
      even when the vocabulary covers the whole corpus;
    - every log-probability is snapped ONCE to a fixed-point grid,
      ``q = floor(ln(p)*1e6 + 0.5)`` as BIGINT, so the per-document
      score is an INTEGER sum — exact, associative, and identical
      across engines regardless of aggregation order (float sums over
      rows are partition-order-dependent; integer sums are not);
    - ``avg_logprob = logprob_q_sum / (1e6 * n_tokens)`` is a single
      IEEE division of exact integers — bit-reproducible.

    Scale shape: the token-count table is MATERIALIZED once (one corpus
    explode + one token-key shuffle with map-side partial agg) and then
    feeds every model arm — vocab cut, total mass, in-vocab mass — as
    cheap scans of a |distinct-token| table; the top-V cut collapses to
    TakeOrderedAndProject (partial top-V per task, same shape as
    `vocab_coverage`). The scoring pass scans the corpus exactly once:
    explode → broadcast-hash-join against the ≤V-row vocab → doc-key
    hash-agg with map-side partial combine (a document's tokens are
    co-located in the scan). The corpus is read twice total and never
    shuffled on token for scoring (plan-tested).
    """
    vocab_q, unk_q = unigram_model(df, vocab_size, text_col=text_col)
    tok = df.select(
        F.col(id_col),
        F.explode(T.tokens(T.normalized_text(F.col(text_col)))).alias("token"),
    )
    return score_tokens(
        tok.crossJoin(F.broadcast(unk_q)), vocab_q, F.col("unk_q"), id_col=id_col
    )


def score_tokens(
    tok: DataFrame, vocab_q: DataFrame, unk: Column, id_col: str = "doc_id"
) -> DataFrame:
    """The ONE scoring definition shared by the batch scorer
    (`unigram_logprob`) and the streaming twin (catalog s16): per-doc
    token count, UNK count, exact integer logprob sum, and the final
    IEEE average. ``tok`` is (id, token) rows; ``unk`` is the UNK
    logprob as a column — the batch path cross-joins the 1-row
    `unigram_model` table, the streaming path passes a driver-ferried
    literal (a stream cannot cross-join a static frame). Keeping the
    aggregate expressions in one place is what guarantees both engines'
    rows hash-match the same DuckDB oracle."""
    scale = F.lit(float(LOGPROB_SCALE))
    scored = (
        tok.join(F.broadcast(vocab_q), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("q").isNull(), 1).otherwise(0)).alias("n_unk"),
            F.sum(F.coalesce(F.col("q"), unk)).alias("logprob_q_sum"),
        )
    )
    return scored.select(
        id_col,
        "n_tokens",
        "n_unk",
        "logprob_q_sum",
        (
            F.col("logprob_q_sum").cast("double") / (scale * F.col("n_tokens"))
        ).alias("avg_logprob"),
    )


def ccnet_buckets(
    df: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The CCNet corpus partition (Wenzek et al. 2019 §4.3): score every
    document with the unigram LM (`unigram_logprob`), cut the score
    distribution at its terciles, and label each document head / middle
    / tail — head is the best-scoring third (highest mean logprob =
    lowest perplexity), the slice CCNet keeps for pretraining.

    Determinism: the scores are exact fixed-point sums, and the tercile
    cuts use exact `percentile` interpolation, which is measured
    bit-portable against DuckDB's `quantile_cont` (see
    `core.quantile_stats`); comparisons against the cuts are then exact.

    Scale shape: the scored table (one row per document) is
    MATERIALIZED once, so the corpus-side work of `unigram_logprob`
    runs once; the tercile agg reduces it to ONE broadcast row and the
    labeling pass is a per-row expression over the scored table. Exact
    `percentile` buffers the score vector on one reducer — beyond ~1e9
    documents swap in `approx_percentile` cuts (the x24/x37 pattern;
    the label contract is unchanged, cut placement shifts within sketch
    error).
    """
    from kafka_streams_learning_spark.operators.materialize import materialized

    scored = materialized(
        unigram_logprob(df, vocab_size, text_col=text_col, id_col=id_col),
        tag="x45-scored",
    )
    cuts = scored.agg(
        F.percentile("avg_logprob", 1 / 3).alias("c1"),
        F.percentile("avg_logprob", 2 / 3).alias("c2"),
    )
    return scored.crossJoin(F.broadcast(cuts)).select(
        id_col,
        "avg_logprob",
        F.when(F.col("avg_logprob") >= F.col("c2"), F.lit("head"))
        .when(F.col("avg_logprob") >= F.col("c1"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def bpe_pair_counts(df: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """Top-k adjacent token-pair frequencies — the merge-candidate table
    of the first BPE iteration (Sennrich et al. 2016), the other half of
    tokenizer prep beside `vocab_coverage`'s unigram table.

    Adjacent pairs ARE the k=2 word shingles, so this reuses the
    let-bound shingle chain shared with the MinHash/Jaccard family (and
    its oracle SQL fragment); a 1-token document's degenerate all-token
    shingle contains no space and is filtered out.

    Scale shape: explode → map-side partial count → one shuffle on pair
    → TakeOrdered(k): the heavy-hitters plan of `token_topk`; no global
    sort of the pair table."""
    pair = df.select(
        F.explode(T.word_shingles(F.col(text_col), 2)).alias("pair")
    ).filter(F.instr(F.col("pair"), " ") > 0)
    counts = pair.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.orderBy(F.col("cnt").desc(), F.col("pair")).limit(k)


def bm25_query_terms(queries: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """(qid, term) pairs with query text run through the SAME pipeline as
    corpus tokens (normalized_text lowercases + collapses whitespace, so
    the Python mirror is lower().split()). Shared by bm25_topk and the
    x49 oracle-SQL generator so the two can never disagree on the term
    set — a query like 'Stream Join' must match corpus 'stream join'."""
    return sorted(
        {(qid, t) for qid, qtext in queries for t in qtext.lower().split() if t}
    )


def bm25_topk(
    df: DataFrame,
    queries: list[tuple[str, str]],
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents per query by BM25 (Robertson/Spärck Jones, the
    Okapi `+1` idf variant so scores stay non-negative even for terms in
    most documents). Sparse lexical retrieval is the standard
    decontamination-by-retrieval / curation probe in training-data
    pipelines — given benchmark queries, pull the corpus documents most
    likely to leak them.

    Cross-engine portability (the x21/x43 contracts combined): the idf is
    quantized once — ``round(ln((N-df+0.5)/(df+0.5)+1), 9)`` — and every
    per-(doc,term) contribution is snapped to the 1e-6 fixed-point grid
    BEFORE the per-query sum, so a document's score is an EXACT integer
    sum: associative, arrival-order-free, identical across engines. The
    top-k ranking orders by that integer (ties → doc id asc), never by a
    float.

    Scale shape: the corpus is tokenized ONCE into a (doc, dl, matched
    query terms) projection — the query-term filter is a per-row literal
    array-membership expression, so non-matching tokens die in the scan
    and the explode is bounded by |matches|, not corpus tokens. That
    projection is MATERIALIZED and feeds both arms (the 1-row N/avgdl
    aggregate and the tf table) without recomputing the tokenize pass.
    df/idf aggregate over ≤|query terms| keys; the ≤|queries|·|terms| map
    broadcasts; per-query top-k is a WindowGroupLimit (partial top-k per
    task before the |queries|-key exchange)."""
    from kafka_streams_learning_spark.operators.materialize import materialized

    spark = df.sparkSession
    q_rows = bm25_query_terms(queries)
    q_df = spark.createDataFrame(q_rows, ["qid", "term"])
    terms_lit = F.array(*[F.lit(t) for t in sorted({t for _, t in q_rows})])

    base = materialized(
        df.select(
            F.col(id_col),
            T.tokens(T.normalized_text(F.col(text_col))).alias("toks"),
        ).select(
            id_col,
            F.size("toks").alias("dl"),
            F.filter("toks", lambda t: F.array_contains(terms_lit, t)).alias(
                "qtoks"
            ),
        ),
        tag="x49-doclens",
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("dl_sum")
    )
    tf = (
        base.select(id_col, "dl", F.explode("qtoks").alias("term"))
        .groupBy(id_col, "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))

    avgdl = F.col("dl_sum").cast("double") / F.col("n_docs")
    idf = F.round(
        F.log(
            (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
            / (F.col("dfreq") + F.lit(0.5))
            + F.lit(1.0)
        ),
        9,
    )
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    contrib = idf * (tf_d * F.lit(k1 + 1.0)) / denom
    scale = float(LOGPROB_SCALE)
    contrib_q = F.floor(contrib * F.lit(scale) + F.lit(0.5)).cast("long")

    per_q = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(id_col, "term", contrib_q.alias("cq"))
        .join(F.broadcast(q_df), "term")
        .groupBy("qid", id_col)
        .agg(F.sum("cq").alias("score_q"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score_q").desc(), F.col(id_col))
    return (
        per_q.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            id_col,
            "rank",
            (F.col("score_q").cast("double") / F.lit(scale)).alias("score"),
        )
    )


# fixed-point grid for the Zipf OLS sums: coarse enough that the integer
# moment Σ xq·yq stays far from int64 overflow even at web-scale vocab
# sizes (xq,yq ≤ ~23,000 at 1e10 types/occurrences ⇒ per-row product
# ≤ 5.3e8; 1e9 vocabulary rows ⇒ Σ ≤ 5.3e17 < 2^63)
ZIPF_SCALE = 1_000
ZIPF_OUT_SCALE = 1_000_000  # output grid for slope/intercept


def zipf_slope(
    df: DataFrame, text_col: str = "text", group_col: str = "lang"
) -> DataFrame:
    """Rank-frequency power-law fit per group: the OLS slope (and
    intercept) of ln(count) on ln(rank) over the group's token frequency
    table. Natural text tracks slope ≈ -1 (Zipf's law); a corpus slice
    whose slope is far off — too flat (template/boilerplate floods the
    tail) or too steep (tiny repetitive vocabulary) — is the classic
    cheap distribution-shift alarm for a training-data pipeline, per
    source, per language, per snapshot.

    Portability contract (the x43/x49 pattern): ln(rank) and ln(count)
    are each snapped ONCE to the ZIPF_SCALE fixed-point grid, so all
    five OLS moments (n, Σx, Σy, Σxy, Σx²) are EXACT integer sums —
    associative and partition-order-free. slope = (nΣxy − ΣxΣy) /
    (nΣx² − (Σx)²) is then a single integer-ratio division, snapped to
    the 1e-6 output grid; the intercept reuses the snapped slope.

    Scale shape: one corpus scan → (group, token) count with map-side
    partial agg; ranks come from a window over the |vocab|-sized count
    table (not the corpus); moments collapse per group. The per-group
    window sort is the pragmatic cost — vocabularies are ≤ millions of
    rows even for 100 TB corpora, so the sorted partition fits a task.
    """
    tok = df.select(
        F.col(group_col),
        F.explode(T.tokens(T.normalized_text(F.col(text_col)))).alias("token"),
    )
    counts = tok.groupBy(group_col, "token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(group_col).orderBy(F.col("cnt").desc(), F.col("token"))
    ranked = counts.withColumn("rank", F.row_number().over(w))
    scale = F.lit(float(ZIPF_SCALE))
    xq = F.floor(F.log(F.col("rank").cast("double")) * scale + F.lit(0.5)).cast(
        "long"
    )
    yq = F.floor(F.log(F.col("cnt").cast("double")) * scale + F.lit(0.5)).cast(
        "long"
    )
    m = ranked.select(group_col, xq.alias("xq"), yq.alias("yq")).groupBy(
        group_col
    ).agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
    )
    out_scale = F.lit(float(ZIPF_OUT_SCALE))
    num = (F.col("n_types") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n_types") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    # single-type groups (n·Σx² = (Σx)²) have no regression line: NULL,
    # guarded identically in the oracle — floor(NaN) diverges between
    # engines otherwise
    slope_q = F.when(
        den != 0, F.floor(num / den * out_scale + F.lit(0.5)) / out_scale
    )
    # intercept from the SNAPPED slope: ((Σy − slope·Σx)/n) back on the
    # ln grid; slope_q·sx is exact (snapped slope × integer), the final
    # divisions are deterministic IEEE ops
    intercept_q = (
        F.floor(
            (
                F.col("sy").cast("double") / F.lit(float(ZIPF_SCALE))
                - F.col("slope") * F.col("sx").cast("double") / F.lit(float(ZIPF_SCALE))
            )
            / F.col("n_types")
            * out_scale
            + F.lit(0.5)
        )
        / out_scale
    )
    return (
        m.withColumn("slope", slope_q)
        .withColumn("intercept", intercept_q)
        .select(group_col, "n_types", "slope", "intercept")
    )


def dsir_importance(
    df: DataFrame,
    target_filter: Column,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weight per document (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score each
    raw-corpus document by the log-likelihood RATIO between a target
    distribution (the rows matching ``target_filter`` — in production,
    benchmark-like text) and the raw corpus, both modeled with the x43
    unigram LM contract. Importance-resampling by this weight shifts the
    pretraining mixture toward the target domain; the ratio form means
    corpus-wide common tokens cancel and only distribution DIFFERENCES
    score.

    Portability: both models emit fixed-point 1e-6 logprobs (the
    LOGPROB_SCALE contract), so the per-document weight is an exact
    INTEGER sum of per-token q_target − q_corpus differences —
    partition-order-free, identical across engines. ``avg_importance``
    is one IEEE division of exact integers.

    Scale shape: ONE corpus tokenize fits BOTH models — the shared
    (token, cnt, cnt_t) table (one explode + one token-key shuffle with
    map-side combine) yields the corpus model directly and the target
    model as its cnt_t>0 projection. Scoring is ONE more corpus scan: explode →
    two broadcast-hash-joins against the ≤V-row vocab tables → doc-key
    hash-agg with map-side combine (a document's tokens are co-located
    in the scan). The corpus is never shuffled on token for scoring."""
    from kafka_streams_learning_spark.operators.materialize import materialized

    # ONE corpus tokenize feeds BOTH models: per-token totals carry an
    # in-target subcount, so the target model's count table is the
    # cnt_t>0 projection — identical counts to tokenizing the filtered
    # slice separately, at half the scan/shuffle cost (the tokenize pass
    # dominates at corpus scale)
    flagged = df.select(
        target_filter.cast("long").alias("in_t"),
        F.explode(T.tokens(T.normalized_text(F.col(text_col)))).alias("token"),
    )
    counts2 = materialized(
        flagged.groupBy("token").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("in_t").alias("cnt_t")
        ),
        tag="x56-counts",
    )
    t_vocab, t_unk = model_from_counts(
        counts2.filter(F.col("cnt_t") > 0).select(
            "token", F.col("cnt_t").alias("cnt")
        ),
        vocab_size,
    )
    c_vocab, c_unk = model_from_counts(
        counts2.select("token", "cnt"), vocab_size
    )
    tok = df.select(
        F.col(id_col),
        F.explode(T.tokens(T.normalized_text(F.col(text_col)))).alias("token"),
    )
    scored = (
        tok.join(F.broadcast(t_vocab.withColumnRenamed("q", "q_t")), "token", "left")
        .join(F.broadcast(c_vocab.withColumnRenamed("q", "q_c")), "token", "left")
        .crossJoin(F.broadcast(t_unk.withColumnRenamed("unk_q", "unk_t")))
        .crossJoin(F.broadcast(c_unk.withColumnRenamed("unk_q", "unk_c")))
        .select(
            id_col,
            (
                F.coalesce(F.col("q_t"), F.col("unk_t"))
                - F.coalesce(F.col("q_c"), F.col("unk_c"))
            ).alias("dq"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("dq").alias("imp_q_sum"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "imp_q_sum",
        (
            F.col("imp_q_sum").cast("double")
            / (F.lit(float(LOGPROB_SCALE)) * F.col("n_tokens"))
        ).alias("avg_importance"),
    )


# ---------------------------------------------------------------------------
# Hashed Naive-Bayes quality classifier (x67)

# Hashing-trick feature dimension. Legibility-sized so bucket collisions
# are REAL on the fixture corpus (its distinct-token count exceeds 16 —
# the collision fold is part of the verified semantics, not an accident);
# production uses 2**18..2**20, which changes only this constant: the
# weight table stays O(n_buckets) rows and broadcastable either way.
CLS_BUCKETS = 16


def nb_bucketize(
    df: DataFrame,
    cols: list[Column],
    n_buckets: int = CLS_BUCKETS,
    text_col: str = "text",
) -> DataFrame:
    """The classifier's tokenize + hash-bucket prep — ONE definition
    shared by `nb_train` (batch) and the streaming scorer (s22), so the
    two sides cannot drift apart on normalization, tokenization, or the
    bucket hash (the `bloom_probe_score` precedent: the oracle contract
    is op-for-op identity, so the shared stage must BE shared code).
    ``cols`` are the passthrough columns/expressions to carry alongside
    each token's bucket."""
    from kafka_streams_learning_spark.functions.hashing import hash60

    # the exploded token gets an internal alias a passthrough column can't
    # plausibly shadow — a caller carrying a column literally named
    # "token" must not silently hash the wrong column (ADVICE r7)
    toks = df.select(
        *cols,
        F.explode(T.tokens(T.normalized_text(F.col(text_col)))).alias("__nb_token"),
    )
    carried = [f.name for f in toks.schema.fields[:-1]]
    if len(set(carried)) != len(carried) or "__nb_token" in carried:
        raise ValueError(
            "nb_bucketize passthrough columns must be uniquely named and "
            f"must not use the internal alias '__nb_token': {carried}"
        )
    return toks.select(
        *carried, (hash60(F.col("__nb_token")) % F.lit(n_buckets)).alias("bucket")
    )


def nb_train(
    df: DataFrame,
    positive: Column,
    n_buckets: int = CLS_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    tag: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the hashed-feature multinomial-NB model `nb_hash_classifier`
    scores with; split out so a STREAM can score against a batch-frozen
    model (s22 — the s16/s21 stream-static precedent).

    Precondition (ENFORCED): both classes must be non-empty — the NB
    class prior hits ln(0) on a one-class corpus, which Spark evaluates
    to silent NULL scores (DuckDB's ln(0) errors, so such a corpus
    cannot even be oracle-checked). Training collects the 1-row doc
    prior (a column-pruned scan it then reuses as exact-integer
    literals, so the corpus is not re-scanned when `scalars`
    evaluates) and raises ``ValueError`` when either class is empty.

    Returns ``(tok, weights, scalars)``:

    - ``tok`` — the MATERIALIZED (id, is_pos, bucket) token table. ONE
      corpus tokenize produces it, and it feeds BOTH the training
      aggregate here and (in the batch classifier) the scoring join —
      the x43/x65 shared-intermediate shape: at 100 TB the text column
      is scanned once end-to-end, and the reusable intermediate is
      three ints per token with its own footer stats.
    - ``weights`` — the ≤ n_buckets-row (bucket, w_q) LLR table; always
      broadcastable regardless of corpus vocabulary (feature hashing).
    - ``scalars`` — 1 row (w0_q, prior_q): the unseen-bucket weight and
      the class-prior log-odds, on the same 1e-6 grid.

    ``tag`` keys the run-scoped materializations; pass a per-corpus tag
    when several corpora train in one process (the per-sf-tag contract
    of the shared dedup pair tables).
    """
    from kafka_streams_learning_spark.operators.materialize import materialized

    scale = F.lit(float(LOGPROB_SCALE))
    d_lit = F.lit(n_buckets)

    def _q(p: Column) -> Column:
        # floor() on a double yields LONG in Spark; one snap per ln
        return F.floor(F.log(p) * scale + F.lit(0.5))

    is_pos = F.when(positive, F.lit(1)).otherwise(F.lit(0))
    tok = materialized(
        nb_bucketize(
            df,
            [F.col(id_col).alias("id"), is_pos.alias("is_pos")],
            n_buckets,
            text_col,
        ),
        tag=f"{tag}-tok" if tag else None,
    )
    counts = materialized(
        tok.groupBy("bucket").agg(
            F.sum("is_pos").alias("pos_cnt"), F.count(F.lit(1)).alias("all_cnt")
        ),
        tag=f"{tag}-counts" if tag else None,
    )
    totals = counts.agg(
        F.sum("pos_cnt").alias("n_pos_tot"),
        (F.sum("all_cnt") - F.sum("pos_cnt")).alias("n_neg_tot"),
    )
    pri = df.agg(
        F.sum(is_pos).alias("n_pos_docs"), F.count(F.lit(1)).alias("n_docs")
    ).collect()[0]
    n_pos_docs, n_docs = int(pri["n_pos_docs"] or 0), int(pri["n_docs"])
    if n_pos_docs == 0 or n_pos_docs == n_docs:
        raise ValueError(
            "nb_train needs both classes non-empty: "
            f"{n_pos_docs} of {n_docs} docs match `positive` — the class "
            "prior hits ln(0) and every score would be NULL"
        )
    # exact-integer literals: the ln/snap math still runs in-engine, so
    # there is no Python-vs-JVM log() drift, but downstream evaluations
    # of `scalars` no longer re-scan the corpus for the prior
    priors = df.sparkSession.range(1).select(
        F.lit(n_pos_docs).cast("long").alias("n_pos_docs"),
        F.lit(n_docs).cast("long").alias("n_docs"),
    )

    def _ratio(num: Column, den: Column) -> Column:
        # exact integers -> ONE IEEE division feeding the snapped ln
        return num.cast("double") / den.cast("double")

    pos_den = F.col("n_pos_tot") + d_lit
    neg_den = F.col("n_neg_tot") + d_lit
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            _q(_ratio(F.col("pos_cnt") + F.lit(1), pos_den))
            - _q(_ratio(F.col("all_cnt") - F.col("pos_cnt") + F.lit(1), neg_den))
        ).alias("w_q"),
    )
    scalars = totals.crossJoin(priors).select(
        # unseen bucket = the same LLR formula at pos_cnt = all_cnt = 0
        (_q(_ratio(F.lit(1), pos_den)) - _q(_ratio(F.lit(1), neg_den))).alias("w0_q"),
        (
            _q(_ratio(F.col("n_pos_docs"), F.col("n_docs")))
            - _q(_ratio(F.col("n_docs") - F.col("n_pos_docs"), F.col("n_docs")))
        ).alias("prior_q"),
    )
    return tok, weights, scalars


def nb_score(
    tok: DataFrame,
    weights: DataFrame,
    w0_q: Column,
    prior_q: Column,
    group_col: str = "id",
) -> DataFrame:
    """Score a (group_col, bucket) token table against a trained model:
    broadcast weight join + exact integer sums — the SAME expressions in
    batch and streaming, which is what keeps s22's final state hash-equal
    to x67's oracle. ``w0_q``/``prior_q`` are Columns: the batch path
    cross-joins the 1-row scalars frame, a stream passes collected
    literals (s16's UNK-logprob precedent — a stream cannot cross-join
    even a 1-row static frame)."""
    scored = (
        tok.join(F.broadcast(weights), "bucket", "left")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("w_q"), w0_q)).alias("llr_q_sum"),
            F.min(prior_q).alias("prior_q"),  # constant per row; min is exact
        )
    )
    return scored.select(
        group_col,
        "n_tokens",
        "llr_q_sum",
        (
            (F.col("prior_q") + F.col("llr_q_sum")).cast("double")
            / F.lit(float(LOGPROB_SCALE))
        ).alias("log_odds"),
        ((F.col("prior_q") + F.col("llr_q_sum")) > 0).alias("is_positive"),
    )


def nb_score_batch(
    tok: DataFrame,
    weights: DataFrame,
    scalars: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch scoring assembly over `nb_train`'s outputs: the 1-row
    scalars frame cross-joins (broadcast) onto the token table so the
    whole pipeline stays collect-free, then `nb_score` does the rest."""
    scored = nb_score(
        tok.crossJoin(F.broadcast(scalars)),
        weights,
        F.col("w0_q"),
        F.col("prior_q"),
        "id",
    )
    return scored.withColumnRenamed("id", id_col)


def nb_hash_classifier(
    df: DataFrame,
    positive: Column,
    n_buckets: int = CLS_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    tag: str | None = None,
) -> DataFrame:
    """Model-based quality filter: a hashed-feature Naive-Bayes classifier
    trained in ONE aggregation pass and applied to the whole corpus — the
    engine-native form of the fastText-style "curated-reference" filters
    used by LLM data pipelines (Joulin et al. 2016, "Bag of Tricks for
    Efficient Text Classification"; labels-from-a-curated-slice as in the
    LLaMA webtext classifier). ``positive`` is a boolean Column marking
    the curated/reference class (e.g. ``col("source").isin(...)``).

    Two public techniques compose:

    - **Feature hashing** (Weinberger et al. 2009): tokens map to
      ``hash(token) % n_buckets``, so the model is a FIXED-size table of
      at most ``n_buckets`` rows no matter how large the corpus
      vocabulary grows — at 100 TB the weight table still broadcasts,
      and training's exchange carries at most tasks x n_buckets
      partially-combined rows, never raw tokens.
    - **Multinomial Naive Bayes** (McCallum & Nigam 1998): per-bucket
      weight = log-likelihood ratio ln p(b|pos) - ln p(b|neg) with
      Laplace +1 smoothing; document score = class prior + sum of token
      weights. The sigmoid is omitted deliberately — it is monotone in
      the log-odds, so the keep/drop verdict is identical.

    Determinism contract (the x43 pattern): every ln is snapped ONCE to
    the 1e-6 fixed-point grid (``floor(ln(p)*1e6 + 0.5)`` as BIGINT);
    per-bucket weights and per-document scores are then exact INTEGER
    sums/differences — associative, partition-order-free, and identical
    in DuckDB. The only floats are single IEEE divisions of exact
    integers feeding each ln, mirrored op-for-op in the oracle.

    Plan shape: ONE corpus tokenize materializes the (id, is_pos,
    bucket) token table (`nb_train`), which feeds the bucket-key
    training hash-agg (map-side combine; <= n_buckets groups) AND the
    scoring join — the text column is never tokenized twice. The
    <= n_buckets+2 model rows broadcast into the scoring pass = token-
    table scan -> broadcast join -> doc-key hash-agg (a document's
    tokens are co-located in the materialized table, so partials
    collapse map-side). The corpus is never shuffled on token or bucket
    (plan-tested).

    Output: (id, n_tokens, llr_q_sum, log_odds, is_positive) — one row
    per document with at least one token.
    """
    tok, weights, scalars = nb_train(df, positive, n_buckets, text_col, id_col, tag)
    return nb_score_batch(tok.select("id", "bucket"), weights, scalars, id_col)
