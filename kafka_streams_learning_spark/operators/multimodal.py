"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side contract is real and tested: a multimodal table is rows of
(id, modality, blob BINARY, meta STRUCT). Metadata extraction and content
hashing are JVM expressions; decode/feature steps are Arrow-batched
`mapInPandas` UDFs with explicit schemas and bounded batch sizes so a
1000-executor run streams blobs through Python in fixed-memory batches
instead of materializing them.

The actual media decoding is STUBBED — the image/audio libraries are not
in this container. `decode_stub` raises NotImplementedError by design;
`fake_decode_features` is the deterministic stand-in used by tests to
exercise the identical plumbing (schema, batching, partitioning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output schema of the feature-extraction stage — fixed contract so the
# downstream pipeline is independent of the decoder implementation.
FEATURE_SCHEMA = (
    "id long, modality string, n_bytes long, content_sha string, "
    "width int, height int, n_frames int, feature array<float>"
)


def binary_meta(df: DataFrame, blob_col: str = "blob", id_col: str = "id") -> DataFrame:
    """Cheap JVM-side metadata: byte length + content hash. No decode, no
    Python — this is the dedup/integrity pass that should *precede* any
    expensive decoding at scale."""
    return df.select(
        id_col,
        "modality",
        F.octet_length(F.col(blob_col)).alias("n_bytes"),
        F.sha2(F.col(blob_col), 256).alias("content_sha"),
    )


def decode_stub(*_args, **_kwargs):
    """Real media decode — requires image/audio libs not present here."""
    raise NotImplementedError(
        "media decode requires codec libraries not available in this "
        "environment; use fake_decode_features for pipeline testing"
    )


def fake_decode_features(df: DataFrame, blob_col: str = "blob", feat_dim: int = 8) -> DataFrame:
    """Deterministic decode stand-in with the production plumbing:
    mapInPandas over Arrow batches, explicit output schema. 'Decodes' a
    blob into fake dimensions (from byte length) and a fake feature vector
    (rolling byte sums) — enough to test partitioning, batch shapes, and
    downstream joins without codecs."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf[blob_col].map(len),
                    "content_sha": pdf[blob_col].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "width": pdf[blob_col].map(lambda b: 1 + len(b) % 64),
                    "height": pdf[blob_col].map(lambda b: 1 + len(b) % 48),
                    "n_frames": pdf["modality"].map(
                        lambda m: 1 if m != "video" else 30
                    ),
                    "feature": pdf[blob_col].map(
                        lambda b: [
                            float(sum(b[i::feat_dim]) % 997) for i in range(feat_dim)
                        ]
                    ),
                }
            )
            yield out

    return df.mapInPandas(_decode, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int, frame_col: str = "n_frames") -> DataFrame:
    """Frame-sampling plan for video rows: explode frame indices 0, n, 2n…
    JVM-side sequence, no decode — the decoder then fetches only sampled
    frames (at scale this is the difference between reading 1/30th and
    reading everything)."""
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col(frame_col) - 1, F.lit(0)), F.lit(every_n))),
    )
