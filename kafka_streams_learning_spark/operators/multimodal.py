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


# Output schema of the resize stage — like FEATURE_SCHEMA, a fixed
# contract so downstream code is independent of the resizer backend.
RESIZE_SCHEMA = (
    "id long, width int, height int, out_w int, out_h int, resized binary"
)


def aspect_fit(
    df: DataFrame,
    max_w: int,
    max_h: int,
    w_col: str = "width",
    h_col: str = "height",
) -> DataFrame:
    """Aspect-preserving fit-downscale dimensions (never upscales):
    out = floor(dim * min(max_w/w, max_h/h, 1)), floored at 1. Pure JVM
    column math — at scale the dimension planning stays in codegen and
    only the pixel transform pays the Python/Arrow boundary."""
    scale = F.least(
        F.lit(float(max_w)) / F.col(w_col),
        F.lit(float(max_h)) / F.col(h_col),
        F.lit(1.0),
    )
    return df.withColumn(
        "out_w", F.greatest(F.floor(F.col(w_col) * scale), F.lit(1)).cast("int")
    ).withColumn(
        "out_h", F.greatest(F.floor(F.col(h_col) * scale), F.lit(1)).cast("int")
    )


def resize_stub(*_args, **_kwargs):
    """Real pixel resampling — requires image libs not present here."""
    raise NotImplementedError(
        "image resize requires codec/pixel libraries not available in "
        "this environment; use fake_resize for pipeline testing"
    )


def fake_resize(df: DataFrame, blob_col: str = "blob", id_col: str = "id") -> DataFrame:
    """Deterministic resize stand-in with the production plumbing:
    mapInPandas over Arrow batches, explicit output schema, and the REAL
    contract a resizer must honor — the output blob has exactly
    out_w*out_h bytes (one fake 'pixel' per byte, sha256-derived from the
    source blob so it is deterministic and content-addressed). Input rows
    must already carry out_w/out_h from `aspect_fit`."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def mk(b: bytes, k: int) -> bytes:
            seed = hashlib.sha256(b).digest()
            return (seed * (-(-k // len(seed))))[:k]

        for pdf in batches:
            n = (pdf["out_w"] * pdf["out_h"]).astype(int)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_w": pdf["out_w"],
                    "out_h": pdf["out_h"],
                    "resized": [
                        mk(b, int(k)) for b, k in zip(pdf[blob_col], n)
                    ],
                }
            )

    return df.mapInPandas(_resize, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int, frame_col: str = "n_frames") -> DataFrame:
    """Frame-sampling plan for video rows: explode frame indices 0, n, 2n…
    JVM-side sequence, no decode — the decoder then fetches only sampled
    frames (at scale this is the difference between reading 1/30th and
    reading everything)."""
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col(frame_col) - 1, F.lit(0)), F.lit(every_n))),
    )
