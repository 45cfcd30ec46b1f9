"""Multimodal column plumbing — binary payloads with typed metadata.

Images/audio/video ride through the engine as opaque ``binary`` columns plus
typed metadata; the Spark-side plumbing (schemas, Arrow batch shapes,
``mapInPandas`` signatures, partitioning) is real and tested, while the
actual codec work is stubbed: the decode libraries are not in this container,
so ``decode_image_batch`` raises ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic fake decoder so the
downstream plumbing (feature extraction, resizing contract, batch shapes)
can be exercised end to end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_META_SCHEMA = (
    "doc_id long, n_bytes long, content_sha256 string, feature array<float>"
)

FEATURE_DIM = 8


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for image decode + feature extraction:
    an 8-dim feature from byte histogram moments. Replace with a real
    codec + model in production."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    chunks = np.array_split(arr.astype(np.float32), FEATURE_DIM)
    return np.array([c.mean() if c.size else 0.0 for c in chunks], dtype=np.float32)


def binary_metadata(df: DataFrame, payload_col: str, id_col: str = "doc_id") -> DataFrame:
    """JVM-side metadata over a binary column: size + content hash."""
    return df.select(
        F.col(id_col),
        F.length(F.col(payload_col)).alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("content_sha256"),
    )


def extract_features(
    df: DataFrame,
    payload_col: str,
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched; one Python worker call per batch, vectorized inside.
    With ``fake=False`` this raises NotImplementedError at execution time —
    the decode codecs (PIL/ffmpeg/...) are deliberately not bundled.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not fake:
                raise NotImplementedError(
                    "image/audio decode requires codec libraries not present "
                    "in this environment; pass fake=True for the deterministic "
                    "test decoder"
                )
            payloads = b[payload_col]
            # NULL payloads propagate as NULL outputs, matching the JVM-side
            # sibling (binary_metadata: length/sha2 of NULL are NULL) — a
            # bare len()/sha256() would kill the whole stage on one null row
            yield pd.DataFrame(
                {
                    "doc_id": b[id_col],
                    "n_bytes": payloads.map(
                        lambda p: len(p) if p is not None else None
                    ),
                    "content_sha256": payloads.map(
                        lambda p: __import__("hashlib").sha256(p).hexdigest()
                        if p is not None
                        else None
                    ),
                    "feature": payloads.map(
                        lambda p: _fake_decode(p) if p is not None else None
                    ),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, BINARY_META_SCHEMA
    )
