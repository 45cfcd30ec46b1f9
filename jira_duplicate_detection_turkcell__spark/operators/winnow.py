"""Winnowing document fingerprints (rolling hash + window-min selection).

Schleimer/Wilkerson/Aiken's winnowing: hash every ``k``-char gram with a
polynomial *rolling* hash, then keep the minimum hash of every ``w``-gram
window — guaranteeing any shared substring of length ≥ k + w − 1 between two
documents yields at least one shared fingerprint. The selected fingerprints
are a compact, alignment-robust document sketch: the scalable analog of the
reference's exact-substring "replace duplicate" matching
(api_server.py:798-813) and a standard boilerplate/plagiarism detector.

Vectorization: one pandas UDF per batch. Char codes of all docs are
flattened into a single vector; the rolling hash is computed with wrapping
uint64 prefix sums (base B odd ⇒ invertible mod 2^64, so each window hash is
a difference of two prefixes times a power — O(1) per position after one
cumulative pass); window minima come from one ``sliding_window_view`` min.
Row boundaries are masked, never iterated.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = np.uint64(0x100000001B3)  # odd ⇒ invertible mod 2^64 (FNV prime)
_B_INV = np.uint64(pow(int(_B), -1, 1 << 64))


def _fmix64(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(0xC2B2AE3D27D4EB4F)
    h = h ^ (h >> np.uint64(29))
    h = h * np.uint64(0x165667B19E3779F9)
    return h ^ (h >> np.uint64(32))


def winnow_kernel(k: int = 8, window: int = 4):
    """Build the batch kernel: (id, text) → (id, fingerprints array<long>)."""

    def compute(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            texts = pdf.iloc[:, 1].astype(object).fillna("")
            n = len(pdf)
            codes = [
                np.frombuffer(t.encode("utf-8"), dtype=np.uint8) for t in texts
            ]
            lengths = np.fromiter((len(c) for c in codes), dtype=np.int64, count=n)
            flat = (
                np.concatenate(codes).astype(np.uint64)
                if lengths.sum()
                else np.empty(0, dtype=np.uint64)
            )

            fps: list[np.ndarray] = [None] * n  # type: ignore[list-item]
            if flat.size >= k:
                # rolling hash over the flat byte vector: with prefix
                # P[i] = Σ_{j≤i} c[j]·B^{-j} (wrapping), the hash of the
                # window starting at i is (P[i+k-1] − P[i-1]) · B^{i+k-1}.
                L = flat.size
                inv_pows = np.empty(L, dtype=np.uint64)
                inv_pows[0] = np.uint64(1)
                np.multiply.accumulate(
                    np.full(L - 1, _B_INV, dtype=np.uint64), out=inv_pows[1:]
                )
                pows = np.empty(L, dtype=np.uint64)
                pows[0] = np.uint64(1)
                np.multiply.accumulate(np.full(L - 1, _B, dtype=np.uint64), out=pows[1:])
                prefix = np.cumsum(flat * inv_pows, dtype=np.uint64)
                m = L - k + 1
                gh = prefix[k - 1 :].copy()
                gh[1:] -= prefix[: m - 1]
                gh *= pows[k - 1 :]
                gh = _fmix64(gh)

                # mask gram positions crossing row boundaries, then take the
                # min of every `window` consecutive in-row gram hashes
                row_id = np.repeat(np.arange(n, dtype=np.int64), lengths)
                gram_valid = row_id[:m] == row_id[k - 1 :]
                gh[~gram_valid] = np.uint64(0xFFFFFFFFFFFFFFFF)
                if m >= window:
                    sw = np.lib.stride_tricks.sliding_window_view(gh, window)
                    wins = sw.min(axis=1)
                    wv = m - window + 1
                    win_valid = row_id[:wv] == row_id[k + window - 2 :]
                    win_row = row_id[:wv]
                    sel = wins[win_valid]
                    sel_row = win_row[win_valid]
                    order = np.lexsort((sel, sel_row))
                    sel = sel[order]
                    sel_row = sel_row[order]
                    if sel.size:
                        first = np.ones(sel.size, dtype=bool)
                        first[1:] = (sel_row[1:] != sel_row[:-1]) | (
                            sel[1:] != sel[:-1]
                        )
                        sel = sel[first]
                        sel_row = sel_row[first]
                    counts = np.bincount(sel_row, minlength=n)
                    offs = np.zeros(n, dtype=np.int64)
                    np.cumsum(counts[:-1], out=offs[1:])
                    iv = sel.view(np.int64)
                    for i in range(n):
                        fps[i] = iv[offs[i] : offs[i] + counts[i]]

            # rows too short for a full window: fingerprint = hash of the
            # whole text (fold *all* bytes, 8 at a time, through the mixer —
            # a prefix-only hash would alias short docs that differ late)
            for i in range(n):
                if fps[i] is None or len(fps[i]) == 0:
                    raw = texts.iat[i].encode("utf-8")
                    raw = raw.ljust(-(-max(len(raw), 1) // 8) * 8, b"\0")
                    words = np.frombuffer(raw, dtype="<u8")
                    h = np.full(1, np.uint64(len(raw)), dtype=np.uint64)
                    for w in words:  # short docs only: a handful of words
                        h = _fmix64((h * _B) ^ w)
                    fps[i] = h.view(np.int64)

            yield pd.DataFrame({"id": pdf.iloc[:, 0].to_numpy(), "fingerprints": fps})

    return compute


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """(id, fingerprints array<long>) — winnowed rolling-hash sketch per doc."""
    kernel = winnow_kernel(k, window)
    out = df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, f"id {dict(df.select(id_col).dtypes)[id_col]}, fingerprints array<long>"
    )
    return out.withColumnRenamed("id", id_col)


def winnow_candidate_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Pairs of docs sharing ≥ min_shared fingerprints (key_l < key_r).

    Same shape as the LSH bucket join: explode → equi-join on fingerprint →
    count per pair; hot fingerprints (ubiquitous boilerplate) are salted
    (operators/buckets.py) so per-task work stays bounded without dropping
    any shared-fingerprint evidence. Each pair is emitted exactly once per
    shared fingerprint, so the groupBy count is the exact shared-fp count.
    """
    from .buckets import salted_bucket_pairs

    ex = fps.select(F.col(id_col), F.explode("fingerprints").alias("fp"))
    pairs, _hot = salted_bucket_pairs(ex, ["fp"], id_col, max_bucket_size)
    return (
        pairs.groupBy("key_l", "key_r")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
