"""Fused signature computation: MinHash + SimHash in one Python round-trip.

Profiling on the 40k-page corpus showed the naive plan (two chained
ArrowEvalPython nodes, each with its own JVM tokenization pass) spent more
time shipping batches through two Python hops and re-splitting text than on
the actual signature math. This module computes tokens → token hashes once
(JVM), derives shingle hashes from them (JVM, fixed-arity tuple hashing), and
runs ONE pandas UDF taking (shingles, token_hashes) and returning
struct(minhash_sig, simhash) — the numpy kernels from operators/minhash.py
and operators/simhash.py, fused.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.shingle import token_hashes, tokens, word_shingles_from_hashes
from .minhash import _MERSENNE_P, _permutations


def _flatten(col: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Series of int lists → (flat uint64, per-row lengths, nonempty offsets)."""
    lengths = col.map(len).to_numpy(dtype=np.int64)
    nonempty = lengths > 0
    flat = np.concatenate(
        [np.asarray(v, dtype=np.int64) for v in col if len(v)]
        or [np.array([], dtype=np.int64)]
    ).view(np.uint64)
    offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
    np.cumsum(lengths[nonempty][:-1], out=offsets[1:])
    return flat, lengths, offsets


def fused_compute(num_perm: int = 128, seed: int = 7, with_simhash: bool = True):
    """Build the raw batch-iterator kernel (JVM-free; unit-testable)."""
    a_params, b_params = _permutations(num_perm, seed)
    empty_sig = np.full(num_perm, np.iinfo(np.int64).max, dtype=np.int64)
    bit_idx = np.arange(64, dtype=np.uint64)

    def compute(batch_iter: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.DataFrame]:
        # reusable scratch buffers — per-batch allocation churn across many
        # concurrent workers was the measured anti-scaling culprit
        hv_buf = np.empty(0, dtype=np.uint64)
        for shingle_col, tok_col in batch_iter:
            # ---- MinHash over distinct shingle hashes
            flat, lengths, offsets = _flatten(shingle_col)
            nonempty = lengths > 0
            sigs = np.empty((len(shingle_col), num_perm), dtype=np.int64)
            sigs[~nonempty] = empty_sig
            if flat.size:
                if hv_buf.size < flat.size:
                    hv_buf = np.empty(flat.size, dtype=np.uint64)
                hv = hv_buf[: flat.size]
                rows = np.empty((num_perm, offsets.size), dtype=np.uint64)
                for k in range(num_perm):
                    np.multiply(a_params[k], flat, out=hv)
                    np.add(hv, b_params[k], out=hv)
                    np.mod(hv, _MERSENNE_P, out=hv)
                    rows[k] = np.minimum.reduceat(hv, offsets)
                sigs[nonempty] = rows.T.astype(np.int64, copy=False)

            # ---- SimHash over tf-weighted token hashes, chunked so the
            # (tokens × 64) vote expansion stays cache-sized per step
            sim = np.zeros(len(tok_col), dtype=np.int64)
            if with_simhash:
                tflat, tlengths, toffsets = _flatten(tok_col)
                tnonempty = tlengths > 0
                n_rows = int(tnonempty.sum())
                if tflat.size:
                    sums = np.zeros((n_rows, 64), dtype=np.int32)
                    chunk = 65536  # tokens per step → ≤ 32 MB of transients
                    for s in range(0, tflat.size, chunk):
                        e = min(s + chunk, tflat.size)
                        votes = (
                            ((tflat[s:e, None] >> bit_idx) & np.uint64(1)).astype(np.int32)
                            * 2 - 1
                        )
                        # rows intersecting [s, e): reduceat over the row
                        # starts clipped into the chunk, accumulate into sums
                        first = int(np.searchsorted(toffsets, s, side="right")) - 1
                        local = toffsets[(toffsets > s) & (toffsets < e)]
                        bounds = np.concatenate(([s], local)).astype(np.int64) - s
                        seg = np.add.reduceat(votes, bounds, axis=0)
                        sums[first : first + len(bounds)] += seg
                    bits = (sums > 0).astype(np.uint64)
                    packed = (bits << bit_idx).sum(axis=1, dtype=np.uint64)
                    sim[tnonempty] = packed.view(np.int64)

            yield pd.DataFrame({"minhash_sig": list(sigs), "simhash": sim})

    return compute


def fused_signature_udf(num_perm: int = 128, seed: int = 7, with_simhash: bool = True):
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(
        fused_compute(num_perm, seed, with_simhash),
        "minhash_sig array<long>, simhash long",
    )


def add_signatures(
    df: DataFrame,
    text_col: str = "text",
    shingle_w: int = 3,
    num_perm: int = 128,
    seed: int = 7,
    with_simhash: bool = True,
) -> DataFrame:
    """df + (shingles, minhash_sig, simhash) with one tokenization pass and
    one Python round-trip."""
    udf = fused_signature_udf(num_perm, seed, with_simhash)
    from ..functions.shingle import XXHASH_SEED

    out = (
        df.withColumn("_toks", tokens(F.col(text_col)))
        .withColumn(
            "_th",
            F.transform(F.col("_toks"), lambda t: F.xxhash64(t, F.lit(XXHASH_SEED))),
        )
        .withColumn(
            "shingles", word_shingles_from_hashes(F.col("_th"), F.col("_toks"), shingle_w)
        )
        .withColumn("_sig", udf(F.col("shingles"), F.col("_th")))
        .withColumn("minhash_sig", F.col("_sig.minhash_sig"))
        .withColumn("simhash", F.col("_sig.simhash"))
        .drop("_toks", "_th", "_sig")
    )
    return out
