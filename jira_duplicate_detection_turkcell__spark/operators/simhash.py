"""64-bit SimHash + Hamming-ball bucketing — the C2 dedup path.

Second retrieval path (the reference's analog is its second,
platform-partitioned FAISS index, hybrid_search.py:150-156). Token hashing is
JVM-side; the bit-vote aggregation is one numpy pandas UDF; bucketing uses
the pigeonhole principle over **chunk pairs**: the 64 bits are split into 5
chunks (13+13+13+13+12 bits); d ≤ 3 bit errors can touch at most 3 chunks,
leaving ≥ 2 chunks clean, so every pair at Hamming distance ≤ 3 shares at
least one of the C(5,2) = 10 *chunk-pair* keys — an equi-join on
(pair_id, concat of the two chunk values) has perfect recall for d ≤ 3.
Verification is exact ``bit_count(l XOR r)`` (operators/verify.py).

Why pairs, not single chunks: round 1 used 4 single 16-bit chunks, whose
2^16 key space saturates — at ≥10^7 docs *every* bucket exceeds any cap
(silent recall collapse under capping; mega-buckets under salting). A
chunk-pair key carries 25-26 bits ⇒ 2^25+ distinct values per pair_id, so
expected bucket size stays O(N/2^25) and only true near-duplicate masses
form hot buckets (which the salted join then spreads). Cost: 10 bucket rows
per doc instead of 4.
"""

from __future__ import annotations

from itertools import combinations
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.shingle import XXHASH_SEED

# 5 chunks ⇒ any d≤3 pair has ≥2 clean chunks ⇒ shares a chunk-pair key
_CHUNK_BITS = (13, 13, 13, 13, 12)
_CHUNK_OFFSETS = tuple(sum(_CHUNK_BITS[:i]) for i in range(len(_CHUNK_BITS)))
CHUNK_PAIRS = tuple(combinations(range(len(_CHUNK_BITS)), 2))
N_CHUNKS = len(_CHUNK_BITS)


def token_hashes(text: Column) -> Column:
    """Non-distinct xxhash64 per whitespace token (tf preserved)."""
    return F.transform(
        F.split(F.trim(text), r"\s+"), lambda t: F.xxhash64(t, F.lit(XXHASH_SEED))
    )


def simhash_udf():
    """pandas UDF: array<long> token hashes → 64-bit simhash (long).

    Batch-vectorized: all tokens flattened to one uint64 vector; per-bit ±1
    votes summed per row with ``np.add.reduceat``; sign → bits → packed long.
    """
    from pyspark.sql.functions import pandas_udf

    bit_idx = np.arange(64, dtype=np.uint64)

    def compute(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for col in batch_iter:
            lengths = col.map(len).to_numpy(dtype=np.int64)
            nonempty = lengths > 0
            flat = np.concatenate(
                [np.asarray(v, dtype=np.int64) for v in col if len(v)]
                or [np.array([], dtype=np.int64)]
            ).view(np.uint64)
            out = np.zeros(len(col), dtype=np.int64)
            if flat.size:
                # (M, 64) ±1 votes; int16 keeps memory modest per Arrow batch
                votes = (((flat[:, None] >> bit_idx) & np.uint64(1)).astype(np.int16) * 2 - 1)
                offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
                np.cumsum(lengths[nonempty][:-1], out=offsets[1:])
                sums = np.add.reduceat(votes.astype(np.int32), offsets, axis=0)
                bits = (sums > 0).astype(np.uint64)
                packed = (bits << bit_idx).sum(axis=1, dtype=np.uint64)
                out[nonempty] = packed.view(np.int64)  # reinterpret: bit 63 may be set
            yield pd.Series(out)

    return pandas_udf(compute, "long")


def add_simhash(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    udf = simhash_udf()
    return df.withColumn(out_col, udf(token_hashes(F.col(text_col))))


def add_simhash_kernel(
    df: DataFrame, text_col: str = "text", key_col: str = "url", out_col: str = "simhash"
) -> DataFrame:
    """text → 64-bit simhash in ONE numpy mapInPandas pass.

    Same construction as ``add_simhash`` but with tokenization + token
    hashing in numpy/pandas (``pd.util.hash_array``) instead of the JVM
    ``transform(split(...))`` higher-order expressions — those interpreted
    array expressions were the round-1 profiled GC hotspot and keep the
    simhash driver query the slowest headline entry. Hash family differs
    from ``add_simhash`` (pandas hash vs xxhash64); both are valid simhash
    token hashes — exactness is pinned by the brute-force Hamming pytest
    over whichever values are in play.
    """
    from itertools import chain

    from .signatures import _simhash_from_flat

    bit_idx = np.arange(64, dtype=np.uint64)
    key_t = df.schema[key_col].dataType.simpleString()

    def compute(batch_iter):
        for pdf in batch_iter:
            texts = pdf[text_col].astype(object).fillna("")
            n = len(pdf)
            if n == 0:
                continue
            tok_lists = texts.str.split()
            lengths = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
            flat_tokens = np.array(list(chain.from_iterable(tok_lists)), dtype=object)
            th = (
                pd.util.hash_array(flat_tokens, categorize=True).astype(
                    np.uint64, copy=False
                )
                if flat_tokens.size
                else np.empty(0, dtype=np.uint64)
            )
            sim = _simhash_from_flat(th, lengths, bit_idx)
            yield pd.DataFrame({key_col: pdf[key_col].to_numpy(), out_col: sim})

    return df.select(key_col, text_col).mapInPandas(
        compute, f"{key_col} {key_t}, {out_col} long"
    )


def _chunk_expr(simhash_col: str, j: int) -> Column:
    return F.shiftrightunsigned(F.col(simhash_col), _CHUNK_OFFSETS[j]).bitwiseAND(
        F.lit((1 << _CHUNK_BITS[j]) - 1)
    )


def chunk_pair_keys(simhash_col: str = "simhash") -> Column:
    """array<long> of the 10 chunk-pair keys (chunk_i ≪ bits_j | chunk_j)."""
    return F.array(
        *[
            F.shiftleft(_chunk_expr(simhash_col, i), _CHUNK_BITS[j]).bitwiseOR(
                _chunk_expr(simhash_col, j)
            )
            for i, j in CHUNK_PAIRS
        ]
    )


def explode_chunks(
    df: DataFrame, simhash_col: str = "simhash", key_col: str = "url"
) -> DataFrame:
    """(key, chunk_id, chunk_val): the 10 chunk-pair keys per doc, JVM-side.

    ``chunk_id`` indexes CHUNK_PAIRS; ``chunk_val`` packs the two chunk
    values (25-26 bits). Any two simhashes at Hamming distance ≤ 3 share at
    least one (chunk_id, chunk_val) row.
    """
    return df.select(
        F.col(key_col),
        F.posexplode(chunk_pair_keys(simhash_col)).alias("chunk_id", "chunk_val"),
    )


def simhash_candidate_pairs(
    chunks_df: DataFrame,
    key_col: str = "url",
    max_bucket_size: int = 500,
) -> tuple[DataFrame, DataFrame]:
    """Chunk-pair-key self-join → candidate pairs; hot buckets are salted
    (operators/buckets.py), never dropped — full d ≤ 3 recall at any corpus
    size, bounded per-task work."""
    from .buckets import salted_bucket_pairs

    pairs, hot = salted_bucket_pairs(
        chunks_df, ["chunk_id", "chunk_val"], key_col, max_bucket_size
    )
    return pairs.distinct(), hot
