"""64-bit SimHash + Hamming-ball bucketing — the C2 dedup path.

Second retrieval path (the reference's analog is its second,
platform-partitioned FAISS index, hybrid_search.py:150-156). Token hashing is
JVM-side; the bit-vote aggregation is one numpy pandas UDF; bucketing uses the
pigeonhole principle: for Hamming distance ≤ 3 over 64 bits split into 4
16-bit chunks, at least one chunk must match exactly, so an equi-join on
(chunk_id, chunk_value) has perfect recall for d ≤ 3. Verification is exact
``bit_count(l XOR r)`` (operators/verify.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.shingle import XXHASH_SEED

N_CHUNKS = 4
CHUNK_BITS = 64 // N_CHUNKS


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


def explode_chunks(
    df: DataFrame, simhash_col: str = "simhash", key_col: str = "url"
) -> DataFrame:
    """(key, chunk_id, chunk_val): 4 × 16-bit slices of the simhash, JVM-side."""
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col(simhash_col), j * CHUNK_BITS).bitwiseAND(
                F.lit((1 << CHUNK_BITS) - 1)
            )
            for j in range(N_CHUNKS)
        ]
    )
    return df.select(
        F.col(key_col), F.posexplode(chunks).alias("chunk_id", "chunk_val")
    )


def simhash_candidate_pairs(
    chunks_df: DataFrame,
    key_col: str = "url",
    max_bucket_size: int = 500,
) -> tuple[DataFrame, DataFrame]:
    """Chunk-equality self-join → candidate pairs; hot chunks capped like LSH
    buckets (operators/minhash.py) with a size equi-join + lineage out (see
    minhash.candidate_pairs for why not a blocking broadcast anti-join)."""
    bucket_cols = ["chunk_id", "chunk_val"]
    chunks_df = chunks_df.repartition(*[F.col(c) for c in bucket_cols])
    sizes = chunks_df.groupBy(*bucket_cols).count()
    hot = sizes.filter(F.col("count") > max_bucket_size)
    cold = (
        chunks_df.join(sizes.filter(F.col("count") <= max_bucket_size), bucket_cols)
        .drop("count")
    )
    left = cold.select(*bucket_cols, F.col(key_col).alias("key_l"))
    right = cold.select(*bucket_cols, F.col(key_col).alias("key_r"))
    pairs = (
        left.join(right, bucket_cols)
        .where(F.col("key_l") < F.col("key_r"))
        .select("key_l", "key_r")
        .distinct()
    )
    return pairs, hot
