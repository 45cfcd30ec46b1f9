"""Exact pair verification — the C5 stage (replaces the cross-encoder re-rank,
hybrid_search.py:424-455).

Candidates from any path (MinHash bands, SimHash chunks, winnowing
fingerprints) are verified with *exact* set similarity before becoming edges:
Jaccard over distinct shingle-hash sets for MinHash/winnow candidates,
Hamming distance for SimHash. Everything is JVM-side (`array_intersect` /
`size` / `bit_count`) and touches only the candidate pairs — never O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# MinHash-agreement screen margin below the exact-Jaccard threshold: the
# estimator's std at k=128 is ≤ 0.045, so 0.15 ≈ 3.3σ keeps the per-pair
# screen miss probability ≈ 0.04%
PREFILTER_MARGIN = 0.15

# Margin for the compact low-bit screen (screen_agreement): its estimator
# 2·obs − 1 has twice the binomial std (≤ 0.063 at k=128, J=0.7), so the
# wider margin keeps per-pair miss probability ≈ 4e-5 (≈ 4σ) while random
# pairs (J ≈ 0 ⇒ E[obs] = 0.5) still fail the cut astronomically hard.
SCREEN_MARGIN = 0.25


def attach_pair_columns(
    pairs: DataFrame,
    docs: DataFrame,
    cols: list[str],
    key_col: str = "url",
) -> DataFrame:
    """pairs(key_l, key_r) ⋈ docs → pairs + <col>_l / <col>_r columns.

    Two hash equi-joins on the doc key; the docs side is pre-projected to the
    needed columns so the shuffle carries no dead weight.
    """
    slim = docs.select(F.col(key_col), *[F.col(c) for c in cols])
    left = slim.select(
        F.col(key_col).alias("key_l"), *[F.col(c).alias(f"{c}_l") for c in cols]
    )
    right = slim.select(
        F.col(key_col).alias("key_r"), *[F.col(c).alias(f"{c}_r") for c in cols]
    )
    return pairs.join(left, "key_l").join(right, "key_r")


def signature_agreement(sig_l: F.Column, sig_r: F.Column) -> F.Column:
    """Fraction of agreeing MinHash positions — an unbiased Jaccard estimate."""
    agree = F.aggregate(
        F.zip_with(sig_l, sig_r, lambda a, b: F.when(a == b, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return agree.cast("double") / F.size(sig_l).cast("double")


def screen_agreement(
    screens_l: list[F.Column], screens_r: list[F.Column], num_perm: int
) -> F.Column:
    """Jaccard estimate from packed low-bit screen sketches (paired scalar
    long columns, one per 64 signature slots).

    obs = fraction of matching low bits; E[obs] = (1 + J)/2 (a signature
    slot agrees w.p. J; a disagreeing slot's low bits collide w.p. 1/2), so
    the unbiased estimate is 2·obs − 1. 16 bytes per doc at k=128 — cheap
    enough to ride every bucket row as a carry column, which is what lets
    the fused pipeline screen candidates INLINE on the self-join output
    instead of through a blocking attach join (plans/pipeline.fused_edges).
    The sketch rides as PLAIN LONG columns and the estimate is a sum of
    primitive bit_count(xor) terms — whole-stage codegen, zero per-row
    allocation (an array carry + interpreted zip_with/aggregate here made
    the edge phase anti-scale: 50 s at 2 cores, 56 s at 8, measured
    n=200k).
    """
    xor_bits = None
    for a, b in zip(screens_l, screens_r):
        term = F.bit_count(a.bitwiseXOR(b))
        xor_bits = term if xor_bits is None else xor_bits + term
    obs = (F.lit(num_perm) - xor_bits).cast("double") / F.lit(float(num_perm))
    return F.lit(2.0) * obs - F.lit(1.0)


def jaccard_edges(
    pairs: DataFrame,
    docs_with_shingles: DataFrame,
    threshold: float,
    key_col: str = "url",
    shingles_col: str = "shingles",
    sig_col: str | None = None,
    prefilter_margin: float = PREFILTER_MARGIN,
) -> DataFrame:
    """Verified edges (key_l, key_r, jaccard) with exact Jaccard ≥ threshold.

    Shingle arrays are produced distinct (functions/shingle.py), so
    |intersect| / (|A| + |B| − |intersect|) is exact set Jaccard, computed
    in whole-stage codegen.

    With ``sig_col`` set, a cheap MinHash-agreement estimate screens the
    candidate pairs first and only survivors (estimate ≥ threshold − margin)
    pay for the exact set intersection. The estimator's std at k=128 is
    ≤ 0.045, so the default margin ≈ 3.3σ keeps per-pair miss probability
    ≈ 0.04% while cutting exact-verify volume by orders of magnitude on
    boilerplate-heavy corpora (the measured hot spot at 10^5+ docs).
    """
    if sig_col:
        # two-stage attach: screen on the (compact) signature columns first,
        # then join the (fat) shingle sets only for surviving pairs — the
        # shingle arrays are ~3× the signature size, and candidates typically
        # outnumber survivors by orders of magnitude, so this cuts the
        # dominant shuffle volume of the verification stage
        screened = attach_pair_columns(pairs, docs_with_shingles, [sig_col], key_col)
        est = signature_agreement(F.col(f"{sig_col}_l"), F.col(f"{sig_col}_r"))
        survivors = screened.filter(est >= threshold - prefilter_margin).select(
            "key_l", "key_r"
        )
        joined = attach_pair_columns(survivors, docs_with_shingles, [shingles_col], key_col)
    else:
        joined = attach_pair_columns(pairs, docs_with_shingles, [shingles_col], key_col)
    inter = F.size(F.array_intersect(F.col(f"{shingles_col}_l"), F.col(f"{shingles_col}_r")))
    union = (
        F.size(F.col(f"{shingles_col}_l")) + F.size(F.col(f"{shingles_col}_r")) - inter
    )
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))
    return (
        joined.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("key_l", "key_r", "jaccard")
    )


def hamming_edges(
    pairs: DataFrame,
    docs_with_simhash: DataFrame,
    max_distance: int,
    key_col: str = "url",
    simhash_col: str = "simhash",
) -> DataFrame:
    """Verified edges with exact 64-bit Hamming distance ≤ max_distance."""
    joined = attach_pair_columns(pairs, docs_with_simhash, [simhash_col], key_col)
    dist = F.bit_count(
        F.col(f"{simhash_col}_l").bitwiseXOR(F.col(f"{simhash_col}_r"))
    )
    return (
        joined.withColumn("hamming", dist)
        .filter(F.col("hamming") <= max_distance)
        .select("key_l", "key_r", "hamming")
    )
