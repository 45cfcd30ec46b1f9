"""Salted intra-bucket pair generation — shared by every candidate path.

All four candidate generators (MinHash bands, SimHash chunk-pair keys,
winnowing fingerprints, suffix fingerprints) reduce to the same shape:
"emit every unordered pair of keys that share a bucket". The naive bucket
self-join explodes on hot buckets (boilerplate: one band value shared by
10^4+ pages ⇒ O(m²) pairs in ONE task). Round 1 capped-and-dropped hot
buckets, silently losing every true pair whose only collision was a hot
bucket. This module replaces that with the north rule's named remedy —
**explicit salting** — so per-task work stays bounded with zero recall loss:

Members of a bucket of size m > cap are salted into ``s = ceil(m/cap)``
groups by a hash of the key. The triangular grid of group cells (i ≤ j) is
covered by exploding each member over its row of cells on the *left* side
(cells ``(g, j) for j ≥ g``) and its column on the *right* side (cells
``(i, g) for i ≤ g``); the join key is (bucket, i, j), so each cell lands in
its own shuffle partition ⇒ a hot bucket's O(m²) pair work is spread over
s·(s+1)/2 independent cells of ≤ ~cap² pairs each, instead of one mega-task.
Cold buckets (m ≤ cap) take s = 1 and degenerate to the plain self-join —
one code path, no union of plans.

Every unordered pair is emitted exactly once per bucket: for groups
p = g(a) ≤ q = g(b) the pair meets only in cell (p, q) (diagonal cells
additionally filter key_l < key_r to drop self/mirror rows). Downstream
callers `.distinct()` across buckets (LSH bands) or `groupBy(pair).count()`
(winnow shared-fingerprint counting) exactly as with the unsalted join.

Scale posture: the hot-bucket size table is tiny (≤ #buckets/cap entries)
and is broadcast to attach the salt count; member replication is bounded by
s + 1 ≤ max_salt + 1 rows per hot-bucket member. ``max_salt`` caps the
replication factor; beyond cap·max_salt members a cell exceeds cap rows but
work remains spread over max_salt² cells (graceful degradation, never a
drop). Lineage: the salted-bucket table is returned so operators can log
which buckets ran salted.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_bucket_pairs(
    items: DataFrame,
    bucket_cols: Sequence[str],
    key_col: str,
    cap: int,
    max_salt: int = 64,
    carry_cols: Sequence[str] = (),
    out_bucket_cols: Sequence[str] = (),
) -> tuple[DataFrame, DataFrame]:
    """items(bucket_cols…, key, carry…) → (pairs, hot_buckets).

    ``pairs`` has (key_l, key_r) with key_l < key_r — one row per
    (bucket, pair) co-occurrence — plus ``<c>_l``/``<c>_r`` for each carry
    column (side-consistent after the least/greatest normalization, so a
    carried signature can be verified inline without a re-join), plus any
    ``out_bucket_cols`` passed through (e.g. the bucket *kind* in a fused
    multi-path candidate table). ``hot_buckets`` lists the buckets that ran
    salted (bucket_cols + count).
    """
    bcols = list(bucket_cols)
    # Hot-bucket detection runs on a deterministic 1-in-size_sample member
    # sample: a bucket only matters here once it exceeds ``cap`` members, at
    # which point it has ≥ cap/size_sample expected sampled members — the
    # full-table groupBy it replaces was a measured ~40 task-seconds per
    # pipeline run at n=100k. Sampling affects ONLY the work-spreading
    # decision (which buckets get salted, and the salt count estimate),
    # never which pairs are emitted: borderline buckets misclassified either
    # way are still paired exactly, just with one salt group more or fewer.
    size_sample = 8 if cap >= 64 else 1
    sampled = items
    if size_sample > 1:
        sampled = items.where(
            F.pmod(F.xxhash64(F.col(key_col), F.lit(17)), F.lit(size_sample)) == 0
        )
    sizes = sampled.groupBy(*bcols).agg(
        (F.count(F.lit(1)) * size_sample).alias("_bsz")
    )
    hot = sizes.filter(F.col("_bsz") > cap)

    tagged = (
        items.join(F.broadcast(hot), bcols, "left")
        .withColumn(
            "_s",
            F.least(
                F.coalesce(
                    F.ceil(F.col("_bsz") / F.lit(cap)).cast("int"), F.lit(1)
                ),
                F.lit(max_salt),
            ),
        )
        .withColumn("_g", F.pmod(F.xxhash64(F.col(key_col)), F.col("_s")).cast("int"))
        .drop("_bsz")
    )

    left = tagged.select(
        *bcols,
        F.col("_g").alias("_ci"),
        F.explode(F.sequence(F.col("_g"), F.col("_s") - 1)).alias("_cj"),
        F.col(key_col).alias("key_l"),
        *[F.col(c).alias(f"_l_{c}") for c in carry_cols],
    )
    right = tagged.select(
        *bcols,
        F.explode(F.sequence(F.lit(0), F.col("_g"))).alias("_ci"),
        F.col("_g").alias("_cj"),
        F.col(key_col).alias("key_r"),
        *[F.col(c).alias(f"_r_{c}") for c in carry_cols],
    )
    joined = left.join(right, bcols + ["_ci", "_cj"]).where(
        (F.col("_ci") != F.col("_cj")) | (F.col("key_l") < F.col("key_r"))
    )

    keep = F.col("key_l") < F.col("key_r")
    out = [F.col(c) for c in out_bucket_cols] + [
        F.least("key_l", "key_r").alias("key_l"),
        F.greatest("key_l", "key_r").alias("key_r"),
    ]
    for c in carry_cols:
        out.append(
            F.when(keep, F.col(f"_l_{c}")).otherwise(F.col(f"_r_{c}")).alias(f"{c}_l")
        )
        out.append(
            F.when(keep, F.col(f"_r_{c}")).otherwise(F.col(f"_l_{c}")).alias(f"{c}_r")
        )
    pairs = joined.select(*out)
    return pairs, hot.select(*bcols, F.col("_bsz").alias("count"))
