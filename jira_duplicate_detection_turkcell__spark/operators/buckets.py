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


def _hot_bucket_sizes(
    items: DataFrame, bucket_cols: Sequence[str], key_col: str, cap: int
) -> DataFrame:
    """(bucket_cols…, _bsz) for buckets estimated larger than ``cap``.

    Hot-bucket detection runs on a deterministic 1-in-size_sample member
    sample: a bucket only matters here once it exceeds ``cap`` members, at
    which point it has ≥ cap/size_sample expected sampled members — the
    full-table groupBy it replaces was a measured ~40 task-seconds per
    pipeline run at n=100k. Sampling affects ONLY the work-spreading
    decision (which buckets get salted, and the salt count estimate),
    never which pairs are emitted: borderline buckets misclassified either
    way are still paired exactly, just with one salt group more or fewer.
    """
    bcols = list(bucket_cols)
    size_sample = 8 if cap >= 64 else 1
    sampled = items
    if size_sample > 1:
        sampled = items.where(
            F.pmod(F.xxhash64(F.col(key_col), F.lit(17)), F.lit(size_sample)) == 0
        )
    sizes = sampled.groupBy(*bcols).agg(
        (F.count(F.lit(1)) * size_sample).alias("_bsz")
    )
    return sizes.filter(F.col("_bsz") > cap)


def _attach_salt(
    items: DataFrame,
    hot: DataFrame,
    bucket_cols: Sequence[str],
    key_col: str,
    cap: int,
    max_salt: int,
    s_col: str,
    g_col: str,
) -> DataFrame:
    """+ ``s_col`` (salt count, 1 for cold buckets) and ``g_col`` (this
    member's hash group in 0..s-1)."""
    return (
        items.join(F.broadcast(hot), list(bucket_cols), "left")
        .withColumn(
            s_col,
            F.least(
                F.coalesce(
                    F.ceil(F.col("_bsz") / F.lit(cap)).cast("int"), F.lit(1)
                ),
                F.lit(max_salt),
            ),
        )
        .withColumn(g_col, F.pmod(F.xxhash64(F.col(key_col)), F.col(s_col)).cast("int"))
        .drop("_bsz")
    )


def _pair_select(
    joined: DataFrame, carry_cols: Sequence[str], out_bucket_cols: Sequence[str]
) -> DataFrame:
    """Normalize to (out_bucket_cols…, key_l < key_r, carry _l/_r pairs)."""
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
    return joined.select(*out)


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
    hot = _hot_bucket_sizes(items, bcols, key_col, cap)
    tagged = _attach_salt(items, hot, bcols, key_col, cap, max_salt, "_s", "_g")

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
    pairs = _pair_select(joined, carry_cols, out_bucket_cols)
    return pairs, hot.select(*bcols, F.col("_bsz").alias("est_size"))


def salted_bipartite_pairs(
    new_items: DataFrame,
    all_items: DataFrame,
    bucket_cols: Sequence[str],
    key_col: str,
    cap: int,
    max_salt: int = 64,
    carry_cols: Sequence[str] = (),
    out_bucket_cols: Sequence[str] = (),
) -> tuple[DataFrame, DataFrame]:
    """new × all bucket join with BOTH sides salted — the incremental-append
    analog of ``salted_bucket_pairs``.

    Every (new, all) pair sharing a bucket is emitted exactly once per
    bucket over the FULL rectangle of salt cells (no diagonal filter): the
    all side is split into ``s_all = ceil(m_all/cap)`` hash groups and the
    new side into ``s_new = ceil(m_new/cap)`` groups; a new member of group
    i is exploded over cells (i, j) for every all-group j, an all member of
    group j over cells (i, j) for every new-group i, so the pair (n, a)
    meets only in cell (g(n), g(a)). Per-cell work is bounded by ~cap² at
    any skew — a hot boilerplate band shared by the append batch AND the
    corpus spreads over s_new·s_all independent shuffle cells instead of
    one mega-task, with zero recall loss (round 2 anti-joined hot buckets
    away on this path). Cold buckets take s = 1 on both sides and
    degenerate to the plain bipartite join — one code path.

    ``new ⊆ all`` is allowed: self-rows are dropped, and a new×new pair
    (emitted from both orientations) normalizes to one (key_l < key_r) row
    per orientation — callers ``.distinct()`` exactly as with the
    intra-bucket generator. Returns (pairs, hot_buckets) where hot lists
    the all-side buckets that ran salted.
    """
    bcols = list(bucket_cols)
    hot_all = _hot_bucket_sizes(all_items, bcols, key_col, cap)
    hot_new = _hot_bucket_sizes(new_items, bcols, key_col, cap)
    # each side needs its OWN group (from its own size) and the OTHER
    # side's salt count (its explode range)
    new_tagged = _attach_salt(
        _attach_salt(new_items, hot_new, bcols, key_col, cap, max_salt, "_sn", "_i"),
        hot_all, bcols, key_col, cap, max_salt, "_sa", "_ga",
    ).drop("_ga")
    all_tagged = _attach_salt(
        _attach_salt(all_items, hot_all, bcols, key_col, cap, max_salt, "_sa", "_j"),
        hot_new, bcols, key_col, cap, max_salt, "_sn", "_gn",
    ).drop("_gn")

    left = new_tagged.select(
        *bcols,
        F.col("_i").alias("_ci"),
        F.explode(F.sequence(F.lit(0), F.col("_sa") - 1)).alias("_cj"),
        F.col(key_col).alias("key_l"),
        *[F.col(c).alias(f"_l_{c}") for c in carry_cols],
    )
    right = all_tagged.select(
        *bcols,
        F.explode(F.sequence(F.lit(0), F.col("_sn") - 1)).alias("_ci"),
        F.col("_j").alias("_cj"),
        F.col(key_col).alias("key_r"),
        *[F.col(c).alias(f"_r_{c}") for c in carry_cols],
    )
    joined = left.join(right, bcols + ["_ci", "_cj"]).where(
        F.col("key_l") != F.col("key_r")
    )
    pairs = _pair_select(joined, carry_cols, out_bucket_cols)
    return pairs, hot_all.select(*bcols, F.col("_bsz").alias("est_size"))
