"""Exact n-gram Jaccard pair join — the guaranteed-recall dedup baseline.

Inverted-index formulation: explode distinct n-grams, self-equi-join on the
gram, count intersections per pair, recover set sizes, filter on an
*integer-rational* threshold (``den·inter ≥ num·(|A|+|B|−inter)``) so the
result is bit-exact across engines (no float compares) and SQL-expressible
for the DuckDB oracle. Any pair with Jaccard > 0 shares ≥ 1 gram, so recall
is exactly 1 — this is the truth-producing path the probabilistic MinHash
path is measured against.

At scale the gram join inherits the same skew reality as LSH buckets
(stop-gram mega-postings); ``max_posting_size`` caps posting lists with a
broadcast anti-join, trading bounded recall loss for bounded work — at the
default (disabled) the operator is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.shingle import word_gram_strings


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    max_posting_size: int | None = None,
) -> DataFrame:
    """(id_l, id_r, n_common, sz_l, sz_r) for pairs with
    Jaccard ≥ threshold_num/threshold_den (exact, integer arithmetic)."""
    grams = docs.select(
        F.col(id_col).alias("gid"),
        F.explode(word_gram_strings(F.col(text_col), n)).alias("g"),
    )
    if max_posting_size is not None:
        sizes = grams.groupBy("g").count()
        hot = sizes.filter(F.col("count") > max_posting_size)
        grams = grams.join(F.broadcast(hot.select("g")), ["g"], "left_anti")

    set_sizes = grams.groupBy("gid").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        grams.alias("a")
        .join(grams.alias("b"), ["g"])
        .where(F.col("a.gid") < F.col("b.gid"))
        .groupBy(F.col("a.gid").alias("id_l"), F.col("b.gid").alias("id_r"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sl = set_sizes.select(F.col("gid").alias("id_l"), F.col("sz").alias("sz_l"))
    sr = set_sizes.select(F.col("gid").alias("id_r"), F.col("sz").alias("sz_r"))
    return (
        inter.join(sl, "id_l")
        .join(sr, "id_r")
        .where(
            F.lit(threshold_den) * F.col("n_common")
            >= F.lit(threshold_num) * (F.col("sz_l") + F.col("sz_r") - F.col("n_common"))
        )
        .select("id_l", "id_r", "n_common", "sz_l", "sz_r")
    )
