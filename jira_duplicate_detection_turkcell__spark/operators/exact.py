"""Exact deduplication — hash-groupBy (the degenerate but essential path).

Exact copies are found with a content-hash groupBy: one shuffle on the hash,
map-side partial aggregation, no pairwise work at all. At 10^12 documents this
is the first pass that removes the bulk of duplication before the
near-duplicate paths run on survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_hash(text) -> F.Column:
    return F.md5(F.col(text).cast("binary") if isinstance(text, str) else text.cast("binary"))


def exact_dup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(text_hash, keep_id, n_docs): one row per distinct content; keep_id is
    the min id (the canonical survivor), n_docs the multiplicity."""
    return (
        docs.groupBy(content_hash(text_col).alias("text_hash"))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def drop_exact_dups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep only the min-id representative of each identical-content group."""
    keep = exact_dup_groups(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return docs.join(keep, id_col, "left_semi")
