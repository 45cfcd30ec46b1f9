"""Incremental append dedup — the batch-incremental analog of the reference's
append-one-row + index-update path (api_server.py:139-228, and its
"full re-embed on create" consistency model at :848-877, which rewrites
everything on every write).

The new engine's consistency model is incremental by construction: signatures
are a pure function of each document alone, so an appended batch only needs

  1. signature computation for the NEW docs (never recompute the corpus),
  2. candidate pairs where at least one side is new — the new docs' bands
     joined against (existing ∪ new) bands,
  3. exact verification of those pairs,
  4. cluster repair: connected components re-run only over the union of the
     previously-verified edge list and the new edges (edge lists are tiny
     relative to the corpus — they are the only state that must be kept).

This mirrors Iceberg incremental-append processing: on a real deployment
stage 1 reads only the files of the new snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import minhash, verify
from ..operators.components import connected_components
from ..plans.pipeline import DedupConfig, extract_stage, signature_stage


def sign_new_batch(new_pages: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Extract + sign only the appended pages."""
    return signature_stage(extract_stage(new_pages), cfg)


def incremental_edges(
    existing_signed: DataFrame, new_signed: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Verified MinHash edges touching at least one new doc.

    The new side's bands are joined against the bands of (existing ∪ new);
    the existing×existing quadrant is never recomputed. The big side is
    repartitioned by band hash (same skew posture as the batch path); the
    new side is typically small enough that AQE broadcasts it.
    """
    all_signed = existing_signed.select(*new_signed.columns).unionByName(new_signed)
    bands_all = minhash.explode_bands(
        all_signed, "minhash_sig", "url", cfg.bands, cfg.rows
    ).repartition(F.col("band_hash"))
    bands_new = minhash.explode_bands(
        new_signed, "minhash_sig", "url", cfg.bands, cfg.rows
    )

    sizes = bands_all.groupBy("band_id", "band_hash").count()
    hot = sizes.filter(F.col("count") > cfg.minhash_bucket_cap)
    cold_all = bands_all.join(
        F.broadcast(hot.select("band_id", "band_hash")), ["band_id", "band_hash"], "left_anti"
    )

    cand = (
        bands_new.select("band_id", "band_hash", F.col("url").alias("key_l"))
        .join(
            cold_all.select("band_id", "band_hash", F.col("url").alias("key_r")),
            ["band_id", "band_hash"],
        )
        .where(F.col("key_l") != F.col("key_r"))
        .select(
            F.least("key_l", "key_r").alias("key_l"),
            F.greatest("key_l", "key_r").alias("key_r"),
        )
        .distinct()
    )
    return verify.jaccard_edges(
        cand, all_signed, cfg.jaccard_threshold, "url", "shingles"
    )


def apply_append(
    existing_signed: DataFrame,
    existing_edges: DataFrame,
    new_pages: DataFrame,
    cfg: DedupConfig,
) -> dict[str, DataFrame]:
    """One append step → updated {'signed', 'edges', 'clusters'}."""
    new_signed = sign_new_batch(new_pages, cfg).localCheckpoint()
    new_edges = (
        incremental_edges(existing_signed, new_signed, cfg)
        .select("key_l", "key_r")
        .localCheckpoint()
    )
    signed = existing_signed.select(*new_signed.columns).unionByName(new_signed)
    edges = existing_edges.select("key_l", "key_r").unionByName(new_edges).distinct()
    clusters = connected_components(edges, signed.select("url"), "url")
    return {"signed": signed, "edges": edges, "clusters": clusters}
