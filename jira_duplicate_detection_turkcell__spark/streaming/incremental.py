"""Incremental append dedup — the batch-incremental analog of the reference's
append-one-row + index-update path (api_server.py:139-228, and its
"full re-embed on create" consistency model at :848-877, which rewrites
everything on every write — append ≡ rebuild is the reference's own
consistency contract, and this module keeps it while touching only the new
rows).

The new engine's consistency model is incremental by construction: signatures
are a pure function of each document alone, so an appended batch only needs

  1. signature computation for the NEW docs (never recompute the corpus),
  2. candidate pairs where at least one side is new — the new docs' bucket
     rows (LSH bands AND SimHash chunk-pair keys, the same fused table the
     batch path builds) joined against the bucket rows of (existing ∪ new),
  3. exact verification of those pairs (inline Hamming for simhash rows,
     inline screen + exact shingle Jaccard for minhash rows — identical to
     plans/pipeline.verify_fused_pairs, which it calls),
  4. cluster repair: connected components re-run only over the union of the
     previously-verified edge list and the new edges (edge lists are tiny
     relative to the corpus — they are the only state that must be kept).

Every edge kind the batch pipeline has enabled is maintained here, so
append == full-rerun holds with simhash on (round 2 only maintained the
MinHash kind, silently diverging once simhash edges existed). The one
exception is the substring path: its state (document texts / fingerprint
postings) is not part of the signature table, so ``enable_substring`` is
rejected at the API boundary rather than silently dropped.

Hot buckets on this path are SALTED via the bipartite generator
(operators/buckets.salted_bipartite_pairs): both sides split into hash
groups, cells over the full rectangle — bounded per-task work, zero recall
loss (round 2 anti-joined hot buckets away here).

This mirrors Iceberg incremental-append processing: on a real deployment
stage 1 reads only the files of the new snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.buckets import salted_bipartite_pairs
from ..operators.components import connected_components
from ..plans.pipeline import (
    DedupConfig,
    extract_stage,
    fused_bucket_table,
    signature_stage,
    verify_fused_pairs,
)


def sign_new_batch(new_pages: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Extract + sign only the appended pages."""
    return signature_stage(extract_stage(new_pages), cfg)


def incremental_edges(
    existing_signed: DataFrame, new_signed: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Verified edges touching at least one new doc, ALL enabled kinds.

    The new side's bucket rows (bands + simhash chunk-pair keys) are joined
    against the bucket rows of (existing ∪ new); the existing×existing
    quadrant is never recomputed. Skew posture matches the batch path: hot
    buckets are salted into bounded bipartite cells, never dropped.
    """
    if cfg.enable_substring:
        raise ValueError(
            "incremental append does not maintain the substring edge kind "
            "(its state is the document texts, not the signature table); "
            "disable enable_substring or run a batch rebuild"
        )
    all_signed = existing_signed.select(*new_signed.columns).unionByName(new_signed)
    buckets_all, carry = fused_bucket_table(all_signed, cfg)
    buckets_new, _ = fused_bucket_table(new_signed, cfg)
    pairs, _hot = salted_bipartite_pairs(
        buckets_new,
        buckets_all,
        ["bkind", "bid", "bkey"],
        "nid",
        cfg.minhash_bucket_cap,
        carry_cols=carry,
        out_bucket_cols=["bkind"],
    )
    return verify_fused_pairs(pairs, all_signed, cfg)


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
