"""Distributed connected components — the C3 clustering stage.

The reference's notion of a duplicate group is implicit (top-k search results,
"replace duplicate" row deletion — api_server.py:785-813); the new engine
makes it explicit: verified pairs are edges, clusters are connected
components, every url gets a cluster id.

Algorithm: iterative min-label propagation (hash joins only, no RDDs):
each node's label becomes the min of its own and all neighbors' labels;
iterate to fixpoint. Per-iteration `localCheckpoint` truncates lineage so the
plan doesn't grow exponentially (SURVEY.md §4). Near-duplicate components are
small and shallow (diameter ≤ a handful), so the fixpoint is reached in a few
iterations; the iteration cap guards pathological chains — for adversarial
long-chain graphs the large-star/small-star variant (Kiveris et al., "CC in
MapReduce and Beyond") halves diameter per round and would slot in behind the
same interface.

Labels are the node keys themselves (min url = canonical representative), so
the result is deterministic under any partitioning and collision-free at any
scale — a 64-bit hash label would start colliding near 10^9-10^10 clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    key_col: str = "url",
    max_iter: int = 25,
    nodes_unique: bool = False,
    edges_unique: bool = False,
) -> DataFrame:
    """edges(key_l, key_r) + nodes(key) → (key, cluster_id) for every node.

    ``cluster_id`` is the lexicographic-min member key of the component;
    singletons get their own key. Pass ``nodes_unique=True`` when the caller
    guarantees one row per key (e.g. the signature table) to skip a
    defensive distinct shuffle. Pass ``edges_unique=True`` when the edge
    list is distinct with key_l < key_r — then the two-direction union is
    duplicate-free by construction and the symmetrize distinct (a full
    shuffle) is skipped.
    """
    sym = edges.select(F.col("key_l").alias("src"), F.col("key_r").alias("dst")).union(
        edges.select(F.col("key_r").alias("src"), F.col("key_l").alias("dst"))
    )
    if not edges_unique:
        sym = sym.distinct()
    # materialize once: the edge list is re-joined every iteration and must
    # not drag the whole upstream pipeline lineage along with it — AND the
    # checkpointed RDD keeps a stable identity, so each round's join reuses
    # the prior round's shuffle files as skipped stages (measured: a lazy
    # sym over a cached parent re-shuffles every hop and runs ~2× slower)
    sym = sym.localCheckpoint()
    # Only nodes with at least one edge participate in propagation; the
    # (overwhelming at web scale) singleton majority bypasses the loop and is
    # attached at the end with coalesce.
    # initial labels stay LAZY: they derive from the already-checkpointed
    # edge list, so round 1's materializing action computes them in-plan —
    # one fewer blocking driver job than eagerly checkpointing them here
    labels = (
        sym.select(F.col("src").alias("node")).distinct().withColumn("label", F.col("node"))
    )

    def propagate(lbls):
        neighbor_min = (
            sym.join(lbls, sym.dst == lbls.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        return (
            lbls.join(neighbor_min, lbls.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
        )

    # Each materialization runs TWO propagation hops (so label information
    # travels 2^k edges after k rounds on path graphs would need large-star;
    # for the shallow near-dup components here it simply halves the number
    # of driver round-trips), and the convergence count doubles as the
    # materializing action — one Spark job per round instead of four.
    for _ in range(max_iter):
        stepped = propagate(propagate(labels).drop("changed"))
        new_labels = stepped.localCheckpoint(eager=False)
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break

    assigned = labels.select(
        F.col("node").alias(key_col), F.col("label").alias("cluster_id")
    )
    base = nodes.select(key_col)
    if not nodes_unique:
        base = base.distinct()
    return (
        base
        .join(assigned, key_col, "left")
        .select(
            key_col,
            F.coalesce(F.col("cluster_id"), F.col(key_col)).alias("cluster_id"),
        )
    )
