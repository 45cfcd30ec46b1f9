"""IVF (inverted-file) approximate nearest-neighbor search over embeddings.

The scale path for similarity search, complementing the hyperplane-LSH
variant (operators/annsearch.py): a coarse k-means quantizer partitions the
corpus into ``nlist`` cells; each query probes only its ``nprobe`` nearest
cells, so the exact-cosine work drops from O(N) to O(N·nprobe/nlist) per
query. Replaces the reference's per-platform FAISS ``IndexFlatIP`` retrieval
(hybrid_search.py:357-419, src/embedding_pipeline.py:110-140) — FAISS's own
IVF index family is the same construction.

Spark shape: centroids are trained once on a driver-side sample (tiny:
nlist × dim floats), broadcast into a vectorized pandas UDF that assigns
every corpus/query vector its cell id(s); the candidate join is a plain
equi-join on cell id; exact cosine + window top-k finish the job. All
per-row math is numpy over Arrow batches.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def train_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    nlist: int = 16,
    iters: int = 10,
    seed: int = 11,
    sample_cap: int = 50_000,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic Lloyd k-means on a driver-side sample → (nlist, dim).

    The sample is capped and ORDER BY the stable id key (not a bare limit,
    which is partition-layout-dependent), so training is reproducible across
    runs and repartitionings; at 10^12-doc scale this is the standard IVF
    recipe — the quantizer sees a few 10^4 vectors, never the corpus.
    """
    rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_cap)
        .toPandas()[vec_col]
    )
    x = np.stack([np.asarray(v, dtype=np.float32) for v in rows])
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.maximum(norms, 1e-12)

    rng = np.random.Generator(np.random.PCG64(seed))
    cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)].copy()
    for _ in range(iters):
        sims = x @ cent.T  # cosine since both sides normalized
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def _assign_udf(centroids: np.ndarray, nprobe: int):
    """pandas UDF: embedding → array of the nprobe nearest cell ids."""
    from pyspark.sql.functions import pandas_udf

    cent = centroids.astype(np.float32)

    def compute(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for col in batch_iter:
            x = np.stack([np.asarray(v, dtype=np.float32) for v in col])
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            sims = x @ cent.T
            if nprobe == 1:
                ids = sims.argmax(axis=1)[:, None]
            else:
                k = min(nprobe, cent.shape[0])
                ids = np.argpartition(-sims, k - 1, axis=1)[:, :k]
            yield pd.Series([row.astype(np.int32) for row in ids])

    return pandas_udf(compute, "array<int>")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cos) — top-k by exact cosine within probed cells.

    Corpus vectors are assigned to their single nearest cell; query vectors
    probe ``nprobe`` cells. Self-matches are excluded.
    """
    if centroids is None:
        centroids = train_centroids(corpus, vec_col, nlist, id_col=id_col)
    assign1 = _assign_udf(centroids, 1)
    assignp = _assign_udf(centroids, nprobe)

    corp = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec_n"),
        F.explode(assign1(F.col(vec_col))).alias("cell"),
    )
    qry = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("vec_q"),
        F.explode(assignp(F.col(vec_col))).alias("cell"),
    )

    dot = F.aggregate(
        F.zip_with("vec_q", "vec_n", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(c), lambda v: v * v), F.lit(0.0), lambda acc, v: acc + v
        )
    )
    joined = (
        qry.join(corp, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", dot / (norm("vec_q") * norm("vec_n")))
        # a (query, neighbor) pair can collide in several probed cells
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos").alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos")
    )
