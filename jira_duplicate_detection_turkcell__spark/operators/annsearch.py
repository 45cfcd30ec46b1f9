"""Similarity search over embedding columns (array<float>).

The reference's FAISS ``IndexFlatIP`` top-k (hybrid_search.py:357-419) is an
exact brute-force inner-product scan; the distributed equivalents here:

* ``knn_topk`` — exact brute-force cosine top-k: broadcast the (small) query
  set against the corpus, JVM-side ``zip_with``/``aggregate`` dot product,
  per-query ``row_number`` window. This is the correctness baseline and is
  exactly what FAISS IndexFlat computes.
* ``cosine_pairs`` — exact all-pairs cosine ≥ threshold (self-join; small-n
  verification baseline).
* ``hyperplane_lsh_pairs`` — the scale path: random-hyperplane sign sketches
  (numpy pandas UDF, fixed seed), multi-table banded bucket join, exact
  cosine verification on candidates only. Same candidates→verify shape as the
  MinHash path, so skew handling and caps carry over.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, in double."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def knn_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_rows: int = 10_000,
    assume_small: bool = False,
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus (self excluded).

    The query side is broadcast — it is small by contract (the reference caps
    top_k at 50 and serves one query at a time; here the whole query batch
    rides the broadcast, and the corpus never shuffles). ``max_query_rows``
    enforces that contract (mirroring ``cosine_pairs.max_rows``): beyond it
    the broadcast × corpus scan is O(Q·N) work behind one executor-memory
    bound, and the IVF path is the right tool. The check costs one bounded
    count job per call; a caller that already knows the query side is tiny
    (e.g. it just built it with ``.limit(k)``) passes ``assume_small=True``
    to skip it — the broadcast itself still fails loudly past the driver's
    broadcast size limits, so the escape hatch trades a precise error
    message for one fewer Spark job, never silent wrong answers.
    """
    from pyspark.sql.window import Window

    # limit(cap+1) stops the count early; ValueError (not assert) so the
    # guard survives python -O
    if not assume_small and queries.limit(max_query_rows + 1).count() > max_query_rows:
        raise ValueError(
            f"knn_topk broadcasts the query side (n_queries > "
            f"max_query_rows={max_query_rows}); use operators/ivf.ivf_topk "
            f"for large query batches"
        )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    scored = (
        embeddings.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .withColumn("cos", cosine_expr(F.col("query_vec"), F.col(vec_col)))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rn")
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 2_000_000,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold — the *test-scale ground-truth
    generator* (the scale paths are hyperplane_lsh_pairs / operators/ivf.py).

    Distributed block matmul: the full normalized matrix (N × d) is shipped
    once per executor via ``sparkContext.broadcast`` (torrent blocks — NOT
    closure-captured per task); each partition multiplies its row block
    against it with one BLAS call and emits thresholded (id_l < id_r)
    pairs. Identical output to the naive theta-join, ~10-50× faster than
    per-pair interpreted array expressions. A row-count guard refuses
    inputs beyond ``max_rows`` — at that point the broadcast matrix is the
    driver/executor memory bound and the ANN paths are the right tool.
    Ids keep their input type (no int64 cast); empty input yields an empty
    result with the right schema.
    """
    from typing import Iterator

    import pandas as pd

    id_type = embeddings.schema[id_col].dataType.simpleString()
    out_schema = f"id_l {id_type}, id_r {id_type}"

    n = embeddings.limit(max_rows + 1).count()
    if n == 0:
        return embeddings.sparkSession.createDataFrame([], out_schema)
    if n > max_rows:
        raise ValueError(
            f"cosine_pairs is the test-scale ground-truth generator "
            f"(n > max_rows={max_rows}); use hyperplane_lsh_pairs or ivf"
        )
    pdf_all = embeddings.select(id_col, vec_col).toPandas()
    all_ids = pdf_all[id_col].to_numpy()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf_all[vec_col]])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    bc = embeddings.sparkSession.sparkContext.broadcast((all_ids, mat))

    def compute(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ref_ids, ref = bc.value
        for pdf in batch_iter:
            ids = pdf[id_col].to_numpy()
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
            sims = x @ ref.T
            hit = (sims >= threshold) & (ids[:, None] < ref_ids[None, :])
            li, ri = np.nonzero(hit)
            yield pd.DataFrame({"id_l": ids[li], "id_r": ref_ids[ri]})

    return embeddings.select(id_col, vec_col).mapInPandas(compute, out_schema)


def _hyperplanes(n_tables: int, bits: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_tables * bits, dim)).astype(np.float32)


def sign_sketch_udf(n_tables: int = 8, bits: int = 16, dim: int = 64, seed: int = 11):
    """pandas UDF: embedding → array of n_tables bucket codes (long each).

    One matmul per Arrow batch: (batch, dim) @ (dim, n_tables*bits) → signs →
    per-table packed integer bucket codes.
    """
    from pyspark.sql.functions import pandas_udf

    planes = _hyperplanes(n_tables, bits, dim, seed)  # (T*B, dim)
    weights = (1 << np.arange(bits, dtype=np.uint64))

    def compute(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for col in batch_iter:
            mat = np.vstack([np.asarray(v, dtype=np.float32) for v in col])
            signs = (mat @ planes.T) > 0  # (batch, T*B)
            codes = signs.reshape(len(col), n_tables, bits).astype(np.uint64)
            packed = (codes * weights).sum(axis=2).astype(np.int64)  # (batch, T)
            yield pd.Series(list(packed))

    return pandas_udf(compute, "array<long>")


def hyperplane_lsh_pairs(
    embeddings: DataFrame,
    threshold: float,
    n_tables: int = 8,
    bits: int = 16,
    dim: int = 64,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 500,
) -> DataFrame:
    """ANN pair search: hyperplane sketch buckets → salted join → exact verify.

    Hot buckets (a dense embedding mass — near-identical spam pages — lands
    exactly where the duplicates are) are *salted* into bounded cells by the
    shared generator (operators/buckets.py), never dropped: full candidate
    recall at any skew, per-task work bounded by ``max_bucket_size``. Round 2
    anti-joined hot buckets away, silently losing every pair whose only
    collision was hot.
    """
    sketch = sign_sketch_udf(n_tables, bits, dim, seed)
    from .buckets import salted_bucket_pairs

    sk = embeddings.select(
        F.col(id_col), F.col(vec_col), sketch(F.col(vec_col)).alias("codes")
    )
    buckets = sk.select(
        F.col(id_col), F.posexplode(F.col("codes")).alias("table_id", "code")
    )
    pairs, _hot = salted_bucket_pairs(
        buckets, ["table_id", "code"], id_col, max_bucket_size
    )
    cand = pairs.select(
        F.col("key_l").alias("id_l"), F.col("key_r").alias("id_r")
    ).distinct()
    left = embeddings.select(F.col(id_col).alias("id_l"), F.col(vec_col).alias("v_l"))
    right = embeddings.select(F.col(id_col).alias("id_r"), F.col(vec_col).alias("v_r"))
    return (
        cand.join(left, "id_l")
        .join(right, "id_r")
        .withColumn("cos", cosine_expr(F.col("v_l"), F.col("v_r")))
        .where(F.col("cos") >= threshold)
        .select("id_l", "id_r")
    )
