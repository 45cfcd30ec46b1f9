"""Winnowing fingerprints + IVF ANN — operator tests (SURVEY.md §2.11 adjacents)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from jira_duplicate_detection_turkcell__spark.operators import annsearch, ivf, winnow

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_winnow_fingerprints_deterministic_and_partition_invariant(docs):
    a = winnow.winnow_fingerprints(docs.repartition(2), "text", "doc_id")
    b = winnow.winnow_fingerprints(docs.repartition(7), "text", "doc_id")
    fa = {r["doc_id"]: sorted(r["fingerprints"]) for r in a.collect()}
    fb = {r["doc_id"]: sorted(r["fingerprints"]) for r in b.collect()}
    assert fa == fb
    assert all(len(v) >= 1 for v in fa.values())


def test_winnow_substring_guarantee(spark):
    # any shared substring of length >= k + w - 1 must share a fingerprint
    shared = "a shared run of characters long enough to guarantee a match"
    rows = [
        (0, f"left context {shared} right context"),
        (1, f"totally different prefix {shared} other suffix"),
        # deliberately no 8-char substring in common with docs 0/1
        (2, "zq wv xk jy pf gm bn dh rc lt zq wv xk jy pf gm bn dh rc lt"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow.winnow_fingerprints(df, "text", "doc_id", k=8, window=4)
    pairs = winnow.winnow_candidate_pairs(fps, "doc_id", min_shared=1)
    got = {(r["key_l"], r["key_r"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got


def test_winnow_exact_copies_share_all_fingerprints(docs):
    two = docs.limit(1).collect()[0]
    spark = docs.sparkSession
    df = spark.createDataFrame(
        [(1, two["text"]), (2, two["text"])], "doc_id long, text string"
    )
    fps = winnow.winnow_fingerprints(df, "text", "doc_id")
    vals = {r["doc_id"]: set(r["fingerprints"]) for r in fps.collect()}
    assert vals[1] == vals[2]


def test_ivf_recall_vs_bruteforce(emb):
    queries = emb.filter(F.col("vec_id") < 10)
    truth = annsearch.knn_topk(emb, queries, 5, "vec_id", "embedding")
    truth_pairs = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}
    got = ivf.ivf_topk(emb, queries, k=5, nlist=16, nprobe=8)
    got_pairs = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    recall = len(truth_pairs & got_pairs) / len(truth_pairs)
    assert recall >= 0.8, f"IVF recall {recall:.2f} too low vs brute force"


def test_ivf_centroids_deterministic(emb):
    c1 = ivf.train_centroids(emb, "embedding", nlist=8, seed=11)
    c2 = ivf.train_centroids(emb, "embedding", nlist=8, seed=11)
    assert np.allclose(c1, c2)
    assert c1.shape[0] == 8


def test_ivf_centroids_partition_invariant(emb):
    # the training sample is ORDER BY id, so repartitioning the input must
    # not change the quantizer (a bare limit() would)
    c1 = ivf.train_centroids(emb.repartition(2), "embedding", nlist=8, seed=11)
    c2 = ivf.train_centroids(emb.repartition(16), "embedding", nlist=8, seed=11)
    assert np.array_equal(c1, c2)


def test_winnow_short_docs_differing_after_byte8_not_aliased(spark):
    # short docs (no full winnowing window) hash the WHOLE text — two docs
    # identical in the first 8 bytes but differing later must not collide
    df = spark.createDataFrame(
        [(1, "abcdefgh-XX"), (2, "abcdefgh-YY"), (3, "abcdefgh-XX")],
        "doc_id long, text string",
    )
    fps = winnow.winnow_fingerprints(df, "text", "doc_id", k=64, window=64)
    vals = {r["doc_id"]: set(r["fingerprints"]) for r in fps.collect()}
    assert vals[1] != vals[2]
    assert vals[1] == vals[3]
