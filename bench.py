"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Two workloads:
  (default)            — headline driver queries over the sf-dir parquet tables
                         plus the synthetic-pages dedup pipeline.
  --scaling-workload   — only the synthetic-pages dedup pipeline at a fixed doc
                         count (deterministic input regardless of sf), used by
                         bench/run_scaling.py to evidence N→4N core scaling.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

HEADLINE = [
    "exact_dup_groups",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_hamming_pairs",
    "substring_pairs",
    "dedup_clusters",
    "knn_cosine",
    "cosine_near_dup_pairs",
    "token_stats",
    "langid",
    "agg_lineitem",
    "star_join",
    "hourly_windows",
    "sessionize",
]

PAGES_N = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "20000"))


# The scaling comparison must hold the *input* fixed across parallelism
# levels: a real cluster reads the same partitioned table whether it has N
# or 4N executors. So the pages corpus is materialized to parquet once
# (untimed — corpus synthesis is bench scaffolding, not engine work; the
# north-rule input is an Iceberg/parquet table) with a constant partition
# count, and only the table→clusters pipeline is timed.
PAGES_PARTITIONS = 128


def run_pages_pipeline(spark, n_docs: int) -> tuple[float, int]:
    """Pages-table dedup pipeline; returns (seconds, n_clusters)."""
    import shutil
    import tempfile

    from jira_duplicate_detection_turkcell__spark import synth
    from jira_duplicate_detection_turkcell__spark.plans import pipeline as P

    cfg = P.DedupConfig()
    tmp = tempfile.mkdtemp(prefix="bench_pages_")
    prev_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        path = f"{tmp}/pages.parquet"
        synth.generate_pages_df(
            spark, n_docs, seed=42, partitions=PAGES_PARTITIONS
        ).write.parquet(path)
        # spread the scan by SPLIT SIZE, not by a repartition: parquet file
        # bin-packing would coalesce the small files into ~cores input
        # splits, making the expensive extract+signature stage a single
        # straggler-bound wave — but an explicit repartition pays a full
        # shuffle of the raw html corpus. 4 MB splits give fine-grained
        # waves for free and are identical at every parallelism level.
        # Scoped to this workload: restored below so query plans are
        # identical no matter where the pipeline runs in the bench order.
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        pages = spark.read.parquet(path)
        t0 = time.time()
        result = P.run_dedup(spark, pages, cfg)
        n_clusters = result["clusters"].select("cluster_id").distinct().count()
        return time.time() - t0, n_clusters
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_split)
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling-workload", action="store_true")
    ap.add_argument("--pages-n", type=int, default=PAGES_N)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.0

    from jira_duplicate_detection_turkcell__spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    headline_cores = spark.sparkContext.defaultParallelism

    timings: dict[str, float] = {}

    if not args.scaling_workload:
        import __spark_entry__ as entrymod

        qs = entrymod.queries()
        for name in HEADLINE:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)

        # The sustained pages pipeline is right-sized to what this host can
        # actually back: with >8 vCPUs busy the hypervisor steals ~4 CPUs
        # continuously and lock-holder preemption amplifies CPU time 4.4×
        # (measured — see BENCH/BASELINE.md), making local[32] *slower* than
        # local[8] on identical input. The short sf-dir queries above are
        # fine at full width. Overridable via SPARK_GRAFT_PAGES_CORES.
        pages_cores = int(os.environ.get("SPARK_GRAFT_PAGES_CORES", "8"))
        if spark.sparkContext.defaultParallelism > pages_cores:
            from jira_duplicate_detection_turkcell__spark.session import (
                get_spark as _gs,
            )

            spark.stop()
            spark = _gs("bench-pages", cores=pages_cores)
            spark.sparkContext.setLogLevel("ERROR")

    secs, n_clusters = run_pages_pipeline(spark, args.pages_n)
    timings["pages_dedup_pipeline"] = round(secs, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "pages_n": args.pages_n,
                "pages_docs_per_sec": round(args.pages_n / secs, 1),
                "pages_n_clusters": n_clusters,
                "cores": headline_cores,
                "pages_cores": spark.sparkContext.defaultParallelism,
            }
        )
    )


if __name__ == "__main__":
    main()
