"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "trials": {...}, "sf": ...}

Noise protocol (round 5): the sandbox host is shared — identical runs of
identical code measured 2-3× per-query swings in both directions within
minutes (see BENCH/BASELINE.md), so a single-shot number is not a signal.
Every headline query (and the pages pipeline) runs as min-of-``--trials``
ALTERNATING trials inside one session: trial 1 runs q1..qn, trial 2 runs
q1..qn again, … — so every query sees every noise window rather than one —
and ``queries`` reports the per-query minimum (the standard noise-robust
"what can the machine do" estimator, same protocol bench/run_scaling.py has
used since round 2). The per-trial arrays are recorded under ``trials`` so
a reader can see the spread instead of trusting the min blindly.

Two workloads:
  (default)            — headline driver queries over the sf-dir parquet tables
                         plus the synthetic-pages dedup pipeline.
  --scaling-workload   — only the synthetic-pages dedup pipeline at a fixed doc
                         count (deterministic input regardless of sf), single
                         run per invocation: bench/run_scaling.py owns the
                         alternation/min across its own subprocess trials.
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


def write_pages_corpus(spark, n_docs: int, path: str) -> None:
    from jira_duplicate_detection_turkcell__spark import synth

    synth.generate_pages_df(
        spark, n_docs, seed=42, partitions=PAGES_PARTITIONS
    ).write.parquet(path)


def run_pages_pipeline(spark, path: str) -> tuple[float, int]:
    """One timed table→clusters run over a pre-written corpus."""
    from jira_duplicate_detection_turkcell__spark.plans import pipeline as P

    cfg = P.DedupConfig()
    prev_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling-workload", action="store_true")
    ap.add_argument("--pages-n", type=int, default=PAGES_N)
    ap.add_argument(
        "--trials", type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3")),
        help="alternating trials per query; reported time is the minimum",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.0

    import shutil
    import tempfile

    from jira_duplicate_detection_turkcell__spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    headline_cores = spark.sparkContext.defaultParallelism

    trials: dict[str, list[float]] = {}

    if not args.scaling_workload:
        import __spark_entry__ as entrymod

        qs = entrymod.queries()
        for trial in range(args.trials):
            for name in HEADLINE:
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                trials.setdefault(name, []).append(round(time.time() - t0, 3))
            # each trial recomputes from parquet; drop persisted leftovers so
            # later trials can't silently reuse a prior trial's cache. The
            # entry module's signature cache must be dropped WITH it:
            # clearCache unpersists the cached signatures DataFrame but the
            # stale handle would survive in the dict, making trials ≥ 2
            # recompute signing unpersisted — a different plan than trial 1,
            # which defeats the min-of-alternating-trials protocol
            spark.catalog.clearCache()
            entrymod._SIGNED_CACHE.clear()

        # The sustained pages pipeline is right-sized to what this host can
        # actually back: with >8 vCPUs busy the hypervisor steals ~4 CPUs
        # continuously and lock-holder preemption amplifies CPU time 4.4×
        # (measured — see BENCH/BASELINE.md), making local[32] *slower* than
        # local[8] on identical input. The short sf-dir queries above are
        # fine at full width. Overridable via SPARK_GRAFT_PAGES_CORES.
        pages_cores = int(os.environ.get("SPARK_GRAFT_PAGES_CORES", "8"))
        if spark.sparkContext.defaultParallelism > pages_cores:
            spark.stop()
            spark = get_spark("bench-pages", cores=pages_cores)
            spark.sparkContext.setLogLevel("ERROR")

    pages_trials = 1 if args.scaling_workload else args.trials
    tmp = tempfile.mkdtemp(prefix="bench_pages_")
    cluster_counts: list[int] = []
    try:
        corpus = f"{tmp}/pages.parquet"
        write_pages_corpus(spark, args.pages_n, corpus)
        for trial in range(pages_trials):
            secs, n_clusters = run_pages_pipeline(spark, corpus)
            trials.setdefault("pages_dedup_pipeline", []).append(round(secs, 3))
            cluster_counts.append(n_clusters)
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # determinism check rides along for free: every trial must produce the
    # same clustering of the same corpus. RuntimeError, not assert — the
    # check must survive `python -O` (repo convention, see annsearch.py)
    if len(set(cluster_counts)) != 1:
        raise RuntimeError(f"cluster count varied across trials: {cluster_counts}")

    queries = {name: min(ts) for name, ts in trials.items()}
    best_pages = queries["pages_dedup_pipeline"]
    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "trials": trials,
                "n_trials": pages_trials if args.scaling_workload else args.trials,
                "sf": sf,
                "pages_n": args.pages_n,
                "pages_docs_per_sec": round(args.pages_n / best_pages, 1),
                "pages_n_clusters": cluster_counts[0],
                "cores": headline_cores,
                "pages_cores": spark.sparkContext.defaultParallelism,
            }
        )
    )


if __name__ == "__main__":
    main()
