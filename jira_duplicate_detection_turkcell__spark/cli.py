"""spark-submit entry point.

Deployment shape per BASELINE.md: ``spark-submit --py-files pkg.zip cli.py …``
(scripts/make_pyfiles.sh builds the zip). Subcommands:

  dedup      run the full pipeline over an input parquet dir of pages
             (url, warc_ts, html, …) or a deterministic synthetic corpus
             (--synth-n), with optional stage checkpointing (--checkpoint-dir
             → resumable) and cluster output to --output.
  bench      the sf-dir headline bench (delegates to bench.py semantics).

Example:
  spark-submit --master local[32] --py-files dist/jdt_spark.zip \\
      -- cli.py dedup --synth-n 100000 --output /tmp/clusters \\
      --checkpoint-dir /tmp/ckpt
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

# when shipped via --py-files the package is importable from the zip; when run
# from the repo root, fall back to the source tree
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def cmd_dedup(args) -> None:
    from pyspark.sql import SparkSession

    from jira_duplicate_detection_turkcell__spark import synth
    from jira_duplicate_detection_turkcell__spark.plans import pipeline as P
    from jira_duplicate_detection_turkcell__spark.sources.checkpoint import StageStore

    # under spark-submit the session is pre-configured; builder just attaches
    spark = SparkSession.builder.getOrCreate()

    cfg = P.DedupConfig(
        shingle_size=args.shingle_size,
        num_perm=args.num_perm,
        bands=args.bands,
        rows=args.rows,
        jaccard_threshold=args.jaccard_threshold,
        enable_simhash=not args.no_simhash,
        enable_substring=args.substring,
    )
    store = StageStore(args.checkpoint_dir) if args.checkpoint_dir else None

    if args.synth_n:
        pages = synth.generate_pages_df(
            spark, args.synth_n, seed=42,
            partitions=spark.sparkContext.defaultParallelism * 2,
        )
    else:
        pages = spark.read.parquet(args.input)

    t0 = time.time()
    result = P.run_dedup(spark, pages, cfg, store)
    clusters = result["clusters"]
    clusters.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    n_docs = written.count()
    n_clusters = written.select("cluster_id").distinct().count()
    print(
        json.dumps(
            {
                "docs": n_docs,
                "clusters": n_clusters,
                "dup_docs": n_docs - n_clusters,
                "seconds": round(time.time() - t0, 2),
                "docs_per_sec": round(n_docs / (time.time() - t0), 1),
                "config_fingerprint": cfg.fingerprint(),
                "output": args.output,
            }
        )
    )


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="jdt-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dedup", help="run the dedup pipeline")
    src = d.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet dir of pages (url, warc_ts, html, ...)")
    src.add_argument("--synth-n", type=int, help="generate N synthetic pages instead")
    d.add_argument("--output", required=True, help="parquet dir for (url, cluster_id)")
    d.add_argument("--checkpoint-dir", help="StageStore root (enables resume)")
    d.add_argument("--shingle-size", type=int, default=3)
    d.add_argument("--num-perm", type=int, default=128)
    d.add_argument("--bands", type=int, default=32)
    d.add_argument("--rows", type=int, default=4)
    d.add_argument("--jaccard-threshold", type=float, default=0.7)
    d.add_argument("--no-simhash", action="store_true")
    d.add_argument("--substring", action="store_true")
    d.set_defaults(func=cmd_dedup)

    args = ap.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
