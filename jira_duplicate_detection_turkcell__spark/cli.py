"""spark-submit entry point.

Deployment shape per BASELINE.md: ``spark-submit --py-files pkg.zip cli.py …``
(scripts/make_pyfiles.sh builds the zip). Subcommands:

  dedup      run the full pipeline over an input parquet dir of pages
             (url, warc_ts, html, …) or a deterministic synthetic corpus
             (--synth-n), with optional stage checkpointing (--checkpoint-dir
             → resumable) and cluster output to --output.
  append     incremental append of a new pages batch onto a CHECKPOINTED
             prior run (--state-dir = its --checkpoint-dir): only the new
             batch is extracted/signed/fingerprinted, candidate pairs come
             from the salted bipartite new×all join (+ the winnowed-postings
             state for --substring), and the updated state is committed back
             — so appends chain, and append ≡ full rebuild (the reference's
             consistency model, api_server.py:848-877, at incremental cost).

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


def _cfg_from_args(args):
    from jira_duplicate_detection_turkcell__spark.plans import pipeline as P

    return P.DedupConfig(
        shingle_size=args.shingle_size,
        num_perm=args.num_perm,
        bands=args.bands,
        rows=args.rows,
        jaccard_threshold=args.jaccard_threshold,
        enable_simhash=not args.no_simhash,
        enable_substring=args.substring,
    )


def _pages_from_args(spark, args):
    from jira_duplicate_detection_turkcell__spark import synth

    if args.synth_n:
        return synth.generate_pages_df(
            spark, args.synth_n, seed=42,
            partitions=spark.sparkContext.defaultParallelism * 2,
            start=args.synth_start,
            total=args.synth_total,
        )
    return spark.read.parquet(args.input)


def cmd_dedup(args) -> None:
    from pyspark.sql import SparkSession

    from jira_duplicate_detection_turkcell__spark.plans import pipeline as P
    from jira_duplicate_detection_turkcell__spark.sources.checkpoint import StageStore

    # under spark-submit the session is pre-configured; builder just attaches
    spark = SparkSession.builder.getOrCreate()

    cfg = _cfg_from_args(args)
    store = StageStore(args.checkpoint_dir) if args.checkpoint_dir else None

    pages = _pages_from_args(spark, args)

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


def cmd_append(args) -> None:
    """Append a batch onto a checkpointed run; commit updated state back.

    Consistency scheme: every state stage carries a ``generation`` in its
    manifest metrics. The append refuses mixed generations (a crash between
    the per-stage commits leaves them mixed — rebuild or retry against a
    copy), verifies the config fingerprint matches the base run, and
    commits all stages at generation+1. The updated tables are materialized
    (localCheckpoint) BEFORE their old directories are overwritten — their
    plans read those directories. An Iceberg backend would replace this
    with real snapshot appends (SURVEY.md §7.5); the interface is the same.
    """
    import time as _time

    from pyspark.sql import SparkSession

    from jira_duplicate_detection_turkcell__spark.plans import pipeline as P
    from jira_duplicate_detection_turkcell__spark.sources.checkpoint import StageStore
    from jira_duplicate_detection_turkcell__spark.streaming import incremental

    spark = SparkSession.builder.getOrCreate()
    cfg = _cfg_from_args(args)
    store = StageStore(args.state_dir, config_fingerprint=cfg.fingerprint())

    state_stages = ["docs", "signatures"]
    if cfg.enable_substring:
        state_stages.append("substr_postings")
    # a fresh `dedup` store commits per-KIND edge stages; every append
    # commits (and thereafter reads) one combined "edges" stage
    if store.is_committed("edges"):
        edge_stages = ["edges"]
    else:
        edge_stages = ["edges_minhash"]
        if cfg.enable_simhash:
            edge_stages.append("edges_simhash")
        if cfg.enable_substring:
            edge_stages.append("edges_substring")
    for st in state_stages + edge_stages:
        if not store.is_committed(st):
            raise SystemExit(
                f"append: state stage '{st}' is missing from {args.state_dir} "
                f"or was built with a different config (fingerprint "
                f"{cfg.fingerprint()}) — run `dedup --checkpoint-dir` with "
                f"this exact config first"
            )
    gens = {
        st: store.manifest(st).metrics.get("generation", 0)
        for st in state_stages + edge_stages
    }
    if len(set(gens.values())) != 1:
        raise SystemExit(
            f"append: state generations are mixed ({gens}) — a prior append "
            f"crashed mid-commit; rebuild with `dedup` or restore the store"
        )
    generation = next(iter(gens.values())) + 1

    existing_edges = store.load(spark, edge_stages[0]).select("key_l", "key_r")
    for st in edge_stages[1:]:
        existing_edges = existing_edges.unionByName(
            store.load(spark, st).select("key_l", "key_r")
        )
    if len(edge_stages) > 1:
        existing_edges = existing_edges.distinct()

    t0 = _time.time()
    upd = incremental.apply_append(
        store.load(spark, "signatures"),
        existing_edges,
        _pages_from_args(spark, args),
        cfg,
        existing_docs=store.load(spark, "docs"),
        existing_postings=(
            store.load(spark, "substr_postings") if cfg.enable_substring else None
        ),
    )
    # materialize BEFORE overwriting the directories the plans read from
    new_state = {
        "docs": upd["docs"].localCheckpoint(),
        "signatures": upd["signed"].localCheckpoint(),
        "edges": upd["edges"].localCheckpoint(),
    }
    if cfg.enable_substring:
        new_state["substr_postings"] = upd["postings"].localCheckpoint()
    clusters = upd["clusters"].localCheckpoint()
    for st, df in new_state.items():
        store.commit(st, df, metrics={"generation": generation})
    store.commit("clusters", clusters, metrics={"generation": generation})
    # the per-kind edge stages are now stale relative to the updated docs/
    # signatures — invalidate them so a later `dedup` resume on this store
    # recomputes edges from the appended corpus instead of mixing
    # generations (the combined "edges" stage is the live state from here)
    for st in ("edges_minhash", "edges_simhash", "edges_substring"):
        store.invalidate(st)

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
                "generation": generation,
                "seconds": round(_time.time() - t0, 2),
                "config_fingerprint": cfg.fingerprint(),
                "output": args.output,
            }
        )
    )


def _add_common_args(p, with_checkpoint: bool) -> None:
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet dir of pages (url, warc_ts, html, ...)")
    src.add_argument("--synth-n", type=int, help="generate N synthetic pages instead")
    p.add_argument(
        "--synth-start", type=int, default=0,
        help="first synthetic doc id (append batches slice one corpus)",
    )
    p.add_argument(
        "--synth-total", type=int, default=None,
        help="total corpus size the synthetic slice belongs to",
    )
    p.add_argument("--output", required=True, help="parquet dir for (url, cluster_id)")
    if with_checkpoint:
        p.add_argument("--checkpoint-dir", help="StageStore root (enables resume)")
    else:
        p.add_argument(
            "--state-dir", required=True,
            help="StageStore root of the checkpointed base run (state is read "
            "AND updated here)",
        )
    p.add_argument("--shingle-size", type=int, default=3)
    p.add_argument("--num-perm", type=int, default=128)
    p.add_argument("--bands", type=int, default=32)
    p.add_argument("--rows", type=int, default=4)
    p.add_argument("--jaccard-threshold", type=float, default=0.7)
    p.add_argument("--no-simhash", action="store_true")
    p.add_argument("--substring", action="store_true")


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="jdt-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dedup", help="run the dedup pipeline")
    _add_common_args(d, with_checkpoint=True)
    d.set_defaults(func=cmd_dedup)

    a = sub.add_parser("append", help="incremental append onto a checkpointed run")
    _add_common_args(a, with_checkpoint=False)
    a.set_defaults(func=cmd_append)

    args = ap.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
