"""Per-stage wall-time breakdown of the dedup pipeline at a given core count.

Usage: taskset -c 0-7 python scripts/profile_stages.py --cores 8 --n 20000
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--n", type=int, default=20000)
    args = ap.parse_args()

    from jira_duplicate_detection_turkcell__spark import synth
    from jira_duplicate_detection_turkcell__spark.plans import pipeline as P
    from jira_duplicate_detection_turkcell__spark.session import get_spark

    spark = get_spark(cores=args.cores)
    cfg = P.DedupConfig()
    par = spark.sparkContext.defaultParallelism
    pages = synth.generate_pages_df(spark, args.n, seed=42, partitions=par * 2)

    timings = {}

    def clock(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 2)
        print(f"  {name}: {timings[name]}s", flush=True)
        return out

    t_all = time.time()
    docs = P.extract_stage(pages)
    signed = clock("signatures(persist+count)", lambda: (lambda df: (df.count(), df))(
        P.signature_stage(docs, cfg).persist()
    ))[1]

    mh_edges = P.minhash_edges(signed, cfg)[0].select("key_l", "key_r")
    mh = clock("minhash_edges(count)", lambda: (lambda df: (df.count(), df))(
        mh_edges.persist()
    ))
    print(f"    minhash edge rows: {mh[0]}")

    sh_edges = P.simhash_edges(signed, cfg)[0].select("key_l", "key_r")
    sh = clock("simhash_edges(count)", lambda: (lambda df: (df.count(), df))(
        sh_edges.persist()
    ))
    print(f"    simhash edge rows: {sh[0]}")

    edges = clock("edges_union_distinct(persist+count)", lambda: (lambda df: (df.count(), df))(
        mh[1].union(sh[1]).distinct().persist()
    ))[1]

    from jira_duplicate_detection_turkcell__spark.operators.components import (
        connected_components,
    )

    n_clusters = clock(
        "connected_components(count distinct)",
        lambda: connected_components(edges, signed.select("url"), "url")
        .select("cluster_id")
        .distinct()
        .count(),
    )
    timings["TOTAL"] = round(time.time() - t_all, 2)
    print(json.dumps({"cores": args.cores, "n": args.n, "clusters": n_clusters, **timings}))
    spark.stop()


if __name__ == "__main__":
    main()
