"""Standalone (no-JVM) concurrency probe for the signature kernel.

The signature stage is the scaling bottleneck (task-time amplification at
8 workers, VERDICT r2 / round-3 census). This probe separates *host/memory
contention* from *Spark overhead*: it runs the exact mapInPandas kernel
(`text_sign_compute`) over identical pandas batches in P=1 and P=8
concurrent processes and reports per-process wall time. Pure-kernel
anti-scaling here == memory-bandwidth / page-fault / steal contention,
nothing to do with Spark.

Usage: python scripts/kernel_scaling_probe.py [n_docs_per_proc] [procs...]
"""

from __future__ import annotations

import os
import sys
import time
from multiprocessing import Queue  # typing only; run_level uses the spawn context
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


# allocator tunables are read ONCE at glibc initialization: setting them
# inside worker() was a no-op, and even parent-side env doesn't help
# fork()ed children (they inherit the already-initialized allocator).
# Set them here and use the SPAWN start method below — spawned workers
# exec a fresh interpreter that genuinely reads these, matching the
# session.py worker environment.
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")


def worker(parquet_path: str, q: Queue) -> None:
    import pandas as pd

    from jira_duplicate_detection_turkcell__spark.operators.signatures import (
        text_sign_compute,
    )

    from jira_duplicate_detection_turkcell__spark.extract import _series_extract

    raw = pd.read_parquet(parquet_path)[["url", "html"]]
    t0 = time.time()
    text = _series_extract(raw["html"])
    t_extract = time.time() - t0
    pdf = pd.DataFrame({"url": raw["url"], "text": text})
    pdf = pdf[pdf["text"].str.len() > 0]
    batches = [pdf.iloc[i : i + 2000] for i in range(0, len(pdf), 2000)]
    kernel = text_sign_compute()
    t1 = time.time()
    n_out = sum(len(out) for out in kernel(iter(batches)))
    q.put((t_extract, time.time() - t1, n_out))


def run_level(procs: int, parquet_path: str) -> float:
    import multiprocessing

    ctx = multiprocessing.get_context("spawn")
    q = ctx.Queue()
    ps = [ctx.Process(target=worker, args=(parquet_path, q)) for _ in range(procs)]
    t0 = time.time()
    for p in ps:
        p.start()
    results = [q.get() for p in ps]
    for p in ps:
        p.join()
    wall = time.time() - t0
    ext = [r[0] for r in results]
    sig = [r[1] for r in results]
    print(
        f"P={procs}: wall {wall:.1f}s | extract "
        f"{min(ext):.1f}-{max(ext):.1f}s (mean {sum(ext)/len(ext):.1f}) | sign "
        f"{min(sig):.1f}-{max(sig):.1f}s (mean {sum(sig)/len(sig):.1f})"
    )
    return sum(ext) / len(ext) + sum(sig) / len(sig)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 25000
    levels = [int(x) for x in sys.argv[2:]] or [1, 8]
    path = f"/tmp/kernel_probe_{n_docs}.parquet"
    if not os.path.exists(path):
        from jira_duplicate_detection_turkcell__spark import synth

        t0 = time.time()
        synth.generate_pages_pdf(n_docs, seed=42)[["url", "html"]].to_parquet(path)
        print(f"generated {n_docs} docs in {time.time() - t0:.1f}s -> {path}")
    means = {}
    for p in levels:
        means[p] = run_level(p, path)
    if len(levels) >= 2:
        lo, hi = levels[0], levels[-1]
        print(
            f"per-proc time inflation {lo}->{hi} workers: "
            f"{means[hi] / means[lo]:.2f}x (1.0 = no contention)"
        )


if __name__ == "__main__":
    main()
