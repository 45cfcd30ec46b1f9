"""Census v2: per-stage tasks/task-time/GC/shuffle IO + executor GC totals.

Separates "tasks got slower" (CPU/GC contention) from "cores sat idle"
(scheduler floor) when the same pipeline runs at two widths.

Usage: python scripts/stage_census2.py [cores] [n_docs]
"""

from __future__ import annotations

import json
import sys
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100000

    import bench
    from jira_duplicate_detection_turkcell__spark.session import get_spark

    # ad-hoc conf overrides for A/B probes: CENSUS_CONF='{"k": "v", ...}'
    import os

    extra = json.loads(os.environ.get("CENSUS_CONF", "{}"))
    if extra:
        print(f"extra conf: {extra}")
    spark = get_spark(cores=cores, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    secs, ncl = bench.run_pages_pipeline(spark, n)
    print(f"pipeline: {secs:.1f}s, {n/secs:.0f} docs/sec, cores={cores}")

    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    appid = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{appid}/stages?status=complete"
        )
    )
    rows = []
    for s in stages:
        rows.append(
            (
                s["stageId"],
                s["numCompleteTasks"],
                round(s["executorRunTime"] / 1000, 1),
                round(s.get("jvmGcTime", 0) / 1000, 1),
                round(s.get("executorCpuTime", 0) / 1e9, 1),
                round(s.get("shuffleReadBytes", 0) / 1e6),
                round(s.get("shuffleWriteBytes", 0) / 1e6),
                round(s.get("memoryBytesSpilled", 0) / 1e6),
            )
        )
    rows.sort(key=lambda r: -r[2])
    print(
        f"{'stage':>5} {'tasks':>5} {'run_s':>7} {'gc_s':>6} {'cpu_s':>7} "
        f"{'shRdMB':>7} {'shWrMB':>7} {'spillMB':>8}"
    )
    for r in rows[:20]:
        print(
            f"{r[0]:>5} {r[1]:>5} {r[2]:>7} {r[3]:>6} {r[4]:>7} "
            f"{r[5]:>7} {r[6]:>7} {r[7]:>8}"
        )
    total_run = sum(r[2] for r in rows)
    total_gc = sum(r[3] for r in rows)
    total_cpu = sum(r[4] for r in rows)
    print(
        f"totals: run {total_run:.0f}s, gc {total_gc:.0f}s, cpu {total_cpu:.0f}s "
        f"(run-cpu gap = IO/contention wait)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
