"""Run the bench pipeline once and dump per-stage (tasks, wall, task-time)
from the Spark UI REST API — finds low-parallelism stages that cap scaling.

Usage: python scripts/stage_census.py [cores] [n_docs]
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

    spark = get_spark(cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    secs, ncl = bench.run_pages_pipeline(spark, n)
    print(f"pipeline: {secs:.1f}s, {n/secs:.0f} docs/sec")

    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    appid = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{appid}/stages?status=complete")
    )
    rows = []
    for s in stages:
        wall = (
            0
            if not s.get("firstTaskLaunchedTime")
            else s["executorRunTime"]
        )
        rows.append(
            (
                s["stageId"],
                s["numCompleteTasks"],
                round(s["executorRunTime"] / 1000, 1),
                s["name"].split("\n")[0][:60],
            )
        )
    rows.sort(key=lambda r: -r[2])
    print(f"{'stage':>5} {'tasks':>5} {'taskTime_s':>10}  name")
    for sid, ntask, ttime, name in rows[:25]:
        print(f"{sid:>5} {ntask:>5} {ttime:>10}  {name}")
    total = sum(r[2] for r in rows)
    low_par = sum(r[2] for r in rows if r[1] <= 2)
    print(f"total task-time: {total:.0f}s; in stages with <=2 tasks: {low_par:.0f}s")
    spark.stop()


if __name__ == "__main__":
    main()
