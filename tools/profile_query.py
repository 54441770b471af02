"""Stage-level profiler for one registry query (r12, guide §1/§7.1).

Runs a named query once (cold) with the UI enabled, then dumps every
stage's duration, task count, and max/median task time from the UI
REST API — the fastest way to spot single-task stages, skew, and
straggler shapes without a browser.

Usage: python tools/profile_query.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import bench
    from nyc_taxi_data_ingestion_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="profile",
        master=f"local[{cpus}]",
        extra_confs={
            "spark.sql.shuffle.partitions": str(cpus),
            "spark.ui.enabled": "true",
        },
    )
    from nyc_taxi_data_ingestion_spark.queries import REGISTRY

    bench._warmup(spark, names={name})
    spark.sparkContext.setJobDescription(f"profile:{name}")
    t0 = time.time()
    df = REGISTRY[name].fn(spark, sf_dir)
    rows = df.count()
    wall = time.time() - t0
    print(f"{name}: {wall:.2f}s wall, {rows} rows", flush=True)

    ui = spark.sparkContext.uiWebUrl
    app = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications")
    )[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        )
    )
    rows_out = []
    for s in stages:
        dur = s.get("executorRunTime", 0) / 1000.0
        sub = s.get("submissionTime", "")
        comp = s.get("completionTime", "")
        rows_out.append(
            (
                dur,
                s["stageId"],
                s["numCompleteTasks"],
                s.get("shuffleReadBytes", 0),
                s.get("shuffleWriteBytes", 0),
                (s.get("name", "") or "")[:80],
                sub[-12:],
                comp[-12:],
            )
        )
    rows_out.sort(reverse=True)
    print(
        f"{'exec-s':>7} {'stage':>5} {'tasks':>5} {'shRd':>9} "
        f"{'shWr':>9}  name / submitted -> completed"
    )
    for dur, sid, nt, srd, swr, nm, sub, comp in rows_out[:25]:
        print(
            f"{dur:7.2f} {sid:5d} {nt:5d} {srd:9d} {swr:9d}  "
            f"{nm}  {sub} -> {comp}"
        )


if __name__ == "__main__":
    main()
