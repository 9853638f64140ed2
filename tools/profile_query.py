#!/usr/bin/env python
"""Per-query job/stage profile via the Spark UI REST API.

Usage: python tools/profile_query.py <query_name> [repeats]

Runs one catalog query (count action, same as bench.py) with the UI
enabled, then prints: wall seconds, job count, summed task/executor
time, and the top stages — the evidence for "driver-bound vs task-bound"
claims (guide §1.1/§7.1). Writes nothing; purely a measurement tool.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_full_etl_process_spark.plans import catalog  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"profile_{name}")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.spark_queries()
    fn = queries[name]
    # warm-up run (JIT, parquet footers)
    fn(spark, SF_DIR).count()

    base = "http://localhost:4050/api/v1"
    app = json.load(urllib.request.urlopen(f"{base}/applications"))[0]["id"]

    def jobs():
        return json.load(
            urllib.request.urlopen(f"{base}/applications/{app}/jobs?status=succeeded")
        )

    best = None
    for _ in range(repeats):
        n0 = len(jobs())
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        wall = time.perf_counter() - t0
        js = jobs()
        if best is None or wall < best[0]:
            best = (wall, n0, js)
        spark.catalog.clearCache()
    wall, n0, js = best
    new = [j for j in js if j["jobId"] >= 0][: len(js) - n0]
    # jobs API returns newest first
    new = js[: len(js) - n0]
    njobs = len(new)
    stage_ids = [s for j in new for s in j["stageIds"]]
    stages = json.load(
        urllib.request.urlopen(f"{base}/applications/{app}/stages?status=complete")
    )
    by_id = {}
    for s in stages:
        by_id.setdefault(s["stageId"], s)
    mine = [by_id[s] for s in stage_ids if s in by_id]
    exec_ms = sum(s.get("executorRunTime", 0) for s in mine)
    task_n = sum(s.get("numCompleteTasks", 0) for s in mine)
    print(
        json.dumps(
            {
                "query": name,
                "wall_s": round(wall, 3),
                "n_jobs": njobs,
                "n_stages": len(mine),
                "n_tasks": task_n,
                "executor_run_s": round(exec_ms / 1000.0, 3),
                "driver_gap_s": round(wall - exec_ms / 1000.0 / int(cpus), 3),
            }
        )
    )
    top = sorted(mine, key=lambda s: -s.get("executorRunTime", 0))[:8]
    for s in top:
        print(
            f"  stage {s['stageId']}: tasks={s['numCompleteTasks']} "
            f"execMs={s['executorRunTime']} name={s['name'][:90]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
