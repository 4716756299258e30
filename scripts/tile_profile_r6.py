#!/usr/bin/env python
"""Round-6 flagship profiler: one tile run with TILER_DEBUG phase prints
AND Spark-UI REST stage attribution (guide §7.1 — where does the
per-round fixed latency actually go?).

Usage: python scripts/tile_profile_r6.py [n_docs] [cpus] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("TILER_DEBUG", "1")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from pyspark.sql import SparkSession

    from osm_inertial_flow_partitioner_spark.config import PartitionConfig
    from osm_inertial_flow_partitioner_spark.plans.pipeline import run_pipeline
    from osm_inertial_flow_partitioner_spark.session import get_spark
    from osm_inertial_flow_partitioner_spark.sources.pages import generate_pages

    # mirror session.py but with the UI on so the REST API serves metrics
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    builder = SparkSession.builder.appName("tile_profile_r6").master(
        f"local[{cpus}]"
    )
    for k, v in [
        ("spark.sql.shuffle.partitions", str(max(4 * int(cpus), 32))),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.execution.arrow.maxRecordsPerBatch", "65536"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.ui.enabled", "true"),
        ("spark.sql.maxPlanStringLength", "2097152"),
        ("spark.sql.ui.retainedExecutions", "50"),
        ("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g")),
        ("spark.ui.retainedStages", "3000"),
        ("spark.ui.retainedJobs", "3000"),
    ]:
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    pages = generate_pages(spark, n_docs, num_partitions=int(cpus) * 2).persist()
    pages.count()

    totals = []
    for rep in range(repeats):
        t0 = time.time()
        res = run_pipeline(
            spark,
            pages,
            PartitionConfig(cell_sizes=[256, 2048]),
            res=6,
            k=4,
            verify_text_invariant=True,
        )
        res.assignment.count()
        totals.append(round(time.time() - t0, 3))
        print(f"[profile] run {rep}: {totals[-1]}s", flush=True)

    # ---- scrape stage metrics ----
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    done = [s for s in stages if s.get("status") == "COMPLETE"]

    def wall(s):
        try:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            a = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
            b = datetime.strptime(s["completionTime"], fmt)
            return (b - a).total_seconds()
        except Exception:
            return 0.0

    rows = []
    for s in done:
        rows.append(
            {
                "stage": s["stageId"],
                "attempt": s["attemptId"],
                "name": s["name"].split("\n")[0][:90],
                "tasks": s["numCompleteTasks"],
                "wall_s": round(wall(s), 2),
                "runTime_s": round(s.get("executorRunTime", 0) / 1000, 2),
                "cpuTime_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                "shuffleRead_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "shuffleWrite_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "submitted": s.get("submissionTime", ""),
            }
        )
    rows.sort(key=lambda r: -r["wall_s"])
    out = os.environ.get("PROFILE_OUT", "/tmp/tile_profile_r6_stages.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"[profile] {len(rows)} stages -> {out}", flush=True)
    print(f"[profile] top stages by wall:", flush=True)
    for r in rows[:25]:
        print(
            f"  id={r['stage']} wall={r['wall_s']:7.2f}s run={r['runTime_s']:8.2f}s "
            f"tasks={r['tasks']:4d} sr={r['shuffleRead_mb']:7.1f}MB {r['name']}",
            flush=True,
        )
    tot_wall = sum(r["wall_s"] for r in rows)
    print(f"[profile] sum stage wall {tot_wall:.1f}s; runs={totals}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
