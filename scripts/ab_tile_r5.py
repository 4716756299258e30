#!/usr/bin/env python
"""Same-window A/B of tile configs: each invocation runs the flagship
twice (warm min, bench-style) in one fresh JVM and prints ONE JSON line.
Config comes from env (TILER_FINISH_THRESHOLD / TILER_FINISH_PROMOTE).
Usage: python /tmp/ab_tile.py <tag> <n_docs> <cpus>
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

tag, n_docs, cpus = sys.argv[1], int(sys.argv[2]), sys.argv[3]

from osm_inertial_flow_partitioner_spark.config import PartitionConfig
from osm_inertial_flow_partitioner_spark.entry import queries
from osm_inertial_flow_partitioner_spark.plans.pipeline import run_pipeline
from osm_inertial_flow_partitioner_spark.session import get_spark
from osm_inertial_flow_partitioner_spark.sources.pages import generate_pages

spark = get_spark(app_name=f"ab_{tag}", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"


def probe():
    t0 = time.time()
    queries()["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.time() - t0, 3)


p0 = probe()
pages = generate_pages(spark, n_docs, num_partitions=int(cpus) * 2).persist()
pages.count()
runs = []
for _ in range(2):
    t0 = time.time()
    res = run_pipeline(
        spark, pages, PartitionConfig(cell_sizes=[256, 2048]),
        res=6, k=4, verify_text_invariant=True,
    )
    res.assignment.count()
    runs.append(round(time.time() - t0, 3))
p1 = probe()
print(json.dumps({
    "tag": tag, "cpus": int(cpus), "n_docs": n_docs, "runs": runs,
    "best": min(runs), "q1_before": p0, "q1_after": p1,
    "thr": os.environ.get("TILER_FINISH_THRESHOLD", "16384"),
    "promote": os.environ.get("TILER_FINISH_PROMOTE", "1"),
}), flush=True)
spark.stop()
