#!/usr/bin/env python
"""Round-6 measurement harness (guide §1.1/§1.4): per-query noop-sink
isolation with repeats + `.explain("formatted")` capture.

This file is NOT the driver's frozen bench.py — it exists so every
optimization in OPTIMIZATION_r06.md has isolated before/after numbers
and committed plan files (plans/r06/<query>_{before,after}.txt).

Usage:
  python bench_extra.py [--repeats N] [--plans plans/r06 --suffix before]
                        [query ...]
Prints one JSON line: {"queries": {name: [sec, ...]}, "sf": ..., ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "geo_cell_index",
    "knn_lookup",
    "pip_join",
    "dedup_exact",
    "lsh_candidate_pairs",
    "simhash",
    "simhash_near_dups",
    "text_stats",
    "corpus_filter",
    "ann_cosine_topk",
    "ann_cosine_topk_ivf",
    "geo_segment_project",
    "events_sessionize",
    "events_hourly_rollup",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir to write explain output")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0

    from osm_inertial_flow_partitioner_spark.entry import queries
    from osm_inertial_flow_partitioner_spark.session import get_spark

    from bench import cpu_probe

    spark = get_spark(app_name="bench_extra", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    extras: dict = {"cpus": int(cpus), "sf": sf}
    extras["cpu_probe_sec"] = cpu_probe(spark, int(cpus))

    qs = queries()
    timings: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        runs = []
        for _ in range(args.repeats):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        timings[name] = runs
        spark.sparkContext.setJobDescription(None)

    extras["cpu_probe_sec_after"] = cpu_probe(spark, int(cpus))
    print(json.dumps({"queries": timings, **extras}))
    spark.stop()


if __name__ == "__main__":
    main()
