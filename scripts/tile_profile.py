#!/usr/bin/env python
"""One-off flagship profiler: the bench.py tile run in isolation.

Usage: python scripts/tile_profile.py [n_docs] [cpus]
Prints per-round TILER_DEBUG timing plus the total, and a pure-Catalyst
probe (q1 on sf0.1) before and after so contended windows are visible.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("TILER_DEBUG", "1")


def probe(spark, sf_dir: str) -> float:
    from osm_inertial_flow_partitioner_spark.entry import queries

    t0 = time.time()
    queries()["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.time() - t0


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from osm_inertial_flow_partitioner_spark.config import PartitionConfig
    from osm_inertial_flow_partitioner_spark.plans.pipeline import run_pipeline
    from osm_inertial_flow_partitioner_spark.session import get_spark
    from osm_inertial_flow_partitioner_spark.sources.pages import generate_pages

    spark = get_spark(app_name="tile_profile", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    p0 = probe(spark, sf_dir)
    print(f"[probe] q1 before: {p0:.2f}s", flush=True)

    pages = generate_pages(spark, n_docs, num_partitions=int(cpus) * 2).persist()
    pages.count()

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
    total = time.time() - t0
    p1 = probe(spark, sf_dir)
    print(f"[probe] q1 after: {p1:.2f}s", flush=True)
    print(
        f"TILE n_docs={n_docs} cpus={cpus} total={total:.1f}s "
        f"docs_per_sec={n_docs / total:.1f}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
