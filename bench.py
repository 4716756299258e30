#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Headline set = the flagship end-to-end tile pipeline (docs/sec is the
north-star metric) + one representative per operator family.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def prior_round_best(
    repo_dir: str, query: str, n_docs: int | None = None
) -> float | None:
    """Best (min) recorded timing for ``query`` across prior rounds'
    BENCH_r*.json files, or None if none exist.

    Driver-written BENCH_r*.json nests the bench JSON under 'parsed'
    (top-level keys are n/rc/cpus/sf/tail/parsed); bench.py's own
    output is flat — accept both. When ``n_docs`` is given, only
    records measured at the same input size are comparable (the
    flagship time scales with SPARK_GRAFT_TILE_DOCS; comparing across
    sizes would misfire the guard)."""
    import glob

    vals = []
    for p in sorted(glob.glob(os.path.join(repo_dir, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                d = json.load(f)
            d = d.get("parsed", d) or {}
            if n_docs is not None and d.get("n_docs") not in (None, n_docs):
                continue
            t = d.get("queries", {}).get(query)
            if t is not None:
                vals.append(float(t))
        except (OSError, ValueError):
            continue
    return min(vals) if vals else None


def perf_regression_warning(
    tile_sec: float,
    prior_best: float | None,
    probe_sec: float | None,
    probe_ref: float | None,
    factor: float = 1.5,
) -> str | None:
    """Guard against silent perf regressions (round-2 postmortem): warn
    when the flagship exceeds the best prior round by > ``factor`` WHILE
    the pure-Catalyst probe (q1) is within ``factor`` of its own prior
    best — i.e. the slowdown is in the code, not VM contention."""
    if prior_best is None:
        return None
    probe_clean = (
        probe_sec is None or probe_ref is None or probe_sec <= factor * probe_ref
    )
    if probe_clean and tile_sec > factor * prior_best:
        return (
            f"PERF REGRESSION: tile_pipeline {tile_sec:.1f}s exceeds the best "
            f"prior round ({prior_best:.1f}s) by >{factor}x while the Catalyst "
            f"probe is clean — suspect a code/plan change, not VM noise"
        )
    return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0

    from osm_inertial_flow_partitioner_spark.config import PartitionConfig
    from osm_inertial_flow_partitioner_spark.entry import queries
    from osm_inertial_flow_partitioner_spark.plans.pipeline import run_pipeline
    from osm_inertial_flow_partitioner_spark.session import get_spark
    from osm_inertial_flow_partitioner_spark.sources.pages import generate_pages

    spark = get_spark(app_name="bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # ---- flagship: end-to-end tile pipeline over synthetic CC pages ----
    # big enough that the parallel tail (per-cell kernels) dominates the
    # O(log) serial bisection prefix — the regime the engine targets —
    # while keeping a single bench run within a few minutes
    n_docs = max(int(500_000 * sf), 2_000) if sf else 5_000
    # scaling experiments override the input size: at 50k docs the
    # pipeline is latency-bound (fixed per-round cost dominates; extra
    # cores buy nothing), so the N-vs-4N comparison is also run at a
    # larger input where the parallel fraction dominates
    n_docs = int(os.environ.get("SPARK_GRAFT_TILE_DOCS", n_docs))
    t0 = time.time()
    pages = generate_pages(spark, n_docs, num_partitions=int(cpus) * 2)
    pages = pages.persist()
    pages.count()
    gen_sec = time.time() - t0

    # the sandbox VM shows up to ~3x run-to-run wall-time noise from
    # external contention, so the flagship is repeated and the best
    # (least-contended) run reported; all raw values are in the JSON
    tile_runs = []
    for _ in range(int(os.environ.get("SPARK_GRAFT_TILE_REPEATS", "2"))):
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
        tile_runs.append(round(time.time() - t0, 3))
    timings["tile_pipeline"] = min(tile_runs)
    extras["tile_pipeline_runs"] = tile_runs
    extras["docs_per_sec"] = round(n_docs / timings["tile_pipeline"], 1)
    extras["n_docs"] = n_docs
    extras["n_entities"] = res.n_entities
    extras["pages_gen_sec"] = round(gen_sec, 3)

    # ---- representative operator queries on the driver tables ----
    qs = queries()
    headline = [
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
    for name in headline:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    repo = os.path.dirname(os.path.abspath(__file__))
    warn = perf_regression_warning(
        timings["tile_pipeline"],
        prior_round_best(repo, "tile_pipeline", n_docs=n_docs),
        timings.get("q1_pricing_summary"),
        prior_round_best(repo, "q1_pricing_summary"),
    )
    if warn:
        print(warn, file=sys.stderr)
        extras["perf_warning"] = warn

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
