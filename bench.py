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
    repo_dir: str,
    query: str,
    n_docs: int | None = None,
    cpus: int | None = None,
) -> float | None:
    """Best (min) recorded timing for ``query`` across prior rounds'
    BENCH_r*.json files, or None if none exist.

    Driver-written BENCH_r*.json nests the bench JSON under 'parsed'
    (top-level keys are n/rc/cpus/sf/tail/parsed); bench.py's own
    output is flat — accept both. When ``n_docs`` is given, only
    records measured at the same input size are comparable (the
    flagship time scales with SPARK_GRAFT_TILE_DOCS; comparing across
    sizes would misfire the guard). Same for ``cpus`` (the cpu_probe
    does fixed work, so its seconds scale ~linearly with 1/cores)."""
    import glob

    vals = prior_round_vals(repo_dir, query, n_docs=n_docs, cpus=cpus)
    return min(vals) if vals else None


def prior_round_median(
    repo_dir: str,
    query: str,
    n_docs: int | None = None,
    cpus: int | None = None,
) -> float | None:
    """Median recorded timing across prior rounds. Used as the
    cpu_probe reference: with ~3x ambient co-tenant noise, comparing
    against the all-time MIN made almost every real window look dirty
    (cpu_factor 1.3 vs a once-ever quietest window), silently
    suppressing the regression guard forever. The median tracks the
    typical window instead."""
    import statistics

    vals = prior_round_vals(repo_dir, query, n_docs=n_docs, cpus=cpus)
    return statistics.median(vals) if vals else None


def prior_round_vals(
    repo_dir: str,
    query: str,
    n_docs: int | None = None,
    cpus: int | None = None,
) -> list[float]:
    import glob

    vals = []
    for p in sorted(glob.glob(os.path.join(repo_dir, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                d = json.load(f)
            rec_cpus = d.get("cpus")  # driver puts cpus at the top level
            d = d.get("parsed", d) or {}
            rec_cpus = d.get("cpus", rec_cpus)
            if n_docs is not None and d.get("n_docs") not in (None, n_docs):
                continue
            if cpus is not None and rec_cpus not in (None, cpus, str(cpus)):
                continue
            # extras (e.g. cpu_probe_sec) live at the top level, query
            # timings under 'queries'
            t = d.get("queries", {}).get(query, d.get(query))
            if t is not None:
                vals.append(float(t))
        except (OSError, ValueError):
            continue
    return vals


def cpu_probe(spark, cpus: int) -> float:
    """Seconds for a fixed, core-saturating, pure-JVM compute: one task
    per core, each summing a deterministic range. The q1 probe alone is
    too NARROW to witness heavy contention — q1's small stages don't
    saturate the host, so a co-tenant stealing half the cores slows q1
    ~1.5x while slowing the 32-wide flagship ~3x (observed round 4:
    identical pre-round-4-commit binary, 107s in the round-3 window vs
    337.6s in the contended round-4 window, q1 1.7s vs 2.6s). This
    probe's single stage is as wide as the flagship's, so its slowdown
    factor tracks the flagship's under core theft; it is recorded per
    run so contended windows stay identifiable across rounds."""
    import time as _t

    # warm up whole-stage codegen first — at small sizes the probe
    # measures compile + scheduling, not CPU (400M ids read ~4s at BOTH
    # 8 and 32 threads), defeating its purpose
    spark.range(0, 1_000_000, 1, numPartitions=int(cpus)).selectExpr(
        "sum(id % 7) as s"
    ).collect()
    t0 = _t.time()
    spark.range(0, 12_800_000_000, 1, numPartitions=int(cpus)).selectExpr(
        "sum(id % 7) as s"  # bounded partials — no ANSI long overflow
    ).collect()
    return round(_t.time() - t0, 3)


def perf_regression_warning(
    tile_sec: float,
    prior_best: float | None,
    probe_sec: float | None,
    probe_ref: float | None,
    factor: float = 1.5,
    cpu_probe_sec: float | None = None,
    cpu_probe_ref: float | None = None,
    cpu_factor: float = 1.3,
) -> str | None:
    """Guard against silent perf regressions (round-2 postmortem): warn
    when the flagship exceeds the best prior round by > ``factor`` WHILE
    the window looks clean. Two probes, BOTH must be clean to accuse
    the code: the pure-Catalyst q1 (planner/scan noise) and the
    core-saturating cpu_probe (co-tenant core theft, which q1
    underreports — see its docstring); either probe missing (no prior
    round recorded it) counts as clean, preserving the old behavior.
    ``cpu_probe_ref`` should be the MEDIAN of prior rounds (see
    prior_round_median) so the guard is not silently suppressed by a
    single quiet historical window. When the flagship DID exceed the
    factor but a dirty probe suppressed the accusation, the returned
    string says so explicitly — suppression is visible, never silent."""
    if prior_best is None:
        return None
    probe_clean = (
        probe_sec is None or probe_ref is None or probe_sec <= factor * probe_ref
    )
    cpu_clean = (
        cpu_probe_sec is None
        or cpu_probe_ref is None
        or cpu_probe_sec <= cpu_factor * cpu_probe_ref
    )
    if tile_sec > factor * prior_best:
        if probe_clean and cpu_clean:
            return (
                f"PERF REGRESSION: tile_pipeline {tile_sec:.1f}s exceeds the best "
                f"prior round ({prior_best:.1f}s) by >{factor}x while both probes "
                f"are clean — suspect a code/plan change, not VM noise"
            )
        return (
            f"INFO: tile_pipeline {tile_sec:.1f}s exceeds the best prior round "
            f"({prior_best:.1f}s) by >{factor}x but a contention probe is dirty "
            f"(q1 {probe_sec} vs ref {probe_ref}, cpu_probe {cpu_probe_sec} vs "
            f"median ref {cpu_probe_ref}) — regression guard suppressed for "
            f"this window; re-measure in a clean window before trusting it"
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
    extras: dict = {"cpus": int(cpus)}
    extras["cpu_probe_sec"] = cpu_probe(spark, int(cpus))

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
    # driver-round evidence for the scaling analysis: the serial prefix
    # is O(log n) rounds, amortized at scale by exponential cell fan-out
    from pyspark.sql import functions as F  # noqa: N812

    extras["rounds_per_level"] = {
        str(r["level"]): int(r["rounds"])
        for r in res.metrics.groupBy("level")
        .agg(F.countDistinct("round").alias("rounds"))
        .collect()
    }

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
        cpu_probe_sec=extras["cpu_probe_sec"],
        cpu_probe_ref=prior_round_median(repo, "cpu_probe_sec", cpus=int(cpus)),
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
