"""End-to-end tile-assignment pipeline (lifecycle E1 re-expressed).

Reference `main()` (`/root/reference/main.go:11-26`): parse PBF -> build
graph -> 5-level partition -> JSON/MLP sinks. Graft shape (SURVEY.md §3):

stage A  pages (Iceberg/parquet/synthetic) -> geo-entity extraction
         (regexp, JVM-side) -> grid-cell encode -> vertices + kNN edges;
stage B  driver loop: multilevel inertial-flow partitioning via
         cogrouped applyInPandas (operators/partitioner.py);
stage C  packed cell numbers + sinks (MLP-equivalent parquet, per-level
         JSON samples) + metrics.

Every stage is a DataFrame transformation; the only driver-side state is
the round/level loop + O(#cells) metadata.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PartitionConfig
from ..operators.packing import pack_assignment
from ..operators.partitioner import multilevel_partition
from ..sources.extract import extract_entities, knn_adjacency, text_invariant_check
from ..sources.graph_io import write_mlp, write_partition_samples


@dataclass
class PipelineResult:
    entities: DataFrame
    edges: DataFrame
    assignment: DataFrame
    packed: DataFrame
    num_cells: list[int]
    metrics: DataFrame
    n_docs: int
    n_entities: int


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    config: PartitionConfig | None = None,
    res: int = 6,
    k: int = 4,
    adjacency_res: int | None = None,
    checkpoint=None,
    output_dir: str | None = None,
    verify_text_invariant: bool = True,
) -> PipelineResult:
    import os
    import time

    config = config or PartitionConfig()
    debug = bool(os.environ.get("TILER_DEBUG"))
    _t = time.time()
    spark.sparkContext.setJobDescription("pipeline: extract + dense ids")
    n_docs = pages.count()

    # stage A: extract (res = query-cell resolution; the kNN adjacency
    # auto-picks its own density-matched bucket resolution). The exact
    # entity count falls out of the dense-id offsets — no separate
    # count job; the persist materializes under the first consumer
    # (the adjacency occupancy ladder).
    entities, n_entities = extract_entities(pages, res=res, return_count=True)
    entities.persist()
    if debug:
        print(f"[pipeline] extract took {time.time() - _t:.1f}s", flush=True)
        _t = time.time()
    spark.sparkContext.setJobDescription("pipeline: adjacency occupancy probe")
    edges = knn_adjacency(entities, k=k, res=adjacency_res, n_points=n_entities)
    edges.persist()
    spark.sparkContext.setJobDescription(None)
    if debug:
        print(f"[pipeline] adjacency setup took {time.time() - _t:.1f}s", flush=True)
        _t = time.time()

    # the text-invariant check is independent of the partition phase
    # (it reads only the persisted pages), so it runs CONCURRENTLY with
    # stage B on a driver thread (guide §2.6 — Spark schedules both
    # jobs, the check back-fills idle executors during the serial
    # bisection prefix) and is asserted before the pipeline returns.
    invariant_future = None
    if verify_text_invariant:
        from concurrent.futures import ThreadPoolExecutor

        def _inv():
            # job descriptions are thread-local — label the overlapped
            # invariant job on its own thread (guide §1.5/§2.6)
            spark.sparkContext.setJobDescription("pipeline: text invariant (overlapped)")
            return text_invariant_check(pages, pages)

        _inv_pool = ThreadPoolExecutor(max_workers=1)
        invariant_future = _inv_pool.submit(_inv)
        _inv_pool.shutdown(wait=False)

    vertices = entities.select(
        F.col("entity_id").alias("vertex_id"), "lat", "lon"
    )

    # stage B: partition (n_entities re-used — vertices are 1:1 with
    # the already-counted persisted entities)
    assignment, num_cells, metrics = multilevel_partition(
        spark, vertices, edges, config, checkpoint=checkpoint,
        n_vertices=n_entities,
    )
    if debug:
        print(f"[pipeline] partition took {time.time() - _t:.1f}s", flush=True)

    if invariant_future is not None:
        _t = time.time()
        changed = invariant_future.result()
        assert changed == 0, f"text mutated for {changed} urls"
        if debug:
            print(
                f"[pipeline] text invariant join took {time.time() - _t:.1f}s",
                flush=True,
            )

    # stage C: pack + sinks
    packed = pack_assignment(assignment, num_cells)
    if output_dir:
        write_mlp(packed, num_cells, f"{output_dir}/mlp")
        for level in range(config.levels - 1):
            write_partition_samples(assignment, vertices.withColumnRenamed("vertex_id", "vertex_id"), f"{output_dir}/samples", level)
        metrics.write.mode("overwrite").parquet(f"{output_dir}/metrics")

    return PipelineResult(
        entities=entities,
        edges=edges,
        assignment=assignment,
        packed=packed,
        num_cells=num_cells,
        metrics=metrics,
        n_docs=n_docs,
        n_entities=n_entities,
    )
