"""Graph / assignment sources and sinks.

Spark-native equivalents of the reference's file formats:

- S4/S5 graph sink/source (bzip2 positional text,
  `/root/reference/pkg/datastructure/graph.go:650-1017`) -> parquet
  tables with enforced schemas, clustered by cell for locality (the
  Spark-native analogue of the reference's locality reorder W2,
  graph.go:475-571);
- S6 partition-sample JSON sink (`pkg/partitioner/io_writer.go:14-45`):
  per cell, a random 30% sample of node coordinates. The reference
  shuffles with a time seed (nondeterministic); we freeze a seed
  (SURVEY.md §7 determinism rule);
- S7 MLP sink (`io_writer.go:47-100`): level count, per-level cell
  counts, vertex count, then one packed cell number per vertex —
  written as a parquet table plus a sidecar manifest.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VERTEX_SCHEMA = "vertex_id long, lat double, lon double"
EDGE_SCHEMA = "edge_id long, tail long, head long, weight double, dist double"


def write_graph(vertices: DataFrame, edges: DataFrame, path: str) -> None:
    """S4 equivalent: one parquet table per section."""
    vertices.write.mode("overwrite").parquet(os.path.join(path, "vertices"))
    edges.write.mode("overwrite").parquet(os.path.join(path, "edges"))


def read_graph(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """S5 equivalent."""
    return (
        spark.read.parquet(os.path.join(path, "vertices")),
        spark.read.parquet(os.path.join(path, "edges")),
    )


def write_partition_samples(
    assignment: DataFrame,
    vertices: DataFrame,
    path: str,
    level: int,
    fraction: float = 0.3,
    seed: int = 42,
) -> None:
    """S6: per-cell 30% coordinate sample as JSON (seed frozen)."""
    (
        assignment.filter(F.col("level") == level)
        .sample(fraction=fraction, seed=seed)
        .join(vertices, "vertex_id")
        .groupBy("cell_id")
        .agg(F.collect_list(F.struct("lat", "lon")).alias("nodes"))
        .orderBy("cell_id")
        .write.mode("overwrite")
        .json(os.path.join(path, f"node_per_partitions_level_{level}"))
    )


def write_mlp(
    packed: DataFrame, num_cells: list[int], path: str
) -> None:
    """S7: packed cell numbers + manifest (levels, per-level cell counts,
    vertex count). Ordered by vertex id like the reference's
    GetVerticeIds loop (io_writer.go:93-98)."""
    os.makedirs(path, exist_ok=True)
    n = packed.count()
    packed.select("vertex_id", "cell_number").repartitionByRange(
        max(packed.sparkSession.sparkContext.defaultParallelism, 1), "vertex_id"
    ).sortWithinPartitions("vertex_id").write.mode("overwrite").parquet(
        os.path.join(path, "cell_numbers")
    )
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(
            {"levels": len(num_cells), "num_cells": num_cells, "num_vertices": n},
            f,
        )


def cluster_by_cell(
    vertices_with_cell: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """W2 locality reorder: range-partition + sort by cell number — the
    Spark physical clustering equivalent of graph.go:475-571 (and the
    natural Iceberg table sort order)."""
    np_ = num_partitions or vertices_with_cell.sparkSession.sparkContext.defaultParallelism
    return vertices_with_cell.repartitionByRange(np_, "cell_number").sortWithinPartitions(
        "cell_number", "vertex_id"
    )
