"""Distributed multilevel inertial-flow partitioner.

The reference runs a *sequential* FIFO of bisections per level
(`/root/reference/pkg/partitioner/recursiveBisection.go:37-66`) inside a
single Go process. Here the while-loop lives on the Spark driver and each
iteration is ONE distributed job: every oversized cell is bisected in
parallel by a numpy kernel inside cogrouped ``applyInPandas`` — the big
scalability win, since the number of cells (and hence parallelism)
doubles every round. Cut semantics are identical because each cell's
bisection is independent of all others.

Scale design (100 TB / 10^9+ vertices):

- parallelism unit = cell, not direction job (the 10 direction jobs run
  as a loop inside one kernel call; a max cell of 2^20 vertices fits one
  executor, reference main.go:21);
- per round: 2 equi-joins label edge endpoints with their cell key, then
  one cogrouped shuffle feeds the kernel. All three shuffle on vertex /
  cell keys and shrink with the active set; the active-key side of the
  join is broadcast while small;
- small-cell fast path: once an active cell is below
  ``local_recursion_threshold`` the kernel runs the *entire* remaining
  recursion locally (identical semantics — the reference itself is a
  local recursion), collapsing O(log n) rounds into one pass. Lower
  levels therefore complete in a single distributed pass each;
- cell labels: (root, path) with heap-numbered paths (prefix-free within
  a root's tree), relabeled per level by the frozen SURVEY.md §7 rule:
  per parent, non-empty cells by min original vertex id, then empty
  cells; concatenated in parent-id order. Empty cells (degenerate n<=3
  splits, assignFinalPartition on a 0-vertex side,
  recursiveBisection.go:127-136) have no vertex rows — the kernel
  reports them via the n_empty metric and the driver carries their ids;
- per-round snapshot + lineage/metrics via plans/checkpoint.py; without
  a checkpoint dir, ``localCheckpoint`` truncates lineage each round.

The only driver-side collects are over *cell metadata* (O(#cells) rows),
never vertices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PartitionConfig
from ..kernel.bisection import bisect_once, recursive_bisection

KERNEL_OUT_SCHEMA = (
    "root long, parent_path long, path long, vertex_id long, "
    "lat double, lon double, "
    "n int, cut_edges int, part_two int, best_job int, n_empty int"
)

#: active cells smaller than this finish their whole recursion in one
#: kernel call (must fit one executor comfortably: ~32k vertices of
#: int64/float64 arrays plus edges — a few MB)
DEFAULT_LOCAL_RECURSION_THRESHOLD = 1 << 15


def _make_kernel(max_cell_size: int, rate: float, local_threshold: int):
    def kernel(key, vdf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
        root, path = int(key[0]), int(key[1])
        vdf = vdf.sort_values("vertex_id")
        ids = vdf["vertex_id"].to_numpy(np.int64)
        lat = vdf["lat"].to_numpy(np.float64)
        lon = vdf["lon"].to_numpy(np.float64)
        n = len(ids)
        if len(edf):
            edf = edf.sort_values(["tail", "edge_id"])
            tails = edf["tail"].to_numpy(np.int64)
            heads = edf["head"].to_numpy(np.int64)
        else:
            tails = heads = np.empty(0, dtype=np.int64)

        def out(child_path, sel, cut, part_two, best_job, n_empty):
            return pd.DataFrame(
                {
                    "root": np.int64(root),
                    "parent_path": np.int64(path),
                    "path": np.int64(child_path),
                    "vertex_id": ids[sel],
                    "lat": lat[sel],
                    "lon": lon[sel],
                    "n": np.int32(n),
                    "cut_edges": np.int32(cut),
                    "part_two": np.int32(part_two),
                    "best_job": np.int32(best_job),
                    "n_empty": np.int32(n_empty),
                }
            )

        if n < local_threshold or n < 4:
            # finish the whole recursion locally (reference semantics —
            # the reference is itself a sequential local recursion)
            la = dict(zip(ids.tolist(), lat.tolist()))
            lo = dict(zip(ids.tolist(), lon.tolist()))
            res = recursive_bisection(ids, la, lo, tails, heads, max_cell_size, rate)
            nonempty = [c for c in res.cells if len(c)]
            n_empty = len(res.cells) - len(nonempty)
            bits = max(int(np.ceil(np.log2(len(res.cells) + 1))), 1)
            frames = [
                out((path << bits) | i, np.isin(ids, cell), -1, -1, -1, n_empty)
                for i, cell in enumerate(nonempty)
            ]
            return pd.concat(frames, ignore_index=True)

        side, st = bisect_once(ids, lat, lon, tails, heads, rate)
        n_empty = 1 if st.part_two == st.n else 0  # empty partition-one side
        child = (np.int64(path) << 1) | side.astype(np.int64)
        df = pd.DataFrame(
            {
                "root": np.int64(root),
                "parent_path": np.int64(path),
                "path": child,
                "vertex_id": ids,
                "lat": lat,
                "lon": lon,
                "n": np.int32(st.n),
                "cut_edges": np.int32(st.cut_edges),
                "part_two": np.int32(st.part_two),
                "best_job": np.int32(st.best_job),
                "n_empty": np.int32(n_empty),
            }
        )
        return df

    return kernel


def _run_level(
    assign: DataFrame,
    edges: DataFrame,
    max_cell_size: int,
    rate: float,
    local_threshold: int,
    level: int,
    metrics_rows: list,
    checkpoint=None,
) -> tuple[DataFrame, dict[int, int]]:
    """Run bisection rounds for one level.

    ``assign``: (vertex_id, lat, lon, root, path) with path=1 per parent
    tree root. Round 0 bisects every cell (Partition() is called per
    parent unconditionally, multilevel_partitioner.go:59-68); later
    rounds only cells with count >= max_cell_size. Returns the final
    assign plus degenerate-empty counts per root.
    """
    empties: dict[int, int] = {}
    rnd = 0
    while True:
        counts = assign.groupBy("root", "path").count()
        active_keys = counts if rnd == 0 else counts.filter(F.col("count") >= max_cell_size)
        keys = [(r["root"], r["path"]) for r in active_keys.select("root", "path").collect()]
        if not keys:
            break

        ak = F.broadcast(
            active_keys.sparkSession.createDataFrame(keys, "root long, path long")
        )
        active = assign.join(ak, ["root", "path"], "inner")
        inactive = assign.join(ak, ["root", "path"], "left_anti")

        # J3 semi-join: label both edge endpoints, keep intra-cell edges
        vmap = active.select(F.col("vertex_id").alias("v"), "root", "path")
        e_act = (
            edges.join(
                vmap.withColumnsRenamed({"v": "tail", "root": "rt", "path": "pt"}),
                "tail",
            )
            .join(
                vmap.withColumnsRenamed({"v": "head", "root": "rh", "path": "ph"}),
                "head",
            )
            .filter((F.col("rt") == F.col("rh")) & (F.col("pt") == F.col("ph")))
            .select(
                "edge_id",
                "tail",
                "head",
                F.col("rt").alias("root"),
                F.col("pt").alias("path"),
            )
        )

        kernel = _make_kernel(max_cell_size, rate, local_threshold)
        out = (
            active.groupBy("root", "path")
            .cogroup(e_act.groupBy("root", "path"))
            .applyInPandas(kernel, schema=KERNEL_OUT_SCHEMA)
        )

        assign = out.select("root", "path", "vertex_id", "lat", "lon").unionByName(
            inactive.select("root", "path", "vertex_id", "lat", "lon")
        )
        if checkpoint is not None:
            assign = checkpoint.snapshot_round(assign, level, rnd)
        else:
            assign = assign.localCheckpoint(eager=True)

        # per-parent metrics (one row per bisected cell) — O(#cells)
        m = (
            out.groupBy("root", "parent_path")
            .agg(
                F.first("n").alias("n"),
                F.first("cut_edges").alias("cut_edges"),
                F.first("part_two").alias("part_two"),
                F.first("best_job").alias("best_job"),
                F.first("n_empty").alias("n_empty"),
            )
            .collect()
        )
        for r in m:
            metrics_rows.append(
                {
                    "level": level,
                    "round": rnd,
                    "root": r["root"],
                    "parent_path": r["parent_path"],
                    "n": r["n"],
                    "cut_edges": r["cut_edges"],
                    "part_two": r["part_two"],
                    "best_job": r["best_job"],
                    "n_empty": r["n_empty"],
                }
            )
            if r["n_empty"]:
                empties[r["root"]] = empties.get(r["root"], 0) + int(r["n_empty"])
        rnd += 1
    return assign, empties


def _relabel_level(
    assign: DataFrame,
    empties: dict[int, int],
    empty_roots: list[int],
    n_roots: int,
) -> tuple[DataFrame, int, list[int]]:
    """Frozen numbering: per parent root (in root-id order): non-empty
    cells by min original vertex id, then that root's empty cells; empty
    roots contribute 2 empty child cells in place. Returns (assign with
    final cell ids, num_cells, empty child cell ids)."""
    meta = (
        assign.groupBy("root", "path")
        .agg(F.min("vertex_id").alias("min_vid"))
        .collect()
    )
    by_root: dict[int, list] = {}
    for r in meta:
        by_root.setdefault(int(r["root"]), []).append((int(r["min_vid"]), int(r["path"])))
    mapping: list[tuple[int, int, int]] = []  # (root, path, cell_id)
    empty_ids: list[int] = []
    empty_root_set = set(empty_roots)
    cid = 0
    for root in range(n_roots):
        if root in empty_root_set:
            # Partition() on an empty cell -> two empty final cells
            empty_ids.extend([cid, cid + 1])
            cid += 2
            continue
        for _mv, path in sorted(by_root.get(root, [])):
            mapping.append((root, path, cid))
            cid += 1
        for _ in range(empties.get(root, 0)):
            empty_ids.append(cid)
            cid += 1
    spark = assign.sparkSession
    map_df = F.broadcast(
        spark.createDataFrame(mapping, "root long, path long, cell_id long")
    )
    out = assign.join(map_df, ["root", "path"], "inner").select(
        "vertex_id", "lat", "lon", "cell_id"
    )
    return out, cid, empty_ids


def multilevel_partition(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    config: PartitionConfig | None = None,
    local_recursion_threshold: int = DEFAULT_LOCAL_RECURSION_THRESHOLD,
    checkpoint=None,
) -> tuple[DataFrame, list[int], DataFrame]:
    """Top-down multilevel partitioning (RunMultilevelPartitioning,
    multilevel_partitioner.go:43-77).

    ``vertices``: (vertex_id long, lat double, lon double);
    ``edges``: (edge_id long, tail long, head long) — one row per
    undirected unit-capacity edge (kernel adds both directions,
    partition_graph.go:216-229).

    Returns (assignment DataFrame (vertex_id, level, cell_id),
    num_cells per level, metrics DataFrame with per-bisection lineage).
    """
    config = config or PartitionConfig()
    L = config.levels
    cell_sizes = config.cell_sizes
    rate = config.rate
    n = vertices.count()
    metrics_rows: list = []

    assign = vertices.select(
        "vertex_id", "lat", "lon", F.lit(0).cast("long").alias("root"), F.lit(1).cast("long").alias("path")
    )
    edges = edges.select("edge_id", "tail", "head")

    level_frames: list[DataFrame] = []
    num_cells: list[int] = [0] * L
    empty_roots: list[int] = []

    # top level L-1: only partition if n > U (multilevel_partitioner.go:48-55)
    top_u = cell_sizes[L - 1]
    if n > top_u:
        a, empties = _run_level(
            assign, edges, top_u, rate, local_recursion_threshold, L - 1,
            metrics_rows, checkpoint,
        )
        labeled, c, empty_ids = _relabel_level(a, empties, [], 1)
    else:
        labeled = assign.select("vertex_id", "lat", "lon", F.lit(0).cast("long").alias("cell_id"))
        c, empty_ids = 1, []
    num_cells[L - 1] = c
    empty_roots = empty_ids
    level_frames.append(
        labeled.select("vertex_id", F.lit(L - 1).alias("level"), "cell_id")
    )

    # lower levels: Partition() per parent cell, unconditionally
    current = labeled
    for level in range(L - 2, -1, -1):
        u = cell_sizes[level]
        a0 = current.select(
            "vertex_id", "lat", "lon",
            F.col("cell_id").alias("root"), F.lit(1).cast("long").alias("path"),
        )
        a, empties = _run_level(
            a0, edges, u, rate, local_recursion_threshold, level,
            metrics_rows, checkpoint,
        )
        labeled, c, empty_ids = _relabel_level(
            a, empties, empty_roots, num_cells[level + 1]
        )
        num_cells[level] = c
        empty_roots = empty_ids
        level_frames.append(
            labeled.select("vertex_id", F.lit(level).alias("level"), "cell_id")
        )
        current = labeled

    result = level_frames[0]
    for fr in level_frames[1:]:
        result = result.unionByName(fr)
    metrics_schema = (
        "level int, round int, root long, parent_path long, n int, "
        "cut_edges int, part_two int, best_job int, n_empty int"
    )
    metrics = spark.createDataFrame(
        [tuple(r.values()) for r in metrics_rows] if metrics_rows else [],
        metrics_schema,
    )
    if checkpoint is not None:
        checkpoint.finalize(result, num_cells, metrics)
    return result, num_cells, metrics
