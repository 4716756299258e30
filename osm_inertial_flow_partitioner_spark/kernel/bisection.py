"""Recursive bisection (kernel + single-process oracle).

``bisect_once`` is the unit of work both for the local oracle and for
the Spark cogrouped-``applyInPandas`` kernel: one balanced min-cut of one
cell. ``recursive_bisection`` is the single-process driver mirroring
RecursiveBisection.Partition
(`/root/reference/pkg/partitioner/recursiveBisection.go:37-66`):

- the initial cell is always bisected once (queue seeded with it);
- a side is re-bisected while size >= maximumCellSize ("tooSmall" is a
  strict <, recursiveBisection.go:48-50);
- the degenerate n <= 3 case (int(n*0.25) == 0 endpoints) produces an
  (empty, all) split — the empty side still consumes a final cell id
  (assignFinalPartition on a 0-vertex graph, recursiveBisection.go:127-136),
  so empty cells exist and count toward numCells, exactly as in the
  reference.

Final cell numbering: the reference assigns ids in FIFO completion order
under a mutex — deterministic only because its driver is sequential. We
freeze the SURVEY.md §7 rule instead: within one Partition() call,
non-empty final cells are ordered by their minimum original vertex id,
empty cells after them (in creation order). The cell *sets* are
identical to the reference's; only the labels are canonicalized.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from ..config import SOURCE_SINK_RATE
from .inertial import best_inertial_cut
from .maxflow import FlowGraph


@dataclass
class CutStats:
    """Per-bisection metrics (lineage / invariant checks)."""

    n: int
    cut_edges: int
    part_two: int
    best_job: int
    round: int = 0


def bisect_once(
    vertex_ids: np.ndarray,
    lat: np.ndarray,
    lon: np.ndarray,
    tails: np.ndarray,
    heads: np.ndarray,
    rate: float = SOURCE_SINK_RATE,
) -> tuple[np.ndarray, CutStats]:
    """Bisect one cell. Inputs use *original* vertex ids:

    - ``vertex_ids`` MUST be ascending (the frozen local-id order: every
      reference subgraph inherits ascending-original-id local order from
      the Partition() root, see buildInitialPartitionGraph
      recursiveBisection.go:138-165 + applyBisection id remap :75-122);
    - ``(tails, heads)`` is the directed edge list sorted by
      (tail, original edge id) — the CSR iteration order of
      ForOutEdgesOfVertex. Edges with an endpoint outside the cell must
      already be dropped (the J3 semi-join, recursiveBisection.go:155-159).

    Returns (side array: 0 = partition one / source side, 1 = partition
    two; stats).
    """
    n = len(vertex_ids)
    lt = np.searchsorted(vertex_ids, tails)
    lh = np.searchsorted(vertex_ids, heads)
    graph = FlowGraph.from_directed_edges(n, lt, lh)
    flags, part_two, cut, job = best_inertial_cut(graph, lat, lon, rate)
    side = (~flags).astype(np.int8)
    return side, CutStats(n=n, cut_edges=cut, part_two=part_two, best_job=job)


@dataclass
class BisectionResult:
    # list of final cells, each an ascending array of original vertex ids;
    # relabeled: non-empty by min original id, then empty cells
    cells: list[np.ndarray] = field(default_factory=list)
    stats: list[CutStats] = field(default_factory=list)

    def assignment(self, num_vertices_hint: int | None = None) -> dict[int, int]:
        out: dict[int, int] = {}
        for cid, cell in enumerate(self.cells):
            for v in cell.tolist():
                out[v] = cid
        return out


def _edges_within(
    cell: np.ndarray, tails: np.ndarray, heads: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Keep edges with both endpoints in ``cell`` (J3 semi-join filter),
    preserving the (tail, edge id) order of the input arrays."""
    member = np.isin(tails, cell) & np.isin(heads, cell)
    return tails[member], heads[member]


def recursive_bisection(
    vertex_ids: np.ndarray,
    lat_by_vertex: dict[int, float] | np.ndarray,
    lon_by_vertex: dict[int, float] | np.ndarray,
    tails: np.ndarray,
    heads: np.ndarray,
    max_cell_size: int,
    rate: float = SOURCE_SINK_RATE,
    pool_workers: int | None = None,
) -> BisectionResult:
    """Single-process Partition() (recursiveBisection.go:37-66), executed
    as rounds (identical cut set to the FIFO queue — each bisection is
    independent of the others).

    ``pool_workers`` caps the big-cell round pool (None = min(16,
    cpu_count)); the Spark driver passes its cores-per-concurrent-task
    estimate so several promoted finish tasks don't oversubscribe the
    host.

    ``lat_by_vertex``/``lon_by_vertex`` may be dense arrays indexed by
    original vertex id, or dicts. ``tails``/``heads`` use original ids
    sorted by (tail, edge id) and may contain edges leaving the cell
    (they are filtered here, as in buildInitialPartitionGraph).
    """
    if max_cell_size <= 3:
        raise ValueError(
            "max_cell_size <= 3 does not terminate in the reference "
            "(int(n*0.25) == 0 endpoints on an oversized cell)"
        )

    vertex_ids = np.sort(np.asarray(vertex_ids, dtype=np.int64))
    # Align coordinates to the sorted root ids ONCE — the former per-cell
    # dict/dense lookup paid a Python loop (or a huge-index gather) per
    # cell per round; a positional searchsorted gather is pure numpy.
    if isinstance(lat_by_vertex, dict):
        root_lat = np.array(
            [lat_by_vertex[int(v)] for v in vertex_ids], dtype=np.float64
        )
        root_lon = np.array(
            [lon_by_vertex[int(v)] for v in vertex_ids], dtype=np.float64
        )
    else:
        root_lat = np.asarray(lat_by_vertex, dtype=np.float64)[vertex_ids]
        root_lon = np.asarray(lon_by_vertex, dtype=np.float64)[vertex_ids]

    result = BisectionResult()
    final_nonempty: list[np.ndarray] = []
    n_empty = 0
    # Each work item carries ITS OWN already-filtered edge arrays: a
    # child's edges derive from its parent's (both-endpoints-inside
    # split below), so the former per-cell `_edges_within` rescan of the
    # FULL root edge list every round — O(E log n) x 2^round — becomes
    # one O(E_parent) split per bisection.
    t0, h0 = _edges_within(vertex_ids, tails, heads)
    active: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = [
        (vertex_ids, t0, h0)
    ]

    def bisect_cell(item):
        cell, t_c, h_c = item
        pos = np.searchsorted(vertex_ids, cell)
        side, stats = bisect_once(
            cell, root_lat[pos], root_lon[pos], t_c, h_c, rate
        )
        # split the parent's edges by the side of BOTH endpoints —
        # cross-cut edges drop, exactly what _edges_within(child) kept
        st = side[np.searchsorted(cell, t_c)]
        sh = side[np.searchsorted(cell, h_c)]
        same = st == sh
        one_e = same & (st == 0)
        two_e = same & (st == 1)
        return (
            stats,
            (cell[side == 0], t_c[one_e], h_c[one_e]),
            (cell[side == 1], t_c[two_e], h_c[two_e]),
        )

    # Cells of one round are independent (identical cut set to the
    # reference FIFO); for a big entering cell — the raised finish
    # threshold hands a whole level's recursion to ONE Spark task — the
    # deep rounds hold many below-PARALLEL_JOBS_MIN_N cells whose 10
    # direction jobs run serially, so the CELL loop is threaded instead
    # (the compiled Dinic releases the GIL). Small entering cells (the
    # many-concurrent-tasks regime, e.g. the multilevel finish) stay
    # fully serial — no pool, no oversubscription. pool.map preserves
    # order, so stats/cells sequences are identical to the serial loop.
    pool = None
    workers = (
        min(16, os.cpu_count() or 4) if pool_workers is None else pool_workers
    )
    if len(vertex_ids) >= 32768 and workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        from .cdinic import available

        if available():
            pool = ThreadPoolExecutor(max_workers=workers)
    try:
        rnd = 0
        while active:
            if pool is not None and len(active) > 1:
                outs = list(pool.map(bisect_cell, active))
            else:
                outs = [bisect_cell(item) for item in active]
            nxt: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
            for stats, one_item, two_item in outs:
                stats.round = rnd
                result.stats.append(stats)
                for part in (one_item, two_item):
                    if len(part[0]) == 0:
                        n_empty += 1  # empty side still consumes a cell id
                    elif len(part[0]) < max_cell_size:
                        final_nonempty.append(part[0])
                    else:
                        nxt.append(part)
            active = nxt
            rnd += 1
    finally:
        if pool is not None:
            pool.shutdown(wait=False)

    final_nonempty.sort(key=lambda c: int(c[0]))  # min original id (ascending arrays)
    result.cells = final_nonempty + [
        np.empty(0, dtype=np.int64) for _ in range(n_empty)
    ]
    return result
