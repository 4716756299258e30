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
) -> BisectionResult:
    """Single-process Partition() (recursiveBisection.go:37-66), executed
    as rounds (identical cut set to the FIFO queue — each bisection is
    independent of the others).

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

    def coords(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if isinstance(lat_by_vertex, dict):
            la = np.array([lat_by_vertex[int(v)] for v in ids], dtype=np.float64)
            lo = np.array([lon_by_vertex[int(v)] for v in ids], dtype=np.float64)
        else:
            la = np.asarray(lat_by_vertex, dtype=np.float64)[ids]
            lo = np.asarray(lon_by_vertex, dtype=np.float64)[ids]
        return la, lo

    vertex_ids = np.sort(np.asarray(vertex_ids, dtype=np.int64))
    result = BisectionResult()
    final_nonempty: list[np.ndarray] = []
    n_empty = 0
    active = [vertex_ids]
    rnd = 0
    while active:
        nxt: list[np.ndarray] = []
        for cell in active:
            t_c, h_c = _edges_within(cell, tails, heads)
            la, lo = coords(cell)
            side, stats = bisect_once(cell, la, lo, t_c, h_c, rate)
            stats.round = rnd
            result.stats.append(stats)
            one = cell[side == 0]
            two = cell[side == 1]
            for part in (one, two):
                if len(part) == 0:
                    n_empty += 1  # empty side still consumes a cell id
                elif len(part) < max_cell_size:
                    final_nonempty.append(part)
                else:
                    nxt.append(part)
        active = nxt
        rnd += 1

    final_nonempty.sort(key=lambda c: int(c[0]))  # min original id (ascending arrays)
    result.cells = final_nonempty + [
        np.empty(0, dtype=np.int64) for _ in range(n_empty)
    ]
    return result
