"""Edmonds–Karp max-flow (the reference's alternative engine, G8) —
kept as a cross-check oracle for the Dinic kernel, mirroring
`/root/reference/pkg/partitioner/edmonds_karp.go:21-96`:

- BFS shortest augmenting path recording ``prev`` edge pointers
  (:21-61), bottleneck push along the path (:63-85);
- source-side flags = vertices reached by the final (failing) BFS
  (prev != nil, :87-96), excluding the two artificial vertices.

Max-flow value (== min-cut edge count) must equal Dinic's on every
input; the cut *sides* may legitimately differ between the engines when
multiple min cuts exist, exactly as in the reference.
"""

from __future__ import annotations

import numpy as np

from .maxflow import FlowGraph


def ek_min_cut(
    base: FlowGraph, sources: np.ndarray, sinks: np.ndarray
) -> tuple[np.ndarray, int, int]:
    """Returns (flags over real vertices, part_two, cut_edges)."""
    g = base.extended(np.asarray(sources, np.int64), np.asarray(sinks, np.int64))
    s, t = base.n, base.n + 1
    ev, ecap, off, flat = g.ev, g.ecap, g.off, g.flat
    eu = g.eu
    eflow = g.eflow
    max_flow = 0
    n = g.n
    while True:
        # BFS shortest augmenting path with prev-edge pointers
        prev_edge = np.full(n, -1, dtype=np.int64)
        visited = np.zeros(n, dtype=bool)
        visited[s] = True
        frontier = np.array([s], dtype=np.int64)
        reached = False
        while frontier.size and not reached:
            starts = off[frontier]
            counts = off[frontier + 1] - starts
            total = int(counts.sum())
            if total == 0:
                break
            basei = np.repeat(starts, counts)
            step = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            eidx = flat[basei + step]
            tgt = ev[eidx]
            ok = (ecap[eidx] - eflow[eidx] > 0) & ~visited[tgt]
            eidx, tgt = eidx[ok], tgt[ok]
            # first-discovery order: keep the first edge per target
            uniq, first = np.unique(tgt, return_index=True)
            visited[uniq] = True
            prev_edge[uniq] = eidx[first]
            if visited[t]:
                reached = True
            frontier = uniq
        if not reached:
            flags = visited[: base.n].copy()
            part_two = int(base.n) - int(flags.sum())
            return flags, part_two, max_flow
        # bottleneck along prev chain, push
        path = []
        u = t
        while u != s:
            e = int(prev_edge[u])
            path.append(e)
            u = int(eu[e])
        f = min(int(ecap[e] - eflow[e]) for e in path)
        for e in path:
            eflow[e] += f
            eflow[e ^ 1] -= f
        max_flow += f
