"""Deterministic fixture graphs (FIXTURES.md §3).

Each generator returns ``(vertices, edges)`` as numpy structured dicts:

- ``vertices``: ``ids`` (int64 ascending), ``lat``, ``lon`` (float64,
  dense arrays indexed by id);
- ``edges``: ``edge_id``, ``tail``, ``head`` (int64), **one row per
  undirected unit-capacity edge**, sorted by (tail, edge_id). The flow
  kernel turns each row into the forward/reverse pair of
  PartitionGraph.AddEdge
  (`/root/reference/pkg/datastructure/partition_graph.go:216-229`).

All generators are seed-free or fixed-seed — goldens depend on them.
"""

from __future__ import annotations

import numpy as np


def _pack(ids, lat, lon, tails, heads):
    ids = np.asarray(ids, dtype=np.int64)
    tails = np.asarray(tails, dtype=np.int64)
    heads = np.asarray(heads, dtype=np.int64)
    order = np.lexsort((np.arange(len(tails)), tails))  # (tail, creation order)
    tails, heads = tails[order], heads[order]
    return (
        {"ids": ids, "lat": np.asarray(lat, float), "lon": np.asarray(lon, float)},
        {
            "edge_id": np.arange(len(tails), dtype=np.int64),
            "tail": tails,
            "head": heads,
        },
    )


def unit_square_grid(k: int):
    """k x k grid on [0,1]^2; vertex id = row*k + col; lat = row/(k-1),
    lon = col/(k-1). Balanced min cut = k (a straight grid line)."""
    ids = np.arange(k * k)
    rows, cols = ids // k, ids % k
    lat = rows / (k - 1)
    lon = cols / (k - 1)
    tails, heads = [], []
    for r in range(k):
        for c in range(k):
            u = r * k + c
            if c + 1 < k:
                tails.append(u)
                heads.append(u + 1)
            if r + 1 < k:
                tails.append(u)
                heads.append(u + k)
    return _pack(ids, lat, lon, tails, heads)


def two_cliques_bridge(m: int = 6):
    """Two K_m cliques joined by one bridge edge; min cut = 1.

    Clique A occupies lon in [0, .2], clique B lon in [.8, 1]."""
    n = 2 * m
    ids = np.arange(n)
    lat = np.array([(i % m) / (m - 1) for i in range(n)], dtype=float)
    lon = np.array([0.2 * (i % 2) if i < m else 0.8 + 0.2 * (i % 2) for i in range(n)])
    tails, heads = [], []
    for base in (0, m):
        for i in range(m):
            for j in range(i + 1, m):
                tails.append(base + i)
                heads.append(base + j)
    tails.append(m - 1)
    heads.append(m)  # the bridge
    return _pack(ids, lat, lon, tails, heads)


def path_graph(n: int = 64):
    ids = np.arange(n)
    lat = np.zeros(n)
    lon = ids / (n - 1)
    return _pack(ids, lat, lon, ids[:-1], ids[1:])


def star_graph(n: int = 16):
    """Hub 0 at center, spokes on a circle — degenerate-balance stress."""
    ids = np.arange(n)
    ang = 2 * np.pi * np.arange(n) / max(n - 1, 1)
    lat = np.concatenate([[0.5], 0.5 + 0.4 * np.sin(ang[1:])])
    lon = np.concatenate([[0.5], 0.5 + 0.4 * np.cos(ang[1:])])
    return _pack(ids, lat, lon, np.zeros(n - 1, dtype=int), ids[1:])


def disconnected_components(k: int = 32):
    """Two k-vertex path components, geographically separated; a
    bisection must split them with cut = 0."""
    n = 2 * k
    ids = np.arange(n)
    lat = np.concatenate([np.linspace(0, 1, k), np.linspace(0, 1, k)])
    lon = np.concatenate([np.full(k, 0.1), np.full(k, 0.9)])
    tails = np.concatenate([ids[: k - 1], ids[k : n - 1]])
    heads = np.concatenate([ids[1:k], ids[k + 1 : n]])
    return _pack(ids, lat, lon, tails, heads)


def road_like_graph(n: int = 1000, seed: int = 42):
    """Seeded random planar-ish road graph standing in for the Solo–Jogja
    OSM extract: points on a jittered grid, edges to nearby neighbors
    (degrees ~2-4), single connected component enforced via a spanning
    chain."""
    rng = np.random.default_rng(seed)
    side = int(np.ceil(np.sqrt(n)))
    ids = np.arange(n)
    rows, cols = ids // side, ids % side
    lat = rows / side + rng.uniform(-0.3, 0.3, n) / side
    lon = cols / side + rng.uniform(-0.3, 0.3, n) / side
    seen = set()
    tails, heads = [], []

    def add(u, v):
        if u == v:
            return
        key = (min(u, v), max(u, v))
        if key in seen:
            return
        seen.add(key)
        tails.append(key[0])
        heads.append(key[1])

    # grid neighbors with random dropout -> road-ish degrees
    for u in range(n):
        r, c = u // side, u % side
        if c + 1 < side and u + 1 < n and rng.random() < 0.85:
            add(u, u + 1)
        if r + 1 < side and u + side < n and rng.random() < 0.85:
            add(u, u + side)
        if c + 1 < side and r + 1 < side and u + side + 1 < n and rng.random() < 0.1:
            add(u, u + side + 1)
    # connectivity backbone
    for u in range(n - 1):
        add(u, u + 1)
    return _pack(ids, lat, lon, tails, heads)


FIXTURES = {
    "unit_square_k4": lambda: unit_square_grid(4),
    "unit_square_k8": lambda: unit_square_grid(8),
    "unit_square_k16": lambda: unit_square_grid(16),
    "two_cliques_bridge": two_cliques_bridge,
    "path_64": path_graph,
    "star_16": star_graph,
    "disconnected_2x32": disconnected_components,
    "osm_extract_style_1k": road_like_graph,
}
