"""Kernel correctness: Dinic min-cut + inertial sweep on fixture graphs.

These pin the semantic heart (SURVEY.md §7 step 1) before any Spark
wiring. Invariants mirror the reference's debug oracles
(`/root/reference/pkg/partitioner/dinic_sources_sinks.go:104-166`).
"""

import numpy as np
import pytest

from osm_inertial_flow_partitioner_spark.kernel import (
    FlowGraph,
    best_inertial_cut,
    bisect_once,
    dinic_min_cut,
    validate_min_cut,
)
from osm_inertial_flow_partitioner_spark.kernel.inertial import (
    direction_jobs,
    pick_sources_sinks,
)
from osm_inertial_flow_partitioner_spark.sources.fixtures import (
    disconnected_components,
    path_graph,
    star_graph,
    two_cliques_bridge,
    unit_square_grid,
)


def _graph(fix):
    v, e = fix
    n = len(v["ids"])
    return (
        FlowGraph.from_directed_edges(n, e["tail"], e["head"]),
        v["lat"][v["ids"]],
        v["lon"][v["ids"]],
    )


def test_direction_jobs_frozen_order():
    jobs = direction_jobs()
    assert len(jobs) == 10
    # 5 slope lines: (slope, 1-|slope|) for slope in -1,-0.6,-0.2,0.2,0.6
    assert jobs[0] == (-1.0, 0.0)
    assert jobs[1] == (-0.6, 0.4)
    assert jobs[4] == pytest.approx((0.6, 0.4))
    # then the 5 diagonals in enqueue order (inertial_flow.go:128-132)
    assert jobs[5:] == [(1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, -1.0), (-1.0, 1.0)]


def test_pick_sources_sinks_truncation_and_order():
    proj = np.array([3.0, 1.0, 2.0, 0.0, 4.0])
    src, snk = pick_sources_sinks(proj, 0.25)  # int(5*0.25) == 1
    assert src.tolist() == [3]
    assert snk.tolist() == [4]
    # ties broken by local id (frozen stable-sort rule)
    proj = np.array([1.0, 0.0, 0.0, 1.0])
    src, snk = pick_sources_sinks(proj, 0.5)
    assert src.tolist() == [1, 2]
    assert snk.tolist() == [3, 0]  # descending projection, ties by reversed id


@pytest.mark.parametrize("k", [4, 8, 16])
def test_grid_min_cut_is_k(k):
    g, lat, lon = _graph(unit_square_grid(k))
    flags, part_two, cut, job = best_inertial_cut(g, lat, lon)
    assert cut == k
    # the residual cut always lies between the 25% source and sink blocks
    n = k * k
    assert n // 4 <= part_two <= 3 * n // 4


def test_grid_all_directions_satisfy_flow_invariants():
    g, lat, lon = _graph(unit_square_grid(8))
    for a, b in direction_jobs():
        proj = a * lon + b * lat
        src, snk = pick_sources_sinks(proj, 0.25)
        flags, part_two, cut, ext = dinic_min_cut(g, src, snk)
        validate_min_cut(g, src, snk, flags, cut, ext)
        assert part_two == int((~flags).sum())


def test_two_cliques_bridge_cut_one():
    v, e = two_cliques_bridge(6)
    g, lat, lon = _graph((v, e))
    flags, part_two, cut, _ = best_inertial_cut(g, lat, lon)
    assert cut == 1
    assert part_two == 6
    # exact side membership: one clique per side
    assert len(set(flags[:6].tolist())) == 1
    assert len(set(flags[6:].tolist())) == 1
    assert flags[0] != flags[6]


def test_path_graph_cut_one_balanced():
    g, lat, lon = _graph(path_graph(64))
    flags, part_two, cut, _ = best_inertial_cut(g, lat, lon)
    assert cut == 1
    # the residual cut saturates right after the 25% source block: the
    # source side is exactly the 16 source vertices (frozen expectation)
    assert part_two == 48
    on = np.flatnonzero(flags)
    assert len(on) == 16 and set(np.diff(on).tolist()) <= {1}  # contiguous


def test_disconnected_components_cut_zero():
    g, lat, lon = _graph(disconnected_components(32))
    flags, part_two, cut, _ = best_inertial_cut(g, lat, lon)
    assert cut == 0
    assert part_two == 32
    assert len(set(flags[:32].tolist())) == 1 and len(set(flags[32:].tolist())) == 1


def test_star_graph_terminates_with_invariants():
    v, e = star_graph(16)
    g, lat, lon = _graph((v, e))
    flags, part_two, cut, _ = best_inertial_cut(g, lat, lon)
    assert 1 <= cut
    assert 0 < part_two < 16


def test_degenerate_small_cell_empty_all_split():
    # n <= 3 at rate 0.25 -> int(n*0.25) == 0 endpoints -> (empty, all)
    ids = np.array([5, 9, 11], dtype=np.int64)
    lat = np.zeros(12)
    lon = np.zeros(12)
    side, stats = bisect_once(
        ids, lat[ids], lon[ids], np.array([5]), np.array([9])
    )
    assert side.tolist() == [1, 1, 1]
    assert stats.cut_edges == 0 and stats.part_two == 3


def test_parallel_directed_edges_double_capacity():
    # both directions listed -> capacity 2 per AddEdge-pair semantics
    n = 2
    g1 = FlowGraph.from_directed_edges(n, np.array([0]), np.array([1]))
    g2 = FlowGraph.from_directed_edges(n, np.array([0, 1]), np.array([1, 0]))
    f1, _, cut1, _ = dinic_min_cut(g1, np.array([0]), np.array([1]))
    f2, _, cut2, _ = dinic_min_cut(g2, np.array([0]), np.array([1]))
    assert cut1 == 1 and cut2 == 2


def test_bisect_once_is_deterministic():
    v, e = unit_square_grid(8)
    a1 = bisect_once(v["ids"], v["lat"], v["lon"], e["tail"], e["head"])
    a2 = bisect_once(v["ids"], v["lat"], v["lon"], e["tail"], e["head"])
    assert np.array_equal(a1[0], a2[0])
    assert a1[1].best_job == a2[1].best_job
