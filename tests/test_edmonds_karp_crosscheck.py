"""G8 cross-check: Edmonds-Karp and Dinic must agree on the max-flow
value (= min-cut edge count) for every fixture and direction job —
the max-flow min-cut theorem makes the value unique even when the cut
sides differ."""

import numpy as np
import pytest

from osm_inertial_flow_partitioner_spark.kernel.edmonds_karp import ek_min_cut
from osm_inertial_flow_partitioner_spark.kernel.inertial import (
    direction_jobs,
    pick_sources_sinks,
)
from osm_inertial_flow_partitioner_spark.kernel.maxflow import FlowGraph, dinic_min_cut
from osm_inertial_flow_partitioner_spark.sources.fixtures import FIXTURES


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_ek_equals_dinic_flow_value(name):
    v, e = FIXTURES[name]()
    n = len(v["ids"])
    g = FlowGraph.from_directed_edges(n, e["tail"], e["head"])
    lat, lon = v["lat"][v["ids"]], v["lon"][v["ids"]]
    for a, b in direction_jobs()[:4]:  # 4 directions is plenty per fixture
        proj = a * lon + b * lat
        src, snk = pick_sources_sinks(proj, 0.25)
        if len(src) == 0:
            continue
        df, dp, dc, _ = dinic_min_cut(g, src, snk)
        ef, ep, ec = ek_min_cut(g, src, snk)
        assert dc == ec, f"{name}: dinic {dc} != ek {ec}"
        # both cuts are valid: crossing capacity == flow for each engine
        eu, ev_ = g.eu, g.ev
        assert int((df[eu] & ~df[ev_]).sum()) == dc
        assert int((ef[eu] & ~ef[ev_]).sum()) == ec
