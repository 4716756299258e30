"""Way-graph construction + geometry kernels (reference parse phase)."""

import pytest
from pyspark.sql import functions as F

from osm_inertial_flow_partitioner_spark.functions.geometry import (
    polyline_encode,
    rdp_simplify,
)
from osm_inertial_flow_partitioner_spark.operators.waygraph import (
    segment_edges,
    split_at_barriers,
    split_loops,
    way_segments,
)
from osm_inertial_flow_partitioner_spark.sources.way_fixtures import (
    nodes_df,
    ways_df,
)


def test_polyline_encode_google_reference_vector():
    # the published example from Google's polyline algorithm docs
    pts = [
        {"lat": 38.5, "lon": -120.2},
        {"lat": 40.7, "lon": -120.95},
        {"lat": 43.252, "lon": -126.453},
    ]
    assert polyline_encode(pts) == "_p~iF~ps|U_ulLnnqC_mqNvxq`@"


def test_rdp_keeps_endpoints_and_corners():
    # straight line with a tiny wiggle below 1 m -> collapses to endpoints
    line = [{"lat": 0.0, "lon": 0.0}] + [
        {"lat": 1e-9, "lon": 0.001 * i} for i in range(1, 9)
    ] + [{"lat": 0.0, "lon": 0.01}]
    out = rdp_simplify(line)
    assert out[0] == line[0] and out[-1] == line[-1]
    assert len(out) == 2
    # right angle -> corner survives
    corner = [
        {"lat": 0.0, "lon": 0.0},
        {"lat": 0.0, "lon": 0.01},
        {"lat": 0.01, "lon": 0.01},
    ]
    assert len(rdp_simplify(corner)) == 3


def test_junction_node_in_both_segments(spark):
    segs = way_segments(ways_df(spark)).collect()
    # node 2 (ways 1+6) and node 3 (ways 1,2,8) are junctions interior to
    # way 1, so way 1 splits into 3 segments with both junctions doubled
    w1 = [(r["seg"], r["node_id"]) for r in segs if r["way_id"] == 1]
    assert sorted(s for s, n in w1 if n == 2) == [0, 1]
    assert sorted(s for s, n in w1 if n == 3) == [1, 2]
    # way 2: node 3 at position 0 -> not a split point there
    w2 = [(r["seg"], r["node_id"]) for r in segs if r["way_id"] == 2]
    assert {s for s, _ in w2} == {0}


def test_loop_way_splits_not_drops(spark):
    # E2 (osm_parser2.go:829-836): the closed roundabout way 4
    # [8, 9, 10, 8] splits into [8, 9, 10] + [10, 8] — its edges MUST
    # exist (round-1 behavior silently dropped every single-way loop)
    segs = split_loops(way_segments(ways_df(spark)))
    w4 = [
        (r["lpart"], r["pos"], r["node_id"])
        for r in segs.filter(F.col("way_id") == 4).collect()
    ]
    assert sorted(w4) == [(0, 0, 8), (0, 1, 9), (0, 2, 10), (1, 2, 10), (1, 3, 8)]
    edges = segment_edges(ways_df(spark), nodes_df(spark))
    pairs = {
        (r["tail"], r["head"])
        for r in edges.filter(F.col("tail").isin(8, 9, 10)).collect()
    }
    # roundabout tag makes way 4 one-way: forward arcs only
    assert pairs == {(8, 10), (10, 8)}


def test_two_node_self_hop_dropped(spark):
    # a 2-node closed way produces NO edge rows (processSegment skip)
    ways = ways_df(spark).sparkSession.createDataFrame(
        [(99, "residential", None, None, None, [50, 50])],
        "way_id long, highway string, junction string, oneway string, "
        "maxspeed string, nodes array<long>",
    )
    segs = split_loops(way_segments(ways))
    assert segs.count() == 0


def test_barrier_split_clones_node(spark):
    segs = way_segments(ways_df(spark))
    out = split_at_barriers(segs, nodes_df(spark)).collect()
    # node 5 (gate, access=no) is interior in way 2's single segment
    w2 = [r for r in out if r["way_id"] == 2]
    ids = sorted(r["node_id"] for r in w2)
    assert 5 in ids and 5 + 10**9 in ids  # original closes, clone opens
    subs_of_orig = {r["sub"] for r in w2 if r["node_id"] == 5}
    subs_of_clone = {r["sub"] for r in w2 if r["node_id"] == 5 + 10**9}
    assert subs_of_orig == {0} and subs_of_clone == {1}
    # node 13 (bollard but access != 'no') never splits way 6
    w6 = [r for r in out if r["way_id"] == 6]
    assert {r["sub"] for r in w6} == {0}
