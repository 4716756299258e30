"""Spatial operators: PIP vs brute force, bucketed kNN vs exact
broadcast baseline, grid-cell function properties, skew helpers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_inertial_flow_partitioner_spark.functions.geo import (
    cell_parent,
    grid_cell,
    grid_disk,
)
from osm_inertial_flow_partitioner_spark.operators.spatial import (
    hot_cells,
    knn_lookup_broadcast,
    knn_lookup_bucketed,
    make_polygons_df,
    point_in_polygon_join,
    salted_repartition,
)


@pytest.fixture(scope="module")
def points(spark):
    rng = np.random.default_rng(7)
    lat = rng.uniform(-60, 60, 400)
    lon = rng.uniform(-170, 170, 400)
    # add a hot cluster for skew tests
    lat[:120] = 10 + rng.uniform(-0.5, 0.5, 120)
    lon[:120] = 20 + rng.uniform(-0.5, 0.5, 120)
    return spark.createDataFrame(
        [(i, float(lat[i]), float(lon[i])) for i in range(400)],
        "entity_id long, lat double, lon double",
    ).cache()


def _brute_pip(points_rows, ring):
    """Shapely-free even-odd reference implementation."""
    out = []
    rings = ring if isinstance(ring[0], list) else [ring]
    for pid, lat, lon in points_rows:
        inside = False
        for r in rings:
            for (y1, x1), (y2, x2) in zip(r, r[1:] + r[:1]):
                if (y1 > lat) != (y2 > lat):
                    xin = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
                    if lon < xin:
                        inside = not inside
        if inside:
            out.append(pid)
    return sorted(out)


def test_pip_join_matches_bruteforce(spark, points):
    polys = [
        {"boundary_id": 1, "name": "rect", "ring": [(-20.0, -40.0), (-20.0, 10.0), (25.0, 10.0), (25.0, -40.0)]},
        {"boundary_id": 2, "name": "concave", "ring": [(0.0, 100.0), (40.0, 100.0), (40.0, 140.0), (20.0, 120.0), (0.0, 140.0)]},
    ]
    pdf = make_polygons_df(spark, polys, res=4)
    got = point_in_polygon_join(points, pdf, res=4)
    rows = points.select("entity_id", "lat", "lon").collect()
    prows = [(r["entity_id"], r["lat"], r["lon"]) for r in rows]
    for p in polys:
        exp = _brute_pip(prows, p["ring"])
        g = sorted(
            r["entity_id"]
            for r in got.filter(F.col("boundary_id") == p["boundary_id"]).collect()
        )
        assert g == exp, f"boundary {p['boundary_id']}"


def test_pip_join_multipolygon_with_hole(spark, points):
    # multipolygon boundary: shell containing the planted hot cluster,
    # a hole cut from the cluster's center, and a second disjoint shell
    polys = [
        {
            "boundary_id": 7,
            "name": "holed_multi",
            "rings": [
                [(5.0, 15.0), (5.0, 25.0), (15.0, 25.0), (15.0, 15.0)],
                [(9.0, 19.0), (9.0, 21.0), (11.0, 21.0), (11.0, 19.0)],
                [(-50.0, -150.0), (-50.0, -100.0), (-20.0, -100.0), (-20.0, -150.0)],
            ],
        },
    ]
    pdf = make_polygons_df(spark, polys, res=4)
    got = point_in_polygon_join(points, pdf, res=4)
    rows = points.select("entity_id", "lat", "lon").collect()
    prows = [(r["entity_id"], r["lat"], r["lon"]) for r in rows]
    rings = [list(r) for r in polys[0]["rings"]]
    exp = _brute_pip(prows, rings)
    g = sorted(r["entity_id"] for r in got.collect())
    assert g == exp
    # the fixture is non-degenerate: some points in the shell, some
    # excluded by the hole, some caught by the second shell
    in_hole = [
        pid for pid, la, lo in prows if 9.0 < la < 11.0 and 19.0 < lo < 21.0
    ]
    in_second = [
        pid for pid, la, lo in prows if -50.0 < la < -20.0 and -150.0 < lo < -100.0
    ]
    assert len(exp) > 0 and len(in_hole) > 0 and len(in_second) > 0
    assert not (set(in_hole) & set(g))
    assert set(in_second) <= set(g)


def test_knn_bucketed_matches_broadcast(spark, points):
    queries = spark.createDataFrame(
        [(0, 10.2, 20.3), (1, -50.0, 100.0), (2, 0.0, 0.0)],
        "query_id long, lat double, lon double",
    )
    exact = knn_lookup_broadcast(points, queries, k=5).collect()
    # res low enough that ring-1 disks span the data gaps
    bucketed = knn_lookup_bucketed(points, queries, k=5, res=2, ring=1).collect()
    key = lambda r: (r["query_id"], r["rk"])
    e = {key(r): r["entity_id"] for r in exact}
    b = {key(r): r["entity_id"] for r in bucketed}
    assert e == b


def test_grid_cell_hierarchy_property(spark):
    df = spark.range(500).select(
        (F.col("id") * 13 % 1200 / 10.0 - 59.95).alias("lat"),
        (F.col("id") * 29 % 3400 / 10.0 - 169.95).alias("lon"),
    )
    r = df.select(
        grid_cell(F.col("lat"), F.col("lon"), 8).alias("fine"),
        grid_cell(F.col("lat"), F.col("lon"), 4).alias("coarse"),
    ).withColumn("parent", cell_parent(F.col("fine"), 8, 4))
    assert r.filter(F.col("parent") != F.col("coarse")).count() == 0


def test_grid_disk_contains_self_and_neighbors(spark):
    df = spark.createDataFrame([(10.0, 20.0)], "lat double, lon double")
    row = df.select(
        grid_cell(F.col("lat"), F.col("lon"), 4).alias("c"),
        grid_disk(grid_cell(F.col("lat"), F.col("lon"), 4), 4, 1).alias("disk"),
    ).collect()[0]
    assert row["c"] in row["disk"]
    assert len(row["disk"]) == 9  # interior cell


def test_hot_cells_and_salting(spark, points):
    hots = hot_cells(points, res=4, top=4, min_share=0.05)
    assert len(hots) >= 1  # the planted cluster
    salted = salted_repartition(points.withColumn("cell", grid_cell(F.col("lat"), F.col("lon"), 4)), "cell", n_salt=4, hot_keys=hots)
    counts = salted.groupBy("cell", "salt").count().collect()
    hot_salts = {r["salt"] for r in counts if r["cell"] == hots[0]}
    assert len(hot_salts) > 1  # hot cell actually fanned out


def test_partial_topk_matches_global_window(spark):
    # the bounded per-partition reducer must be EXACT: staging the
    # candidate set through it and then ranking yields precisely the
    # global-window top-k (superset property under a total order)
    from pyspark.sql import Window

    from osm_inertial_flow_partitioner_spark.operators.topk import partial_topk

    rng = np.random.default_rng(3)
    rows = [
        (int(rng.integers(0, 50)), i, float(rng.uniform(0, 100)))
        for i in range(5000)
    ]
    # planted ties at the k boundary to exercise the tiebreaker
    rows += [(99, 10_000 + j, 1.0) for j in range(10)]
    df = spark.createDataFrame(rows, "qid long, eid long, d double").repartition(13)
    # tiny compact_rows forces the mid-stream re-compaction path
    red = partial_topk(df, ["qid"], ["d", "eid"], 4, compact_rows=64)
    w = Window.partitionBy("qid").orderBy(F.col("d").asc(), F.col("eid").asc())

    def topk(frame):
        return (
            frame.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 4)
            .select("qid", "eid", "d", "rk")
        )

    got = sorted(map(tuple, topk(red).collect()))
    want = sorted(map(tuple, topk(df).collect()))
    assert got == want
    # the reduction is genuinely bounded: <= k rows per (qid, partition)
    per_qid = {r["qid"]: r["c"] for r in red.groupBy("qid").agg(F.count("*").alias("c")).collect()}
    assert max(per_qid.values()) <= 4 * 13


def test_salting_is_replay_stable(spark, points):
    # content-hash salt: the same row gets the same salt regardless of
    # partition layout (a task retry after an upstream change must not
    # re-salt rows differently)
    pts = points.withColumn("cell", grid_cell(F.col("lat"), F.col("lon"), 4))
    a = salted_repartition(pts.repartition(3), "cell", n_salt=4)
    b = salted_repartition(pts.repartition(17), "cell", n_salt=4)
    key = ["entity_id"] if "entity_id" in pts.columns else pts.columns[:1]
    mism = (
        a.select(*key, "salt")
        .join(b.select(*key, F.col("salt").alias("salt_b")), key)
        .filter(F.col("salt") != F.col("salt_b"))
        .count()
    )
    assert mism == 0
