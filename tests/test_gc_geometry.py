"""F6-F8 great-circle geometry (`/root/reference/pkg/geo/s2_geo.go:11-61`)
and the 64-bit SimHash near-dup refine.

gc_project is validated against an independent numpy implementation of
the same S2 operation (unit-vector plane projection + arc clamp), not
against its own Catalyst expression tree.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_inertial_flow_partitioner_spark.functions.geo import (
    POINT_IN_LINE_TOLERANCE,
    central_angle_rad,
    gc_perp_distance_m,
    gc_project,
)


def _np_unit(lat, lon):
    la, lo = math.radians(lat), math.radians(lon)
    return np.array([math.cos(la) * math.cos(lo), math.cos(la) * math.sin(lo), math.sin(la)])


def _np_project(p, a, b):
    """Independent scalar s2.Project: plane drop + Sign-based arc test."""
    P, A, B = _np_unit(*p), _np_unit(*a), _np_unit(*b)
    n = np.cross(A, B)
    q = P - (P @ n / (n @ n)) * n
    on_arc = (np.cross(n, A) @ q > 0) and (np.cross(q, B) @ n > 0)
    if on_arc:
        r = q / np.linalg.norm(q)
    elif np.sum((P - A) ** 2) <= np.sum((P - B) ** 2):
        r = A
    else:
        r = B
    return math.degrees(math.asin(max(-1.0, min(1.0, r[2])))), math.degrees(
        math.atan2(r[1], r[0])
    )


def _run_project(spark, rows):
    df = spark.createDataFrame(
        rows, "plat double, plon double, alat double, alon double, blat double, blon double"
    )
    args = [F.col(c) for c in df.columns]
    jlat, jlon = gc_project(*args)
    return [
        (r["jlat"], r["jlon"])
        for r in df.select(jlat.alias("jlat"), jlon.alias("jlon")).collect()
    ]


def test_gc_project_matches_numpy_oracle(spark):
    rng = np.random.default_rng(7)
    rows = []
    for _ in range(200):
        plat, alat, blat = rng.uniform(-80, 80, 3)
        plon, alon, blon = rng.uniform(-179, 179, 3)
        rows.append(tuple(float(x) for x in (plat, plon, alat, alon, blat, blon)))
    got = _run_project(spark, rows)
    for row, (glat, glon) in zip(rows, got):
        elat, elon = _np_project(row[0:2], row[2:4], row[4:6])
        assert abs(glat - elat) < 1e-9 and abs(glon - elon) < 1e-9, (row, (glat, glon), (elat, elon))


def test_gc_project_clamps_to_endpoints(spark):
    # p sits west of a on the equator; segment runs east from a to b
    rows = [(0.0, -10.0, 0.0, 0.0, 0.0, 20.0)]
    ((jlat, jlon),) = _run_project(spark, rows)
    assert abs(jlat - 0.0) < 1e-12 and abs(jlon - 0.0) < 1e-12
    # p east of b clamps to b
    rows = [(0.0, 31.0, 0.0, 0.0, 0.0, 20.0)]
    ((jlat, jlon),) = _run_project(spark, rows)
    assert abs(jlat - 0.0) < 1e-12 and abs(jlon - 20.0) < 1e-9


def test_gc_perp_distance_known_case(spark):
    # point 1 degree north of the equatorial segment midpoint:
    # perpendicular distance = 1 degree of meridian arc = R * pi/180
    df = spark.range(1).select(
        gc_perp_distance_m(
            F.lit(1.0), F.lit(10.0), F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(20.0)
        ).alias("d")
    )
    (d,) = df.collect()[0]
    expect = 6371.0 * math.pi / 180.0 * 1000.0
    assert abs(d - expect) / expect < 1e-6


def test_central_angle_and_position_rule(spark):
    # polyline (0,0)-(0,10)-(10,10); the on-segment test reproduces the
    # reference's pos rule: projection of (0,4) lies on segment 0 -> the
    # diff |d(p,c0)+d(p,c1)-d(c0,c1)| vanishes there and not on seg 1
    df = spark.range(1).select(
        (
            central_angle_rad(F.lit(0.0), F.lit(4.0), F.lit(0.0), F.lit(0.0))
            + central_angle_rad(F.lit(0.0), F.lit(4.0), F.lit(0.0), F.lit(10.0))
            - central_angle_rad(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(10.0))
        ).alias("diff0"),
        (
            central_angle_rad(F.lit(0.0), F.lit(4.0), F.lit(0.0), F.lit(10.0))
            + central_angle_rad(F.lit(0.0), F.lit(4.0), F.lit(10.0), F.lit(10.0))
            - central_angle_rad(F.lit(0.0), F.lit(10.0), F.lit(10.0), F.lit(10.0))
        ).alias("diff1"),
    )
    r = df.collect()[0]
    assert abs(r["diff0"]) < POINT_IN_LINE_TOLERANCE
    assert r["diff1"] > POINT_IN_LINE_TOLERANCE


def test_simhash64_near_dups_exact_dup_is_hamming_zero(spark):
    from osm_inertial_flow_partitioner_spark.operators.dedup import (
        simhash64,
        simhash64_near_dups,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "entirely different tokens describing other topics here"),
        ],
        "doc_id long, text string",
    )
    sh = {r["doc_id"]: (r["sim_hi"], r["sim_lo"]) for r in simhash64(docs).collect()}
    assert sh[1] == sh[2]
    assert all(0 <= v < (1 << 32) for pair in sh.values() for v in pair)
    pairs = {(r["doc1"], r["doc2"]): r["hamming"] for r in simhash64_near_dups(docs, k=3).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash64_banding_lossless_for_k3(spark):
    """Pigeonhole: any pair at hamming <= 3 shares a clean 16-bit band,
    so the bucket join returns exactly the brute-force pair set."""
    from osm_inertial_flow_partitioner_spark.operators.dedup import (
        simhash64,
        simhash64_near_dups,
    )

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(24):
        toks = [words[j] for j in range(len(words)) if (i >> (j % 5)) & 1 or j < 3]
        rows.append((i, " ".join(toks + [f"w{i % 4}"])))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r["doc_id"]: (r["sim_hi"], r["sim_lo"]) for r in simhash64(docs).collect()}
    brute = set()
    ids = sorted(sh)
    for x in ids:
        for y in ids:
            if x < y:
                h = bin(sh[x][0] ^ sh[y][0]).count("1") + bin(
                    sh[x][1] ^ sh[y][1]
                ).count("1")
                if h <= 3:
                    brute.add((x, y))
    got = {(r["doc1"], r["doc2"]) for r in simhash64_near_dups(docs, k=3).collect()}
    assert got == brute
