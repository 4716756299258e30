"""Way-graph construction operators — the reference's parse/build phase
re-expressed relationally (SURVEY.md §2.G), over generic ``ways`` /
``nodes`` tables:

- S2 way filter: accept iff highway in allowlist or junction tag set,
  and >= 2 nodes (`/root/reference/pkg/osmparser/osm_parser2.go:1055-1066`);
- S3 node semi-join: only nodes referenced by accepted ways
  (`osm_parser2.go:309-350`);
- E1 way -> segments at junctions (nodes shared by >1 way): the
  junction closes one segment and opens the next, appearing in both
  (`osm_parser2.go:687-808`, split loop :782-806) — posexplode +
  prefix-sum window + a duplicated junction row;
- E2 loop-segment split (`osm_parser2.go:829-836`): a segment whose
  first and last node coincide splits into [0, n-2] + [n-2, n-1]
  (single-way roundabouts keep their edges); a 2-node self-hop drops;
- E3 barrier splitting with node cloning (`osm_parser2.go:840-883`);
- F12 maxspeed parse with mph/km/h/knots units + per-class fallback
  (`osm_parser2.go:744-769`, `roadTypeMaxSpeed2` :1010-1049) and the
  ETA weight dist_m/(speed*1000/60) minutes (:935);
- F13 one-way / direction resolution (`osm_parser2.go:700-722,810-823`);
- E4 edge materialization: haversine hop sums, per-direction rows,
  J4 (tail, head) dedup (`osm_parser2.go:885-1008`);
- E6 dummy self-edge for isolated vertices (`osm_parser2.go:418-433`).

All pure Catalyst (explode + windows + when-chains); the geometry
simplification (F10 RDP) and polyline encoding (F11) live in
functions/geometry.py as vectorized pandas UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geo import haversine_km

# osm_parser2.go:108-130 — the FULL reference allowlist (21 classes)
ACCEPTED_HIGHWAY = [
    "motorway", "motorway_link", "trunk", "trunk_link",
    "primary", "primary_link", "secondary", "secondary_link",
    "residential", "residential_link", "service",
    "tertiary", "tertiary_link", "road", "track",
    "unclassified", "undefined", "unknown", "living_street",
    "private", "motorroad",
]

# roadTypeMaxSpeed2 (osm_parser2.go:1010-1049), km/h fallbacks — exact
# reference values; classes absent from the switch (residential_link,
# undefined, unknown, private) take the default 30 in parse_speed
DEFAULT_SPEED = {
    "motorway": 100.0, "trunk": 70.0, "primary": 65.0, "secondary": 60.0,
    "tertiary": 50.0, "unclassified": 40.0, "residential": 30.0,
    "service": 20.0, "motorway_link": 70.0, "trunk_link": 65.0,
    "primary_link": 60.0, "secondary_link": 50.0, "tertiary_link": 40.0,
    "living_street": 5.0, "road": 20.0, "track": 15.0, "motorroad": 90.0,
}

BARRIER_KINDS = ["bollard", "swing_gate", "jersey_barrier", "lift_gate", "block", "gate"]


def accepted_ways(ways: DataFrame) -> DataFrame:
    """S2: Catalyst filter, pushed to the scan."""
    return ways.filter(
        (
            F.col("highway").isin(ACCEPTED_HIGHWAY)
            | (F.coalesce(F.col("junction"), F.lit("")) != "")
        )
        & (F.size("nodes") >= 2)
    )


def referenced_nodes(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """S3: left-semi join — only nodes used by accepted ways."""
    used = accepted_ways(ways).select(F.explode("nodes").alias("node_id")).distinct()
    return nodes.join(used, "node_id", "left_semi")


def way_segments(ways: DataFrame) -> DataFrame:
    """E1: split accepted ways at junction nodes (nodes appearing in more
    than one accepted way). Junction rows appear in BOTH the segment they
    close and the one they open (osm_parser2.go:782-806).

    Returns (way_id, seg, pos, node_id) — pos is the node's position in
    the original way."""
    aw = accepted_ways(ways)
    exploded = aw.select("way_id", F.posexplode("nodes").alias("pos", "node_id"))
    way_count = exploded.groupBy("node_id").agg(
        F.countDistinct("way_id").alias("n_ways")
    )
    e = exploded.join(way_count, "node_id")
    n_nodes = aw.select("way_id", F.size("nodes").alias("n_nodes"))
    e = e.join(n_nodes, "way_id").withColumn(
        "is_junc",
        (
            (F.col("n_ways") > 1)
            & (F.col("pos") > 0)
            & (F.col("pos") < F.col("n_nodes") - 1)
        ).cast("int"),
    )
    w = Window.partitionBy("way_id").orderBy("pos")
    e = e.withColumn(
        "seg",
        F.sum("is_junc").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    # junction row opens segment `seg`; duplicate it as the closer of seg-1
    closers = e.filter(F.col("is_junc") == 1).withColumn("seg", F.col("seg") - 1)
    return (
        e.select("way_id", "seg", "pos", "node_id")
        .unionByName(closers.select("way_id", "seg", "pos", "node_id"))
    )


def split_loops(segs: DataFrame) -> DataFrame:
    """E2: loop-segment handling (processSegment,
    osm_parser2.go:829-836). Per (way_id, seg) with first_node ==
    last_node:

    - 2 nodes: the degenerate self-hop is dropped entirely;
    - > 2 nodes (every single-way roundabout): split into nodes
      [0, n-2] (loop part 0) and [n-2, n-1] (loop part 1) — the node at
      position n-2 appears in both, so the loop contributes the long arc
      plus the closing hop as two separate edges.

    Returns (way_id, seg, lpart, pos, node_id); non-loop segments pass
    through with lpart = 0."""
    per = segs.groupBy("way_id", "seg").agg(
        F.min_by("node_id", "pos").alias("fn"),
        F.max_by("node_id", "pos").alias("ln"),
        F.count("*").alias("n_seg"),
    )
    w = Window.partitionBy("way_id", "seg").orderBy("pos")
    e = segs.join(per, ["way_id", "seg"]).withColumn("rk", F.row_number().over(w))
    is_self_hop = (F.col("n_seg") == 2) & (F.col("fn") == F.col("ln"))
    is_loop = (F.col("n_seg") > 2) & (F.col("fn") == F.col("ln"))
    part0 = e.filter(
        ~is_self_hop & (~is_loop | (F.col("rk") <= F.col("n_seg") - 1))
    ).select("way_id", "seg", F.lit(0).alias("lpart"), "pos", "node_id")
    part1 = e.filter(is_loop & (F.col("rk") >= F.col("n_seg") - 1)).select(
        "way_id", "seg", F.lit(1).alias("lpart"), "pos", "node_id"
    )
    return part0.unionByName(part1)


def parse_speed(maxspeed, highway) -> F.Column:
    """F12: parse '50', '30 mph', '10 knots', '60 km/h'; fallback to the
    per-class default. Returns km/h (double)."""
    num = F.regexp_extract(maxspeed, r"^\s*(\d+(?:\.\d+)?)", 1).try_cast("double")
    is_mph = maxspeed.rlike("(?i)mph")
    is_knots = maxspeed.rlike("(?i)knots?")
    parsed = (
        F.when(is_mph, num * 1.609344)
        .when(is_knots, num * 1.852)
        .otherwise(num)
    )
    fallback = F.lit(30.0)
    for k, v in sorted(DEFAULT_SPEED.items()):
        fallback = F.when(highway == k, F.lit(v)).otherwise(fallback)
    return F.when(num.isNotNull() & (num > 0), parsed).otherwise(fallback)


def oneway_flags(oneway, junction) -> tuple[F.Column, F.Column]:
    """F13: (is_oneway, reversed). 'yes'/'1'/'true'/'-1' are one-way;
    roundabouts are one-way; '-1' flips direction
    (osm_parser2.go:700-722,810-823)."""
    ow = F.coalesce(oneway, F.lit(""))
    jc = F.coalesce(junction, F.lit(""))
    is_oneway = ow.isin("yes", "1", "true", "-1") | (jc == "roundabout")
    return is_oneway, ow == "-1"


def segment_edges(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """E4: materialize directed edges per (way, segment): sum haversine
    hop lengths (meters), ETA weight in minutes, one row per direction
    unless one-way, then J4 dedup keeping the minimum-weight edge per
    (tail, head).

    Returns (tail, head, dist_m, weight_min) rounded for oracle parity."""
    segs = split_loops(way_segments(ways))  # E2 before materialization
    pts = segs.join(nodes.select("node_id", "lat", "lon"), "node_id")
    w = Window.partitionBy("way_id", "seg", "lpart").orderBy("pos")
    hop = haversine_km(
        F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
    ) * 1000.0
    per_seg = (
        pts.withColumn("hop_m", F.coalesce(hop, F.lit(0.0)))
        .groupBy("way_id", "seg", "lpart")
        .agg(
            F.sum("hop_m").alias("dist_m"),
            F.min_by("node_id", "pos").alias("first_node"),
            F.max_by("node_id", "pos").alias("last_node"),
            F.count("*").alias("n_pts"),
        )
        .filter(F.col("n_pts") >= 2)
        # addEdge's from==to guard (osm_parser2.go:896-898): interior
        # duplicate nodes, not loops — loops were split above
        .filter(F.col("first_node") != F.col("last_node"))
    )
    meta = ways.select("way_id", "highway", "junction", "oneway", "maxspeed")
    e = per_seg.join(meta, "way_id")
    speed = parse_speed(F.col("maxspeed"), F.col("highway"))
    is_ow, rev = oneway_flags(F.col("oneway"), F.col("junction"))
    e = e.withColumn("speed_kmh", speed).withColumn(
        "weight_min", F.col("dist_m") / (F.col("speed_kmh") * 1000.0 / 60.0)
    )
    fwd = e.select(
        F.when(rev, F.col("last_node")).otherwise(F.col("first_node")).alias("tail"),
        F.when(rev, F.col("first_node")).otherwise(F.col("last_node")).alias("head"),
        "dist_m",
        "weight_min",
    )
    bwd = e.filter(~is_ow).select(
        F.col("last_node").alias("tail"),
        F.col("first_node").alias("head"),
        "dist_m",
        "weight_min",
    )
    edges = fwd.unionByName(bwd)
    # J4: dedup parallel (tail, head) edges, keep the fastest
    return (
        edges.groupBy("tail", "head")
        .agg(
            F.round(F.min("weight_min"), 6).alias("weight_min"),
            F.round(F.min("dist_m"), 4).alias("dist_m"),
        )
    )


def traffic_light_nodes(segs: DataFrame, nodes: DataFrame) -> DataFrame:
    """E5: traffic-light pull-to-endpoint (addEdge,
    osm_parser2.go:906-920). An interior node of an edge segment that
    carries a traffic-light tag transfers it to the CLOSER endpoint
    (haversine; ties go to the last endpoint, matching the reference's
    strict ``<``). Endpoint nodes keep their own tags. Barrier clones
    (node_id >= the 1e9 offset) share the original's coordinates but
    never its tag (copyNode copies coords only).

    One relational pass: the reference mutates a global tag map while
    iterating ways, so a tag pulled onto an endpoint by an early way can
    be re-pulled by a later way that sees that endpoint as interior —
    a rare cascade this one-pass form intentionally flattens (each
    original tag moves at most once).

    Input: barrier-split segments (way_id, seg, lpart, sub, pos,
    node_id). Returns (node_id, has_light) for every endpoint node."""
    keys = [c for c in ("way_id", "seg", "lpart", "sub") if c in segs.columns]
    orig = F.when(
        F.col("node_id") >= F.lit(10**9), F.col("node_id") - F.lit(10**9)
    ).otherwise(F.col("node_id"))
    nd = nodes.select(
        F.col("node_id").alias("orig_id"),
        "lat",
        "lon",
        F.coalesce(F.col("signal"), F.lit(False)).alias("sig0"),
    )
    pts = (
        segs.withColumn("orig_id", orig)
        .join(nd, "orig_id")
        .withColumn(
            "sig", F.col("sig0") & (F.col("node_id") < F.lit(10**9))
        )
    )
    per = pts.groupBy(*keys).agg(
        F.min_by("node_id", "pos").alias("f_node"),
        F.min_by("lat", "pos").alias("f_lat"),
        F.min_by("lon", "pos").alias("f_lon"),
        F.max_by("node_id", "pos").alias("l_node"),
        F.max_by("lat", "pos").alias("l_lat"),
        F.max_by("lon", "pos").alias("l_lon"),
        F.min("pos").alias("min_pos"),
        F.max("pos").alias("max_pos"),
        F.count("*").alias("n_pts"),
    ).filter(F.col("n_pts") >= 2)
    interior = (
        pts.join(per, keys)
        .filter(
            F.col("sig")
            & (F.col("pos") > F.col("min_pos"))
            & (F.col("pos") < F.col("max_pos"))
        )
    )
    d_from = haversine_km(F.col("lat"), F.col("lon"), F.col("f_lat"), F.col("f_lon"))
    d_to = haversine_km(F.col("lat"), F.col("lon"), F.col("l_lat"), F.col("l_lon"))
    pulled = interior.select(
        F.when(d_from < d_to, F.col("f_node")).otherwise(F.col("l_node")).alias("ep")
    ).distinct()
    endpoints = (
        per.select(F.col("f_node").alias("node_id"))
        .union(per.select(F.col("l_node").alias("node_id")))
        .distinct()
    )
    own = nd.select(F.col("orig_id").alias("node_id"), "sig0")
    return (
        endpoints.join(own, "node_id", "left")
        .join(pulled.withColumnRenamed("ep", "node_id").withColumn("pl", F.lit(True)), "node_id", "left")
        .select(
            "node_id",
            (
                F.coalesce(F.col("sig0"), F.lit(False))
                | F.coalesce(F.col("pl"), F.lit(False))
            ).alias("has_light"),
        )
    )


def add_dummy_self_edges(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """E6: any referenced vertex with out-degree 0 gets a zero-weight
    self-loop (CRP query invariant, osm_parser2.go:418-433)."""
    tails = edges.select(F.col("tail").alias("node_id")).distinct()
    isolated = nodes.select("node_id").join(tails, "node_id", "left_anti")
    dummies = isolated.select(
        F.col("node_id").alias("tail"),
        F.col("node_id").alias("head"),
        F.lit(0.0).alias("weight_min"),
        F.lit(0.0).alias("dist_m"),
    )
    return edges.unionByName(dummies)


def split_at_barriers(segs: DataFrame, nodes: DataFrame, id_offset: int = 10**9) -> DataFrame:
    """E3: at barrier nodes (barrier kind in the list AND access = 'no'),
    end the segment and clone the node with a fresh id (node_id +
    id_offset) so the two sides disconnect (osm_parser2.go:840-883;
    processSegment2 runs AFTER the loop split, so each loop part splits
    independently).

    Input: way_segments output, optionally already loop-split (lpart
    column; added as 0 when absent). Output adds (sub long)."""
    if "lpart" not in segs.columns:
        segs = segs.withColumn("lpart", F.lit(0))
    b = nodes.select(
        "node_id",
        (
            F.col("barrier").isin(BARRIER_KINDS)
            & (F.coalesce(F.col("access"), F.lit("")) == "no")
        ).alias("is_barrier"),
    )
    e = segs.join(b, "node_id", "left").na.fill({"is_barrier": False})
    w = Window.partitionBy("way_id", "seg", "lpart").orderBy("pos")
    rk = F.row_number().over(w)
    cnt = F.count("*").over(Window.partitionBy("way_id", "seg", "lpart"))
    e = e.withColumn("rk", rk).withColumn("n", cnt).withColumn(
        "is_split",
        (F.col("is_barrier") & (F.col("rk") > 1) & (F.col("rk") < F.col("n"))).cast("int"),
    )
    e = e.withColumn(
        "sub",
        F.sum("is_split").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    # the barrier node closes `sub - 1` under its ORIGINAL id and opens
    # `sub` as a CLONE with a fresh id (sides must disconnect)
    closers = e.filter(F.col("is_split") == 1).withColumn("sub", F.col("sub") - 1)
    openers = e.filter(F.col("is_split") == 1).withColumn(
        "node_id", F.col("node_id") + F.lit(id_offset)
    )
    rest = e.filter(F.col("is_split") == 0)
    cols = ["way_id", "seg", "lpart", "sub", "pos", "node_id"]
    return (
        rest.select(*cols)
        .unionByName(closers.select(*cols))
        .unionByName(openers.select(*cols))
    )
