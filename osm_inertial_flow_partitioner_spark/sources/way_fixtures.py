"""Deterministic way/node fixture — the single source of truth for both
the Spark DataFrames and the DuckDB oracle's VALUES clauses (so the two
can never drift). Covers: accepted/rejected highways, junction tag,
shared junction nodes, one-way (yes/-1), roundabout, maxspeed units
(plain/mph/knots/invalid), barriers, isolated vertices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# (way_id, highway, junction, oneway, maxspeed, nodes)
WAYS = [
    (1, "primary", None, None, "50", [1, 2, 3, 4]),
    (2, "residential", None, "yes", "30 mph", [3, 5, 6]),
    (3, "footway", None, None, None, [6, 7]),          # rejected highway
    (4, "service", "roundabout", None, None, [8, 9, 10, 8]),  # loop + roundabout
    (5, "secondary", None, "-1", "10 knots", [4, 11, 12]),
    (6, "tertiary", None, None, "not_a_number", [2, 13]),
    (7, "unclassified", None, None, None, [12]),        # too few nodes
    (8, "trunk", None, None, None, [14, 3, 15]),        # makes node 3 a junction
    (10, "residential", None, None, None, [16, 17, 18]),  # interior signal node 17
    # full-allowlist classes (osm_parser2.go:108-130): track 15 km/h,
    # private (not in roadTypeMaxSpeed2 -> default 30), motorroad 90,
    # residential_link (default 30); `private` also parses maxspeed
    (11, "track", None, None, None, [19, 20]),
    (12, "private", None, None, "60", [20, 21]),
    (13, "motorroad", None, None, None, [21, 22]),
    (14, "residential_link", None, None, None, [22, 23]),
]

# (node_id, lat, lon, barrier, access, signal)
NODES = [
    (1, 0.0, 0.0, None, None, False),
    (2, 0.0, 0.01, None, None, False),
    (3, 0.0, 0.02, None, None, True),
    (4, 0.0, 0.03, None, None, False),
    (5, 0.01, 0.02, "gate", "no", False),
    (6, 0.02, 0.02, None, None, False),
    (7, 0.03, 0.02, None, None, False),
    (8, 0.05, 0.05, None, None, False),
    (9, 0.05, 0.06, None, None, False),
    (10, 0.06, 0.06, None, None, False),
    (11, 0.0, 0.04, None, None, False),
    (12, 0.0, 0.05, None, None, False),
    (13, -0.01, 0.01, "bollard", "yes", False),  # barrier but access != no
    (14, 0.01, 0.015, None, None, False),
    (15, -0.01, 0.025, None, None, False),
    (16, 0.1, 0.0, None, None, False),
    (17, 0.1, 0.001, None, None, True),   # interior traffic light, close to 16
    (18, 0.1, 0.01, None, None, False),
    (19, 0.2, 0.0, None, None, False),
    (20, 0.2, 0.01, None, None, False),
    (21, 0.2, 0.02, None, None, False),
    (22, 0.2, 0.03, None, None, False),
    (23, 0.2, 0.04, None, None, False),
]

WAYS_SCHEMA = (
    "way_id long, highway string, junction string, oneway string, "
    "maxspeed string, nodes array<long>"
)
NODES_SCHEMA = (
    "node_id long, lat double, lon double, barrier string, access string, "
    "signal boolean"
)


def ways_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(WAYS, WAYS_SCHEMA)


def nodes_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(NODES, NODES_SCHEMA)


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, list):
        return "[" + ", ".join(str(x) for x in v) + "]"
    return str(v)


def ways_values_sql() -> str:
    rows = ", ".join("(" + ", ".join(_sql_lit(v) for v in w) + ")" for w in WAYS)
    return (
        f"(VALUES {rows}) AS ways(way_id, highway, junction, oneway, maxspeed, nodes)"
    )


def nodes_values_sql() -> str:
    rows = ", ".join("(" + ", ".join(_sql_lit(v) for v in n) + ")" for n in NODES)
    return f"(VALUES {rows}) AS nodes(node_id, lat, lon, barrier, access, signal)"


# directed edges around two intersections for the turn-table fixture
TURN_EDGES = [
    (1, 100), (100, 1), (2, 100), (100, 2), (100, 3), (3, 100),
    (100, 4), (4, 100), (4, 200), (200, 4), (200, 5), (5, 200),
]

# (via, from_node, to_node, kind)
RESTRICTIONS = [
    (100, 1, 3, "no"),       # no_left_turn 1 -> 100 -> 3
    (100, 2, 4, "only"),     # only_straight 2 -> 100 -> 4
    (100, 2, 3, "only"),     # conflicting 'only' -> everything NO_ENTRY
    (200, 4, 5, "no"),
    (200, 4, 5, "no"),       # duplicate 'no' (must not multiply rows)
]

TURN_EDGES_SCHEMA = "tail long, head long"
RESTRICTIONS_SCHEMA = "via long, from_node long, to_node long, kind string"

# way-keyed restrictions (from_way, via, to_way, kind) — the J2
# resolution input (real OSM restriction relations are way-keyed).
# Each row exercises one branch of osm_parser2.go:506-625:
WAY_RESTRICTIONS = [
    (1, 3, 2, "no"),    # resolves (3, 2, 5); exit 3->5 absent -> no-op
    (1, 3, 8, "no"),    # resolves (3, 2, 15): blocked
    (8, 3, 1, "only"),  # resolves (3, 14, 4): every other exit blocked
    (5, 4, 1, "no"),    # via at position 0 of one-way way 5 -> dropped
    (2, 6, 3, "no"),    # to_way rejected (footway) -> dropped
    (6, 2, 1, "only"),  # via at pos 0 of two-way: pred = NEXT node -> (2, 13, 3)
    (4, 9, 1, "no"),    # via 9 not a graph vertex, absent from to_way -> dropped
    (1, 2, 6, "no"),    # resolves (2, 1, 13): blocked
]

WAY_RESTRICTIONS_SCHEMA = "from_way long, via long, to_way long, kind string"


def way_restrictions_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(WAY_RESTRICTIONS, WAY_RESTRICTIONS_SCHEMA)


def way_restrictions_values_sql() -> str:
    rows = ", ".join(
        f"({fw}, {v}, {tw}, '{k}')" for fw, v, tw, k in WAY_RESTRICTIONS
    )
    return f"(VALUES {rows}) AS wr(from_way, via, to_way, kind)"


def turn_edges_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(TURN_EDGES, TURN_EDGES_SCHEMA)


def restrictions_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(RESTRICTIONS, RESTRICTIONS_SCHEMA)


def turn_edges_values_sql() -> str:
    rows = ", ".join(f"({t}, {h})" for t, h in TURN_EDGES)
    return f"(VALUES {rows}) AS e(tail, head)"


def restrictions_values_sql() -> str:
    rows = ", ".join(
        f"({v}, {f}, {t}, '{k}')" for v, f, t, k in RESTRICTIONS
    )
    return f"(VALUES {rows}) AS r(via, from_node, to_node, kind)"
