"""Turn tables + turn-restriction application (E7/J2).

The reference flattens per-vertex in-degree x out-degree turn matrices
initialized to NONE and applies restrictions resolved through
from-way -> via-node -> to-way joins
(`/root/reference/pkg/osmparser/osm_parser2.go:435-641`; enum
`pkg/constant.go:4-13`): ``no_*`` restrictions mark the (entry, exit)
pair NO_ENTRY; ``only_*`` restrictions mark every OTHER exit from that
entry NO_ENTRY (:506-625). (The reference's U-turn block :447-504 is
dead code and intentionally not reproduced.)

Here the turn table is long-form relational — (via, from_node, to_node,
turn_type) — built from two equi-joins of the directed edge list with
itself, and restrictions are applied with left joins; the matrix layout
is an executor-local physical detail the relational form replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .waygraph import accepted_ways, oneway_flags

# pkg/constant.go:4-13
LEFT_TURN, RIGHT_TURN, STRAIGHT_ON, U_TURN, NO_ENTRY, NONE = range(6)


def resolve_way_restrictions(
    ways: DataFrame, way_restrictions: DataFrame, edges: DataFrame
) -> DataFrame:
    """J2: resolve way-keyed restrictions (from_way, via, to_way, kind)
    to node triples (via, from_node, to_node, kind) through the way node
    lists, mirroring the reference's store-turn-restrictions pass
    (`/root/reference/pkg/osmparser/osm_parser2.go:506-625`):

    - drop if from_way == to_way, via is not a graph vertex (an edge
      endpoint), or either way is not accepted;
    - i = FIRST position of via in from_way's nodes (drop if absent);
      drop if i == 0 and from_way is one-way (no predecessor);
    - from_node = nodes[i+1] when i == 0 (entering backward on a
      two-way road) else nodes[i-1]; drop if it equals via;
    - to_node = to_way nodes[j+1] for the FIRST j < len-1 with
      nodes[j] == via (drop if absent or equal to via).

    Entry/exit arcs that don't exist in the edge list become no-ops in
    ``turn_table`` (the reference's entryID/exitID-not-found skips fall
    out of the pairs join; an 'only' whose exit is missing blocks every
    exit, exactly like the pre-marked NO_ENTRY row, :573-583)."""
    aw = accepted_ways(ways)
    is_ow, _rev = oneway_flags(F.col("oneway"), F.col("junction"))
    fw = aw.select(
        F.col("way_id").alias("from_way"),
        F.col("nodes").alias("fnodes"),
        is_ow.alias("is_ow"),
    )
    tw = aw.select(F.col("way_id").alias("to_way"), F.col("nodes").alias("tnodes"))
    endpoints = (
        edges.select(F.col("tail").alias("via"))
        .union(edges.select(F.col("head").alias("via")))
        .distinct()
    )
    r = (
        way_restrictions.filter(F.col("from_way") != F.col("to_way"))
        .join(endpoints, "via", "left_semi")
        .join(F.broadcast(fw), "from_way")
        .join(F.broadcast(tw), "to_way")
        .withColumn("i", F.array_position(F.col("fnodes"), F.col("via")))
        .filter(F.col("i") > 0)
        .filter(~((F.col("i") == 1) & F.col("is_ow")))
        .withColumn(
            "from_node",
            F.when(F.col("i") == 1, F.element_at("fnodes", 2)).otherwise(
                F.element_at("fnodes", (F.col("i") - 1).cast("int"))
            ),
        )
        .filter(F.col("from_node") != F.col("via"))
        .withColumn(
            "j",
            F.array_position(
                F.slice(F.col("tnodes"), 1, F.size("tnodes") - 1), F.col("via")
            ),
        )
        .filter(F.col("j") > 0)
        .withColumn("to_node", F.element_at("tnodes", (F.col("j") + 1).cast("int")))
        .filter(F.col("to_node") != F.col("via"))
    )
    return r.select("via", "from_node", "to_node", "kind")


def turn_table(edges: DataFrame, restrictions: DataFrame) -> DataFrame:
    """edges: directed (tail, head); restrictions: (via, from_node,
    to_node, kind) with kind in ('no', 'only').

    Returns (via, from_node, to_node, turn_type) for every entry x exit
    pair of every via vertex."""
    entries = edges.select(
        F.col("head").alias("via"), F.col("tail").alias("from_node")
    ).distinct()
    exits = edges.select(
        F.col("tail").alias("via"), F.col("head").alias("to_node")
    ).distinct()
    pairs = entries.join(exits, "via")

    no = (
        restrictions.filter(F.col("kind") == "no")
        .select("via", "from_node", "to_node")
        .distinct()  # duplicate 'no' rows must not multiply pair rows
        .withColumn("is_no", F.lit(True))
    )
    # Multiple 'only' restrictions for one (via, from_node) are
    # NO_ENTRY-dominant (each marks every other exit NO_ENTRY, so with
    # two distinct targets EVERY exit ends up NO_ENTRY — the reference's
    # sequential matrix writes converge to the same set except for the
    # map-iteration-order-dependent last writer, which we freeze to the
    # dominant NO_ENTRY). Aggregating to min/max keeps exactly one row
    # per (via, from_node), so the left join never duplicates pairs.
    only = (
        restrictions.filter(F.col("kind") == "only")
        .groupBy("via", "from_node")
        .agg(
            F.min("to_node").alias("only_min"),
            F.max("to_node").alias("only_max"),
        )
        .withColumn("has_only", F.lit(True))
    )
    out = (
        pairs.join(F.broadcast(no), ["via", "from_node", "to_node"], "left")
        .join(F.broadcast(only), ["via", "from_node"], "left")
        .withColumn(
            "turn_type",
            F.when(F.col("is_no"), F.lit(NO_ENTRY))
            .when(
                F.col("has_only")
                & (
                    (F.col("only_min") != F.col("only_max"))
                    | (F.col("to_node") != F.col("only_min"))
                ),
                F.lit(NO_ENTRY),
            )
            .otherwise(F.lit(NONE)),
        )
        .select("via", "from_node", "to_node", "turn_type")
    )
    return out
