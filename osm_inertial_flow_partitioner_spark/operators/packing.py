"""P9 cell-number bit packing as native Catalyst expressions.

Reference: `/root/reference/pkg/partitioner/io_writer.go:54-67` —
pvOffset[l+1] = pvOffset[l] + ceil(log2(numCells[l])); packed |=
cellId << pvOffset[l], level-0 id in the low bits. With the reference
config (5 levels × <= 20-bit ids) the value stays well under 2^63, so
LongType carries the exact uint64 semantics (property-tested).

All JVM-side (shiftleft + sum over disjoint bit ranges == bitwise OR);
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel.multilevel import pv_offsets


def pack_assignment(assignment: DataFrame, num_cells: list[int]) -> DataFrame:
    """(vertex_id, level, cell_id) -> (vertex_id, cell_number).

    One shuffle (groupBy vertex_id); the shift amounts are literals from
    the per-level cell counts.
    """
    off = pv_offsets(num_cells)
    shifted = F.when(F.col("level") == 0, F.shiftleft(F.col("cell_id"), off[0]))
    for lvl in range(1, len(num_cells)):
        shifted = shifted.when(
            F.col("level") == lvl, F.shiftleft(F.col("cell_id"), off[lvl])
        )
    return (
        assignment.withColumn("shifted", shifted)
        .groupBy("vertex_id")
        .agg(F.sum("shifted").alias("cell_number"))
    )


def unpack_expr(level: int, num_cells: list[int]) -> F.Column:
    """Column expression extracting one level's cell id from cell_number."""
    off = pv_offsets(num_cells)
    bits = off[level + 1] - off[level]
    mask = (1 << bits) - 1
    return F.shiftright(F.col("cell_number"), off[level]).bitwiseAND(F.lit(mask))
