"""PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the capabilities of
``lintang-b-s/osm-inertial-flow-partitioner`` (a single-process Go
CRP-style multilevel inertial-flow partitioner, `/root/reference`) as an
idiomatic Spark DataFrame engine:

- the inertial-flow balanced min-cut core (reference
  ``pkg/partitioner/inertial_flow.go:107-168``) runs as a numpy kernel
  inside cogrouped ``applyInPandas`` — one Spark group per cell;
- the recursive-bisection driver (``recursiveBisection.go:37-66``) becomes
  a driver-side round loop that bisects *every* oversized cell in parallel;
- the multilevel top-down loop (``multilevel_partitioner.go:43-77``) stays
  on the driver, one level at a time;
- everything relational (filters, joins, aggregations, packing, sinks) is
  plain DataFrame/Catalyst.

The graft surface (BASELINE.json north_rule) adds: geo-entity extraction
from Common-Crawl-style pages, grid-cell (H3/S2-style) indexing,
point-in-polygon joins, kNN lookups, raster<->vector tile aggregation,
dedup / similarity / text-analysis operators, checkpoint/resume, and
metrics — all over Spark DataFrames.
"""

__version__ = "0.1.0"
