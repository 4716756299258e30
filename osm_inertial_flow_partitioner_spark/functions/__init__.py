"""Scalar function library: geo math, grid-cell (H3/S2-style) indexing,
and portable hashing — all native pyspark.sql.functions expressions
(JVM-side, whole-stage-codegen'd); no per-row Python anywhere.
"""
