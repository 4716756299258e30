"""Distributed operators: the multilevel tiling driver, spatial joins,
dedup/similarity/text operators, and packing expressions."""
