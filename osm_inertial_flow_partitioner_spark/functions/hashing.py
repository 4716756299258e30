"""Portable deterministic hashing shared by the Spark engine and the
DuckDB oracle.

Spark's ``hash()``/``xxhash64()`` and DuckDB's ``hash()`` differ, so all
cross-checked operators hash through md5 hex (identical in both):

- ``md5_long``: first 15 hex chars (60 bits) as BIGINT —
  Spark ``conv(substr(md5(x),1,15),16,10)``,
  DuckDB ``('0x' || substr(md5(x),1,15))::BIGINT``;
- ``md5_small``: first 7 hex chars (28 bits) — safe operand for modular
  minhash permutations h_i(x) = (a_i*x + b_i) mod P with P = 2^31-1
  (a*x < 2^59, no int64 overflow in either engine).

Permutation constants are generated from a fixed seed so goldens and
oracles agree forever.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MINHASH_P = 2_147_483_647  # 2^31 - 1 (prime)


def md5_long(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_small(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB-side equivalent of md5_long."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def md5_small_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 7))::BIGINT)"


def minhash_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """(a_i, b_i) pairs, a_i in [1, P), b_i in [0, P). Fixed seed."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MINHASH_P, size=num_perm)
    b = rng.integers(0, MINHASH_P, size=num_perm)
    return [(int(x), int(y)) for x, y in zip(a, b)]


def minhash_expr(token_hash: Column, a: int, b: int) -> Column:
    """One permutation applied to a 28-bit token hash (JVM-side)."""
    return (F.lit(a) * token_hash + F.lit(b)) % F.lit(MINHASH_P)


def minhash_sql(token_hash_expr: str, a: int, b: int) -> str:
    return f"(({a} * {token_hash_expr} + {b}) % {MINHASH_P})"
