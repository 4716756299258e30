#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, canonicalize both frames (columns sorted by name, rows sorted,
floats rounded) and diff. Usage:

    python scripts/check_queries.py [query ...]   # default: all
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .appName("check-queries")
        .getOrCreate()
    )
    from osm_inertial_flow_partitioner_spark import entry as E

    qs = E.queries()
    oracles = E.oracle_sql()
    wanted = sys.argv[1:] or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name in wanted:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(sdf)} spark rows)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        cs, co = canon(sdf), canon(odf)
        if list(cs.columns) != list(co.columns):
            print(f"FAIL {name}: columns {list(cs.columns)} != {list(co.columns)}")
            failures += 1
            continue
        if len(cs) != len(co):
            print(f"FAIL {name}: rows {len(cs)} != {len(co)}")
            failures += 1
            continue
        eq = True
        for c in cs.columns:
            a, b = cs[c], co[c]
            if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                ok = np.allclose(
                    a.astype(float), b.astype(float), rtol=0, atol=1.5e-6, equal_nan=True
                )
            else:
                ok = (a.astype(str) == b.astype(str)).all()
            if not ok:
                bad = (
                    ~np.isclose(a.astype(float), b.astype(float), rtol=0, atol=1.5e-6)
                    if np.issubdtype(a.dtype, np.floating)
                    else (a.astype(str) != b.astype(str))
                )
                i = int(np.argmax(bad.to_numpy()))
                print(f"FAIL {name}: col {c} differs (e.g. row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r})")
                eq = False
                break
        if eq:
            print(f"PASS {name} ({len(cs)} rows)")
        else:
            failures += 1
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
