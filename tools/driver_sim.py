"""Simulate the driver's correctness gate: vanilla SparkSession (NOT
session.get_spark — the r01 gate failure was exactly that difference),
every queries() entry vs its DuckDB oracle at sf0.01, column-name-sorted
stringified-row compare (the driver's hash check).

Usage: PYTHONPATH=/root/repo python tools/driver_sim.py [sf_dir] [key ...]

Session shape overrides (the r02 ts flip only showed under a vanilla
session; an ALTERNATE shape catches partitioning-sensitive bugs):
  SPARK_SIM_CPUS=4 SPARK_SIM_PARTITIONS=200 python tools/driver_sim.py
"""
from __future__ import annotations

import os
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as m  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(str(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    cpus = os.environ.get("SPARK_SIM_CPUS", "8")
    parts = os.environ.get("SPARK_SIM_PARTITIONS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", parts)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = m.entry(spark).collect()
    print(f"entry: {len(rows)} rows", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, os_ = m.queries(), m.oracle_sql()
    n_pass = n_rows_only = n_fail = 0
    fails = []
    for name in qs:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sp = qs[name](spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            fails.append(name)
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        dt = time.time() - t0
        if name not in os_:
            n_rows_only += 1
            print(f"rows {name}: {len(sp)} rows  ({dt:.1f}s)", flush=True)
            continue
        op = con.execute(os_[name]).fetchdf()
        if sorted(sp.columns) != sorted(op.columns):
            n_fail += 1
            fails.append(name)
            print(
                f"FAIL {name}: schema {sorted(sp.columns)} vs {sorted(op.columns)}",
                flush=True,
            )
        elif canon(sp) != canon(op):
            n_fail += 1
            fails.append(name)
            s, o = canon(sp), canon(op)
            diff = next(
                (i for i, (a, b) in enumerate(zip(s, o)) if a != b), min(len(s), len(o))
            )
            print(
                f"FAIL {name}: values differ (spark {len(s)} vs oracle {len(o)} rows); "
                f"first diff @{diff}:\n  spark:  {s[diff] if diff < len(s) else '<none>'}"
                f"\n  oracle: {o[diff] if diff < len(o) else '<none>'}",
                flush=True,
            )
        else:
            n_pass += 1
            print(f"PASS {name}: {len(sp)} rows  ({dt:.1f}s)", flush=True)
    print(f"\n== {n_pass} pass, {n_rows_only} rows-only, {n_fail} fail: {fails}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
