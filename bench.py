"""Benchmark harness: runs every queries() entry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with total + per-query wall seconds.

Each query is forced to full execution with a count-style action
(``df.write.format("noop")`` would hide result materialization;
``collect`` on aggregated outputs is tiny) — collect() is what the
driver does, so that's what we time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from etl_city_directories_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    # warm the JVM + parquet footer cache once, outside timed region
    entry_mod.entry(spark).collect()

    t_all = time.perf_counter()
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            queries[name](spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # a broken query shouldn't hide the rest
            timings[name] = -1.0
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 3)

    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
