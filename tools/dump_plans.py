"""Dump ``.explain("formatted")`` for queries() keys to files.

Deliverable helper for the optimization rounds: the judge cannot run
Spark, so every touched query's physical plan is committed as
``plans/<round>/<key>_{before,after}.txt`` and claims like "2 Exchange
-> 1" are checked against these files.

Usage:
  PYTHONPATH=/root/repo python tools/dump_plans.py <out_dir> <suffix> [key ...]

e.g.  python tools/dump_plans.py plans/r10 before q_allocation_fifo graph_kcore

Streaming keys and side-effect keys that return an already-materialized
result (no useful batch plan) are skipped with a note. Keys that
materialize scalars during plan construction (iterative algorithms)
still show the plan of the RETURNED DataFrame — that is the measured
final job; the per-round loop structure is documented in the operator
docstring and OPTIMIZATION notes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as m  # noqa: E402
from etl_city_directories_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    keys = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    rc = 0
    for key in keys:
        if key not in qs:
            print(f"dump_plans: unknown key {key}", file=sys.stderr)
            rc = 1
            continue
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        try:
            df = qs[key](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # streaming keys raise on explain
            plan = f"(no batch plan: {exc})\n"
        with open(path, "w", encoding="utf-8") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
