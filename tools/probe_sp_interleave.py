"""Interleaved A/B of REPLAY_STATE_PARTITIONS inside ONE session:
for each key, alternate sp=A and sp=B attempts so window drift hits
both states equally. Reports per-key best and median per state.

Usage: python tools/probe_sp_interleave.py A B key1,key2,... [reps]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from etl_city_directories_spark.session import get_spark  # noqa: E402
from etl_city_directories_spark.streaming import stream_ops  # noqa: E402

A = int(sys.argv[1])
B = int(sys.argv[2])
KEYS = sys.argv[3].split(",")
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 4
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("probe")
spark.sparkContext.setLogLevel("ERROR")
entry_mod.entry(spark).collect()
qs = entry_mod.queries()

out: dict[str, dict[int, list[float]]] = {}
for key in KEYS:
    out[key] = {A: [], B: []}
    for rep in range(REPS):
        for sp in (A, B) if rep % 2 == 0 else (B, A):
            stream_ops.REPLAY_STATE_PARTITIONS = sp
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[key](spark, SF).collect()
            out[key][sp].append(round(time.perf_counter() - t0, 3))

summary = {}
for key, d in out.items():
    summary[key] = {
        f"sp{A}": {"best": min(d[A]), "med": round(statistics.median(d[A]), 3), "all": d[A]},
        f"sp{B}": {"best": min(d[B]), "med": round(statistics.median(d[B]), 3), "all": d[B]},
    }
print(json.dumps(summary, indent=1))
tot_a = sum(min(d[A]) for d in out.values())
tot_b = sum(min(d[B]) for d in out.values())
med_a = sum(statistics.median(d[A]) for d in out.values())
med_b = sum(statistics.median(d[B]) for d in out.values())
print(f"TOTAL best: sp{A}={tot_a:.2f} sp{B}={tot_b:.2f}")
print(f"TOTAL med : sp{A}={med_a:.2f} sp{B}={med_b:.2f}")
spark.stop()
