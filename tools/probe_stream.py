"""Phase-profile streaming keys: construction vs query run vs batch
durations (from StreamingQueryProgress) vs final collect.

Usage: python tools/probe_stream.py <key> [runs]
Prints per-run phase timings plus Spark's own per-batch durationMs
breakdown (addBatch / getBatch / latestOffset / queryPlanning /
walCommit / commitOffsets / stateful commit) for the LAST run.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from etl_city_directories_spark.session import get_spark  # noqa: E402

KEY = sys.argv[1]
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("probe")
spark.sparkContext.setLogLevel("ERROR")
entry_mod.entry(spark).collect()
qs = entry_mod.queries()

sqm = spark.streams


def active_names():
    return {q.name for q in sqm.active}


for run in range(RUNS):
    spark.catalog.clearCache()
    progress_log = []

    t0 = time.perf_counter()
    df = qs[KEY](spark, SF)
    t1 = time.perf_counter()
    df.collect()
    t2 = time.perf_counter()
    print(
        f"run {run}: call(={t1-t0:.3f}s incl stream run) "
        f"final_collect={t2-t1:.3f}s total={t2-t0:.3f}s"
    )

# after the last run, dump recentProgress of any terminated query we
# can still reach via the sink name convention: re-run once recording
spark.catalog.clearCache()
import pyspark.sql.streaming as pss  # noqa: E402

orig_start = pss.readwriter.DataStreamWriter.start
captured = []


def patched_start(self, *a, **kw):
    q = orig_start(self, *a, **kw)
    captured.append(q)
    return q


pss.readwriter.DataStreamWriter.start = patched_start
t0 = time.perf_counter()
df = qs[KEY](spark, SF)
df.collect()
t_total = time.perf_counter() - t0
pss.readwriter.DataStreamWriter.start = orig_start

for q in captured:
    print(f"\nquery {q.name}: ")
    for p in q.recentProgress:
        d = json.loads(p.json) if hasattr(p, "json") else p
        dur = d.get("durationMs", {})
        print(
            f"  batch {d.get('batchId')}: rows={d.get('numInputRows')} "
            f"durations={dur}"
        )
print(f"\nlast-run total: {t_total:.3f}s")
spark.stop()
