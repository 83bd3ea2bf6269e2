import json, os, sys, time
root = sys.argv[1]
sys.path.insert(0, root)
os.chdir(root)
import __spark_entry__ as entry_mod
from etl_city_directories_spark.session import get_spark
KEYS = sys.argv[2].split(",")
spark = get_spark("bench"); spark.sparkContext.setLogLevel("ERROR")
entry_mod.entry(spark).collect()  # warm, untimed
qs = entry_mod.queries()
sf_dir = "/root/testdata/sf0.1"
out = {}
for name in sorted(KEYS):
    best = None
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 3)
print(json.dumps({"queries": out, "value": round(sum(out.values()),3)}))
