"""functions.memo invalidation: a testdata regeneration (new mtime /
size on the source parquet) must rebuild memoized index artifacts and
cached sinks instead of serving stale ones — the r02 failure mode was
exactly a silent stale assumption surviving a regeneration."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from etl_city_directories_spark.functions.memo import memo_df, table_stamp
from etl_city_directories_spark.operators.ingest import cached_sink_dir


def _copy_table(tmp, name="documents"):
    d = str(tmp)
    shutil.copy(f"/root/testdata/sf0.001/{name}.parquet", d)
    return d


def test_table_stamp_changes_on_rewrite(tmp_path):
    d = _copy_table(tmp_path)
    s1 = table_stamp(d, ("documents",))
    # touch mtime (regeneration without size change)
    os.utime(f"{d}/documents.parquet", ns=(1, 1))
    assert table_stamp(d, ("documents",)) != s1


def test_memo_df_rebuilds_on_new_stamp(spark, tmp_path):
    d = _copy_table(tmp_path)
    builds = []

    def build():
        builds.append(1)
        return spark.range(3).select(F.col("id"))

    key1 = ("t", d, table_stamp(d, ("documents",)))
    memo_df(spark, key1, build)
    memo_df(spark, key1, build)  # cache hit
    assert len(builds) == 1
    os.utime(f"{d}/documents.parquet", ns=(2, 2))
    key2 = ("t", d, table_stamp(d, ("documents",)))
    assert key2 != key1
    memo_df(spark, key2, build)  # regeneration → rebuild
    assert len(builds) == 2


def test_cached_sink_rebuilds_on_new_stamp(tmp_path):
    d = _copy_table(tmp_path)
    writes = []

    def write(p):
        writes.append(p)
        open(os.path.join(p, "marker"), "w").write("x")

    p1 = cached_sink_dir("memo_test", d, ("documents",), write)
    p2 = cached_sink_dir("memo_test", d, ("documents",), write)
    assert p1 == p2 and len(writes) == 1
    os.utime(f"{d}/documents.parquet", ns=(3, 3))
    p3 = cached_sink_dir("memo_test", d, ("documents",), write)
    assert p3 != p1 and len(writes) == 2
