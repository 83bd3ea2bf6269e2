"""functions.memo invalidation: a testdata regeneration (new mtime /
size on the source parquet) must rebuild memoized index artifacts and
cached sinks instead of serving stale ones — the r02 failure mode was
exactly a silent stale assumption surviving a regeneration."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from etl_city_directories_spark.functions.memo import (
    _MEMO,
    _ROLLING,
    memo_df,
    rolling_persist,
    table_stamp,
)
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


def test_memo_df_evicts_superseded_stamp(spark, tmp_path):
    """A mid-process regeneration must REPLACE the old stamp's entry,
    not leave its localCheckpoint blocks pinned beside the new one."""
    d = _copy_table(tmp_path)
    key1 = ("evict_t", d, table_stamp(d, ("documents",)))
    memo_df(spark, key1, lambda: spark.range(3))
    app = spark.sparkContext.applicationId
    assert (app,) + key1 in _MEMO
    os.utime(f"{d}/documents.parquet", ns=(5, 5))
    key2 = ("evict_t", d, table_stamp(d, ("documents",)))
    memo_df(spark, key2, lambda: spark.range(4))
    assert (app,) + key2 in _MEMO
    assert (app,) + key1 not in _MEMO  # superseded stamp dropped


def test_rolling_persist_replaces_previous(spark):
    """One live persisted artifact per callsite: re-entry releases the
    previous invocation's blocks (storage stays bounded across repeated
    gate/bench runs) and each call still computes the NEW DataFrame."""
    df1 = rolling_persist(spark, ("roll_t", "k"), spark.range(5))
    assert df1.count() == 5
    assert df1.storageLevel.useMemory
    df2 = rolling_persist(spark, ("roll_t", "k"), spark.range(7))
    assert df2.count() == 7
    app = spark.sparkContext.applicationId
    assert _ROLLING[(app, "roll_t", "k")] is df2
    assert not df1.storageLevel.useMemory  # released


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
