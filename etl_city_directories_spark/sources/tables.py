"""Parquet table source.

The driver's synthetic star schema (TPC-H-ish + events/documents/
embeddings) is the engine's standing corpus; see TESTDATA.md. Reads are
plain ``spark.read.parquet`` so Catalyst gets pushdown/pruning for
free — plan assertions in tests/test_plans.py verify filters and
projections actually reach the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.parquet's physical type is INT64 TIMESTAMP(NANOS), which
        # Spark refuses to read unless nanos surface as raw longs. Set the
        # conf here (runtime-settable), NOT only at session build time, so
        # an externally-constructed vanilla SparkSession — e.g. the
        # driver's correctness gate — can call any events query directly.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts arrives as int64 nanos (per the conf above); convert to a
        # real timestamp at micro precision, matching the DuckDB
        # oracle's nanos→TIMESTAMP truncation.
        # integer `div`, not `/`: epoch-nanos (~1.7e18) exceeds double
        # precision, so float division corrupts the microsecond digits.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_table_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table, widening to full-core parallelism when the scan is
    narrower than the cluster.

    Small single-file tables arrive as one parquet row group = one scan
    partition, which would serialize CPU-heavy per-row work (shingling,
    minhashing, UDF decode) onto one core. At 100 TB the scan has
    thousands of splits and this is a no-op; the guard only pays the
    (tiny) round-robin shuffle when the input is narrower than the
    executor pool.
    """
    df = load_table(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    # cache key includes mtime+size so a rewrite of the data under
    # sf_dir (e.g. tools/scale_probe.py corpus replication) invalidates
    # the cached narrow-scan decision instead of silently reusing it
    path = f"{sf_dir}/{name}.parquet"
    try:
        st = os.stat(path)
        stamp = (st.st_mtime_ns, st.st_size)
    except OSError:
        stamp = (0, 0)
    key = (sf_dir, name, target, stamp)
    if key not in _NARROW_SCAN:
        # .rdd plan conversion is driver-side work; decide once per table
        _NARROW_SCAN[key] = df.rdd.getNumPartitions() < target
    if _NARROW_SCAN[key]:
        df = df.repartition(target)
    return df


_NARROW_SCAN: dict[tuple, bool] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so operators can use spark.sql."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
