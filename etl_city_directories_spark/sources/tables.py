"""Parquet table source.

The driver's synthetic star schema (TPC-H-ish + events/documents/
embeddings) is the engine's standing corpus; see TESTDATA.md. Reads are
plain ``spark.read.parquet`` so Catalyst gets pushdown/pruning for
free — plan assertions in tests/test_plans.py verify filters and
projections actually reach the scan.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

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


def events_ts_encoding(sf_dir: str) -> str:
    """Inspect the events parquet footer and classify its ``ts`` column.

    Returns one of:
      - ``"nanos_long"``: physical INT64 TIMESTAMP(NANOS) (or bare
        int64) — Spark can only read it via the ``nanosAsLong`` legacy
        conf, surfacing raw epoch-nanos longs that need ``div 1000``.
      - ``"ntz"``: TIMESTAMP without timezone (micros/millis) — Spark
        reads TIMESTAMP_NTZ; cast to TIMESTAMP (session tz is UTC, so
        the naive value is preserved bit-for-bit).
      - ``"tz"``: TIMESTAMP with a timezone — Spark reads TimestampType
        directly, nothing to do.

    The driver regenerates /root/testdata between rounds and has
    already flipped the encoding once (nanos → micros), so nothing may
    hard-code one; the footer read is a few KB of driver-side I/O,
    cached on (path, mtime, size).
    """
    path = f"{sf_dir}/events.parquet"
    probe = path
    if os.path.isdir(path):
        # directory-shaped dataset (e.g. a Spark sink): probe one part
        for root, _, files in sorted(os.walk(path)):
            parts = sorted(f for f in files if f.endswith(".parquet"))
            if parts:
                probe = os.path.join(root, parts[0])
                break
    try:
        st = os.stat(probe)
        key = (probe, st.st_mtime_ns, st.st_size)
    except OSError:
        key = (probe, 0, 0)
    if key not in _TS_ENCODING:
        t = pq.read_schema(probe).field("ts").type
        import pyarrow as pa

        if pa.types.is_timestamp(t):
            if t.unit == "ns":
                # ns WITH tz too: Spark cannot read INT64
                # TIMESTAMP(NANOS, adjustedToUTC=true) as TimestampType
                # either; nanosAsLong surfaces both variants as raw
                # longs, and div-1000 to micros is correct for
                # UTC-adjusted instants (session tz is forced UTC).
                enc = "nanos_long"
            elif t.tz is None:
                enc = "ntz"
            else:
                enc = "tz"
        elif pa.types.is_integer(t):
            enc = "nanos_long"
        else:
            raise TypeError(f"unsupported events.ts parquet type: {t}")
        _TS_ENCODING.clear()  # tiny cache; never grows across testdata rewrites
        _TS_ENCODING[key] = enc
    return _TS_ENCODING[key]


_TS_ENCODING: dict[tuple, str] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # Confs are set here (runtime-settable), NOT only at session
        # build time, so an externally-constructed vanilla SparkSession
        # — e.g. the driver's correctness gate — can call any events
        # query directly. UTC keeps window bucketing / unix_micros /
        # toPandas rendering identical to the DuckDB oracle's naive
        # timestamps regardless of host timezone.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        if events_ts_encoding(sf_dir) == "nanos_long":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Plan-object cache (r10 optimization, guide §6 file-listing
    # advice): ``spark.read.parquet`` costs ~75-95 ms of driver-side
    # work per call (file listing, footer/schema read, relation
    # analysis) and the engine issues it 1-3× per query — ~25% of the
    # whole-bench wall. The ANALYZED RELATION is immutable, so it is
    # memoized per (application, sf_dir, table, file mtime+size);
    # every query still computes fully from the parquet bytes — this
    # caches no rows, no results, only the lazy plan node. A testdata
    # rewrite changes the stamp and evicts the stale entry
    # (tests/test_load_table_cache.py pins both properties).
    path = f"{sf_dir}/{name}.parquet"
    try:
        st = os.stat(path)
        stamp = (st.st_mtime_ns, st.st_size)
    except OSError:
        stamp = (0, 0)
    key = (spark.sparkContext.applicationId, sf_dir, name, stamp)
    df = _RELATION.get(key)
    if df is None:
        # drop the same table's superseded stamp (testdata rewrite)
        stale = [
            k for k in _RELATION if k[:-1] == key[:-1] and k != key
        ]
        for k in stale:
            _RELATION.pop(k, None)
        df = spark.read.parquet(path)
        if name == "events":
            df = df.withColumn(
                "ts", _ts_to_timestamp(df.schema["ts"].dataType)
            )
        _RELATION[key] = df
    return df


_RELATION: dict[tuple, DataFrame] = {}


def _ts_to_timestamp(dtype) -> F.Column:
    """Normalize a raw ``ts`` column (whatever the file encoded) to
    TimestampType micros, the type every downstream operator assumes."""
    if isinstance(dtype, LongType):
        # int64 epoch-nanos (nanosAsLong). Integer `div`, not `/`:
        # epoch-nanos (~1.7e18) exceeds double precision, so float
        # division would corrupt the microsecond digits. Truncation to
        # micros matches DuckDB's nanos→TIMESTAMP behavior.
        return F.timestamp_micros(F.expr("ts div 1000"))
    if isinstance(dtype, TimestampNTZType):
        # naive micros; session tz is forced UTC so this is value-exact
        return F.col("ts").cast("timestamp")
    return F.col("ts")  # already TimestampType


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
        # estimate the scan's split count from the file size and
        # maxPartitionBytes — same signal as the physical scan without
        # the driver-side .rdd plan conversion the old probe paid
        mpb = int(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728").rstrip("b")
        )
        est = max(1, -(-stamp[1] // mpb))
        _NARROW_SCAN[key] = est < target
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
