"""Data-contract smoke tests for the events ``ts`` encoding.

The driver regenerates /root/testdata between rounds and has already
flipped events.ts once (INT64 TIMESTAMP(NANOS) → timestamp[us]); r02
lost 34 keys to a loader that hard-coded the nanos assumption. These
tests synthesize a tiny events table in BOTH physical encodings and
assert the batch loader and the stream source normalize each to the
same TimestampType values — so the next regeneration fails loudly here
instead of silently in the driver gate.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql.types import TimestampType

from etl_city_directories_spark.sources import tables
from etl_city_directories_spark.streaming import stream_ops

_BASE_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, epoch micros
_N = 24


def _rows():
    return {
        "event_id": list(range(_N)),
        "ts": [_BASE_US + i * 37_000_000 + i % 7 for i in range(_N)],
        "user_id": [i % 5 for i in range(_N)],
        "event_type": [["view", "click", "purchase"][i % 3] for i in range(_N)],
        "value": [float(i) * 1.5 for i in range(_N)],
        "props": ['{"k":%d}' % i for i in range(_N)],
    }


def _write_events(tmp: str, encoding: str) -> str:
    """Write events.parquet under tmp/<encoding>/ in the given physical
    ts encoding; returns the sf_dir-shaped directory."""
    d = os.path.join(tmp, encoding)
    os.makedirs(d, exist_ok=True)
    r = _rows()
    if encoding == "nanos":
        ts = pa.array([v * 1000 for v in r["ts"]], pa.timestamp("ns"))
        version = "2.6"  # parquet 2.6 keeps TIMESTAMP(NANOS) physical
    elif encoding == "nanos_utc":
        # TIMESTAMP(NANOS, adjustedToUTC=true): Spark can't read this as
        # TimestampType either — must classify nanos_long like naive ns
        ts = pa.array([v * 1000 for v in r["ts"]], pa.timestamp("ns", tz="UTC"))
        version = "2.6"
    elif encoding == "micros":
        ts = pa.array(r["ts"], pa.timestamp("us"))
        version = "2.4"
    elif encoding == "micros_utc":
        # isAdjustedToUTC=true → Spark reads TimestampType directly
        ts = pa.array(r["ts"], pa.timestamp("us", tz="UTC"))
        version = "2.4"
    else:
        raise ValueError(encoding)
    t = pa.table(
        {
            "event_id": pa.array(r["event_id"], pa.int64()),
            "ts": ts,
            "user_id": pa.array(r["user_id"], pa.int64()),
            "event_type": pa.array(r["event_type"], pa.string()),
            "value": pa.array(r["value"], pa.float64()),
            "props": pa.array(r["props"], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"), version=version)
    return d


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("events_encodings"))
    dirs = {
        enc: _write_events(tmp, enc)
        for enc in ("nanos", "nanos_utc", "micros", "micros_utc")
    }
    yield dirs
    shutil.rmtree(tmp, ignore_errors=True)


def test_footer_classification(encoded_dirs):
    assert tables.events_ts_encoding(encoded_dirs["nanos"]) == "nanos_long"
    assert tables.events_ts_encoding(encoded_dirs["nanos_utc"]) == "nanos_long"
    assert tables.events_ts_encoding(encoded_dirs["micros"]) == "ntz"
    assert tables.events_ts_encoding(encoded_dirs["micros_utc"]) == "tz"


def test_real_testdata_classifies(sf_dir):
    # whatever the current generation is, the classifier must accept it
    assert tables.events_ts_encoding(sf_dir) in {"nanos_long", "ntz", "tz"}


def test_batch_loader_normalizes_both(spark, encoded_dirs):
    expect = [
        dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=_BASE_US + i * 37_000_000 + i % 7)
        for i in range(_N)
    ]
    for enc, d in encoded_dirs.items():
        df = tables.load_table(spark, d, "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType), enc
        got = [r.ts for r in df.select("ts").orderBy("event_id").collect()]
        assert got == expect, f"{enc}: ts values diverge from written micros"


def test_stream_source_matches_batch(spark, encoded_dirs):
    for enc, d in encoded_dirs.items():
        batch = {
            r.event_id: r.ts
            for r in tables.load_table(spark, d, "events").collect()
        }
        sdf = stream_ops.events_stream(spark, d)
        assert isinstance(sdf.schema["ts"].dataType, TimestampType), enc
        name = f"contract_{enc}_sink"
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        streamed = {r.event_id: r.ts for r in spark.table(name).collect()}
        assert streamed == batch, f"{enc}: stream and batch ts disagree"


def test_tz_encoded_events_match_oracle_end_to_end(spark, tmp_path_factory):
    """End-to-end oracle compare on ns+tz-encoded events — the loader
    tests above pin the SCHEMA normalization; this pins the OUTPUT
    layer too (a raw timestamp column in a result renders tz-aware in
    DuckDB but naive in Spark and hash-mismatches; caught q_cdc_apply
    emitting one — the determinism policy requires epoch-micros
    longs)."""
    import shutil

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as m

    src = "/root/testdata/sf0.001"
    out = str(tmp_path_factory.mktemp("nstz"))
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ]:
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    tbl = pq.read_table(f"{src}/events.parquet")
    i = tbl.schema.get_field_index("ts")
    typ = pa.timestamp("ns", tz="UTC")
    tbl = tbl.set_column(
        i, pa.field("ts", typ), tbl.column("ts").cast(typ)
    )
    pq.write_table(tbl, f"{out}/events.parquet")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{out}/{t}.parquet'")
    qs, os_ = m.queries(), m.oracle_sql()
    for key in ("q_cdc_apply", "q_tumbling_window", "q_snapshot_diff"):
        got = qs[key](spark, out).toPandas()
        exp = con.execute(os_[key]).fetchdf()
        cols = sorted(got.columns)
        assert cols == sorted(exp.columns), key
        g = sorted(tuple(str(v) for v in r) for r in got[cols].itertuples(index=False))
        e = sorted(tuple(str(v) for v in r) for r in exp[cols].itertuples(index=False))
        assert g == e, f"{key}: first diff {next((a, b) for a, b in zip(g, e) if a != b)}"
