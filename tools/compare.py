"""Local mirror of the driver's correctness gate.

Runs a Spark query and its DuckDB oracle on the same parquet dir and
compares row count, column names, and an order-insensitive canonical
value frame. Used by tests/test_correctness.py; keeps surprises out of
the driver's CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pandas as pd

from etl_city_directories_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_val(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_val(x) for x in v) + "]"
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(tuple(_canon_val(v) for v in row) for row in df.itertuples(index=False))


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    spark_pd = spark_df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pd = con.execute(oracle_sql).fetchdf()
    finally:
        con.close()

    result = {
        "rows_spark": len(spark_pd),
        "rows_oracle": len(oracle_pd),
        "cols_spark": sorted(spark_pd.columns),
        "cols_oracle": sorted(oracle_pd.columns),
    }
    result["cols_match"] = result["cols_spark"] == result["cols_oracle"]
    result["rows_match"] = result["rows_spark"] == result["rows_oracle"]
    if not (result["cols_match"] and result["rows_match"]):
        result["values_match"] = False
        return result

    a, b = canon_rows(spark_pd), canon_rows(oracle_pd)
    result["values_match"] = a == b
    if not result["values_match"]:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        result["first_diffs"] = diffs[:5]
    return result
