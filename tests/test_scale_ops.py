"""Scale-pattern operator tests: HLL tolerance, salting invariance."""

import pyspark.sql.functions as F
import pytest

from etl_city_directories_spark.operators.scale_ops import (
    q_approx_distinct,
    q_skew_salted_agg,
)
from etl_city_directories_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_tolerance(spark):
    """HLL++ at rsd=2% must land within 5% of the exact distinct count
    for every event type."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in q_approx_distinct(spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for etype, est in approx.items():
        assert est == pytest.approx(exact[etype], rel=0.05), etype


def test_salted_agg_matches_plain(spark):
    """Salting is a pure execution-strategy change: the two-phase plan
    must produce exactly the plain groupBy's rows."""
    salted = q_skew_salted_agg(spark, SF).collect()
    plain = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("user_id")
        .collect()
    )
    assert salted == plain


def test_approx_quantiles_within_tolerance(spark):
    """percentile_approx at accuracy 10000 must land within 2% of the
    exact per-group percentiles (tight: at this accuracy and corpus
    size the sketch is near-exact)."""
    from etl_city_directories_spark.functions.numeric import dec2
    from etl_city_directories_spark.operators.scale_ops import q_approx_quantiles

    approx = {r["event_type"]: r for r in q_approx_quantiles(spark, SF).collect()}
    exact = {
        r["event_type"]: r
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.expr(
                "percentile(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE), 0.5)"
            ).alias("p50"),
            F.expr(
                "percentile(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE), 0.9)"
            ).alias("p90"),
            F.expr(
                "percentile(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE), 0.99)"
            ).alias("p99"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for etype, row in approx.items():
        for q in ("p50", "p90", "p99"):
            assert row[q] == pytest.approx(exact[etype][q], rel=0.02), (etype, q)
