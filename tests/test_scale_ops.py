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
