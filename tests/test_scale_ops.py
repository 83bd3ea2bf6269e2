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
    for every event type (raw estimates via the detail helper; the
    oracle-gated operator reports the contract boolean)."""
    from etl_city_directories_spark.operators.scale_ops import (
        _approx_distinct_detail,
    )

    detail = {r["event_type"]: r for r in _approx_distinct_detail(spark, SF).collect()}
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(detail) == set(exact)
    for etype, row in detail.items():
        assert row["approx_users"] == pytest.approx(exact[etype], rel=0.05), etype
        assert row["exact_users"] == exact[etype], etype
    # the oracle-facing contract booleans must all hold
    for r in q_approx_distinct(spark, SF).collect():
        assert r["est_ok"] is True, r["event_type"]


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
    from etl_city_directories_spark.operators.scale_ops import (
        _approx_quantiles_detail,
        q_approx_quantiles,
    )

    detail = {
        r["event_type"]: r for r in _approx_quantiles_detail(spark, SF).collect()
    }
    assert detail
    for etype, row in detail.items():
        for a, p in (("a50", "p50"), ("a90", "p90"), ("a99", "p99")):
            assert row[a] == pytest.approx(row[p], rel=0.02, abs=0.01), (etype, a)
    # the oracle-facing contract booleans must all hold
    for r in q_approx_quantiles(spark, SF).collect():
        for c in ("p50_est_ok", "p90_est_ok", "p99_est_ok"):
            assert r[c] is True, (r["event_type"], c)
