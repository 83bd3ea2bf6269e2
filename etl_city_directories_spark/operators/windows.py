"""Window-function operators: running aggregates, ranking, gap
sessionization, exact percentiles.

All window specs carry a total order (timestamp + id tiebreak) so the
results are deterministic across engines and across partitionings —
a requirement for the DuckDB hash-compare and for rerun-stable output
at cluster scale.

Scale notes: each operator is a single shuffle on its partition key
(customer / user / group); no driver-side iteration. Session ids are
computed with the classic lag→flag→cumulative-sum pattern, which is
one window pass (no self-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_city_directories_spark.functions.numeric import dec2
from etl_city_directories_spark.sources.tables import load_table

SESSION_GAP_MIN = 30


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total of order value per customer (exact decimal cumsum)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.sum(dec2("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by value (rank with full tiebreak)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            dec2("o_totalprice").cast("double").alias("order_value"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the event stream (30-min gap).

    lag → new-session flag → cumulative sum = session seq; then one
    aggregation per (user, session). Two window passes over the same
    (user_id, ts) ordering — Catalyst reuses the single sort+shuffle.
    """
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(us - F.lag(us).over(w_order) > gap_us, 1)
        .when(F.lag(us).over(w_order).isNull(), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    return (
        flagged.withColumn("session_seq", F.sum("new_session").over(w_run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("bigint").alias("session_seq"),
            "session_start_us",
            "session_end_us",
            "n_events",
        )
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles of event value per type."""
    events = load_table(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.5, 0.9, 0.99))")
    return (
        events.groupBy("event_type")
        .agg(pct.alias("p"))
        .select(
            "event_type",
            F.round(F.col("p")[0], 4).alias("p50"),
            F.round(F.col("p")[1], 4).alias("p90"),
            F.round(F.col("p")[2], 4).alias("p99"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "q_window_running": q_window_running,
    "q_window_rank": q_window_rank,
    "q_sessionize": q_sessionize,
    "q_percentiles": q_percentiles,
}

ORACLES = {
    "q_window_running": """
        SELECT
          o_custkey,
          o_orderkey,
          strftime(o_orderdate, '%Y-%m-%d') AS order_date,
          SUM(o_totalprice::DECIMAL(18,2)) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
          )::DOUBLE AS running_total
        FROM orders
    """,
    "q_window_rank": """
        SELECT o_custkey, o_orderkey, order_value, rk FROM (
          SELECT
            o_custkey,
            o_orderkey,
            o_totalprice::DECIMAL(18,2)::DOUBLE AS order_value,
            RANK() OVER (
              PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC
            ) AS rk
          FROM orders
        ) WHERE rk <= 3
    """,
    "q_sessionize": f"""
        WITH flagged AS (
          SELECT
            user_id, event_id, ts,
            CASE
              WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_MIN * 60 * 1_000_000} THEN 1
              WHEN LAG(epoch_us(ts)) OVER w IS NULL THEN 1
              ELSE 0
            END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
          SELECT
            user_id, event_id, ts,
            SUM(new_session) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS session_seq
          FROM flagged
        )
        SELECT
          user_id,
          session_seq::BIGINT AS session_seq,
          epoch_us(MIN(ts)) AS session_start_us,
          epoch_us(MAX(ts)) AS session_end_us,
          COUNT(*) AS n_events
        FROM sessions
        GROUP BY user_id, session_seq
    """,
    "q_percentiles": """
        SELECT
          event_type,
          ROUND(quantile_cont(value, 0.5), 4) AS p50,
          ROUND(quantile_cont(value, 0.9), 4) AS p90,
          ROUND(quantile_cont(value, 0.99), 4) AS p99
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
}
