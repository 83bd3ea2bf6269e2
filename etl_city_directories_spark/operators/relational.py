"""Relational query core: the analytic surface a user of the engine
queries the corpus with.

Everything here is declarative DataFrame API → Catalyst/Tungsten:
filters and projections push to the parquet scan, small dims broadcast,
aggregations get map-side partial combine, AQE right-sizes shuffles.
Each query has a DuckDB oracle twin in ``ORACLES`` (same column names,
same deterministic numeric policy — see functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_city_directories_spark.functions.numeric import dec2, money_sum, ratio
from etl_city_directories_spark.sources.tables import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter → groupBy → multi-aggregate.

    Scale notes: single shuffle on the (tiny-cardinality) grouping key;
    partial aggregation happens map-side so shuffle volume is O(groups),
    not O(rows). The shipdate filter pushes down to the parquet scan.
    """
    l = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    disc_price = dec2("l_extendedprice") * (one - dec2("l_discount"))
    charge = disc_price * (one + dec2("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(dec2("l_quantity"), "sum_qty"),
            money_sum(dec2("l_extendedprice"), "sum_base_price"),
            money_sum(disc_price, "sum_disc_price"),
            money_sum(charge, "sum_charge"),
            ratio(F.sum(dec2("l_quantity")), F.count(F.lit(1)), "avg_qty"),
            ratio(F.sum(dec2("l_extendedprice")), F.count(F.lit(1)), "avg_price"),
            ratio(F.sum(dec2("l_discount")), F.count(F.lit(1)), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dims → fact joins → agg → top-k.

    customer is small relative to the facts → broadcast; the
    orders⋈lineitem join shuffles on orderkey once. Top-10 uses
    TakeOrderedAndProject (no full sort at scale).
    """
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15")
    )
    one = F.lit(1).cast("decimal(18,2)")
    revenue_expr = dec2("l_extendedprice") * (one - dec2("l_discount"))
    return (
        lineitem.join(
            F.broadcast(orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(revenue_expr, "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with small dims broadcast.

    region/nation/supplier/customer all broadcast; only the
    orders⋈lineitem edge shuffles. Join condition c_nationkey =
    s_nationkey keeps the reference semantics of 'local supplier'.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    revenue_expr = dec2("l_extendedprice") * (one - dec2("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(customer),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(money_sum(revenue_expr, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight-range filter + single aggregate.

    Pure pushdown showcase — all four predicates reach the parquet
    scan, only three columns are read, no shuffle at all (single-group
    agg is a map-side partial + one tiny exchange).
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(dec2("l_extendedprice") * dec2("l_discount"), "revenue"))
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join + groupBy + order + limit: top 15 customers by order value."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            money_sum(dec2("o_totalprice"), "total_spent"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "total_spent", "order_count")
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(15)
    )


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation per group over the event stream."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("distinct_users"),
            F.count(F.lit(1)).alias("event_count"),
            money_sum(dec2("value"), "total_value"),
        )
        .orderBy("event_type")
    )


def q_corr_max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery shape: each customer's max-value
    order(s). Spark-first decorrelation: the per-customer MAX is a
    window over the same shuffle the output needs — one pass, no
    re-join of orders against an aggregated copy of itself."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("max_price", F.max(dec2("o_totalprice")).over(w))
        .filter(dec2("o_totalprice") == F.col("max_price"))
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("max_price").cast("double").alias("max_price"),
        )
    )


def q_exists_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-subquery shape: orders with at least one returned line,
    counted per priority. The EXISTS compiles to a left-semi hash join
    on orderkey — probe side never duplicates rows, so the aggregate
    input stays |orders|-bounded at any lineitem fan-out."""
    orders = load_table(spark, sf_dir, "orders")
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue-per-customer from returned items.

    Filter on the fact side first (returnflag pushes to the lineitem
    scan), broadcast customer+nation, one shuffle on custkey for the
    aggregate, top-20 via TakeOrderedAndProject.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(18,2)")
    revenue = dec2("l_extendedprice") * (one - dec2("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money_sum(revenue, "lost_revenue"))
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q10_returned_items": q10_returned_items,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q_top_customers": q_top_customers,
    "q_distinct_users": q_distinct_users,
    "q_corr_max_order": q_corr_max_order,
    "q_exists_agg": q_exists_agg,
}

ORACLES = {
    "q1_pricing_summary": """
        SELECT
          l_returnflag,
          l_linestatus,
          SUM(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
          SUM(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
          SUM(l_extendedprice::DECIMAL(18,2) * (1.00 - l_discount::DECIMAL(18,2)))::DOUBLE AS sum_disc_price,
          SUM(l_extendedprice::DECIMAL(18,2) * (1.00 - l_discount::DECIMAL(18,2))
              * (1.00 + l_tax::DECIMAL(18,2)))::DOUBLE AS sum_charge,
          ROUND(SUM(l_quantity::DECIMAL(18,2))::DOUBLE / COUNT(*), 4) AS avg_qty,
          ROUND(SUM(l_extendedprice::DECIMAL(18,2))::DOUBLE / COUNT(*), 4) AS avg_price,
          ROUND(SUM(l_discount::DECIMAL(18,2))::DOUBLE / COUNT(*), 4) AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT
          l_orderkey,
          SUM(l_extendedprice::DECIMAL(18,2) * (1.00 - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue,
          strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
          o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q5_local_supplier": """
        SELECT
          n_name,
          SUM(l_extendedprice::DECIMAL(18,2) * (1.00 - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """,
    "q6_forecast_revenue": """
        SELECT
          SUM(l_extendedprice::DECIMAL(18,2) * l_discount::DECIMAL(18,2))::DOUBLE AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.04 AND l_discount <= 0.06
          AND l_quantity < 24
    """,
    "q_top_customers": """
        SELECT c_custkey, c_name,
               SUM(o_totalprice::DECIMAL(18,2))::DOUBLE AS total_spent,
               COUNT(*) AS order_count
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY total_spent DESC, c_custkey ASC
        LIMIT 15
    """,
    "q_distinct_users": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS distinct_users,
               COUNT(*) AS event_count,
               SUM(value::DECIMAL(18,2))::DOUBLE AS total_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, n_name,
               SUM(l_extendedprice::DECIMAL(18,2)
                   * (1.00 - l_discount::DECIMAL(18,2)))::DOUBLE AS lost_revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY lost_revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "q_corr_max_order": """
        SELECT
          o_custkey,
          o_orderkey,
          (SELECT MAX(o2.o_totalprice::DECIMAL(18,2)) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey)::DOUBLE AS max_price
        FROM orders o
        WHERE o_totalprice::DECIMAL(18,2) =
          (SELECT MAX(o2.o_totalprice::DECIMAL(18,2)) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey)
    """,
    "q_exists_agg": """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
}
