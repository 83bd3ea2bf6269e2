"""Extended relational core: more classic analytic shapes (TPC-H
Q7/Q8/Q14/Q15/Q17/Q18/Q19/Q22 adapted to the available schema).

Same design rules as relational.py — declarative DataFrame → Catalyst,
dims broadcast, facts shuffle once on their join key, conditional
aggregation instead of self-joins, window decorrelation instead of
correlated re-scans. Numeric policy from functions/numeric.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_city_directories_spark.functions.numeric import dec2, money_sum, ratio
from etl_city_directories_spark.sources.tables import load_table

def _one():
    return F.lit(1).cast("decimal(18,2)")


def _revenue():
    return dec2("l_extendedprice") * (_one() - dec2("l_discount"))


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations per year.

    The nation-pair filter lands on broadcast supplier/customer sides,
    and both broadcast joins are applied BEFORE the orders⋈lineitem
    shuffle: the two-nation membership filter (implied by the pair
    predicate) cuts each fact side to ~2/|nations| of its rows ahead of
    the only big exchange; the cross-side pair predicate then runs
    post-join. Catalyst does not reorder inner joins without CBO, so
    the written order IS the executed order. The final groupBy is tiny
    (2 pairs × years).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    supplier = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey")
    )
    customer = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey")
    )
    li_f = lineitem.join(
        F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
    ).select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount", "supp_nation"
    )
    o_f = orders.join(
        F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "cust_nation")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li_f.join(o_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(money_sum(_revenue(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3 suppliers' share of ASIA-customer
    revenue per order year.

    Market share is a conditional-sum ratio inside ONE aggregation —
    no second pass over the joined facts, no self-join of the
    aggregate against its own total.

    Both broadcast joins apply BEFORE the orders⋈lineitem shuffle: the
    ASIA-customer join cuts the orders side to ~1/|regions| of its rows
    and projects it to (o_orderkey, o_orderdate) ahead of the only big
    exchange; the supplier join only attaches supp_nation (the
    denominator sums every nation) but riding it on the scan side keeps
    the shuffled lineitem projection minimal.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    customer = load_table(spark, sf_dir, "customer")
    nation_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_rkey")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = _revenue()
    li_f = lineitem.join(
        F.broadcast(
            supplier.join(
                F.broadcast(nation_s), F.col("s_nationkey") == F.col("sn_key")
            )
        ),
        F.col("l_suppkey") == F.col("s_suppkey"),
    ).select("l_orderkey", "l_extendedprice", "l_discount", "supp_nation")
    o_f = orders.join(
        F.broadcast(
            customer.join(
                F.broadcast(nation_c), F.col("c_nationkey") == F.col("cn_key")
            ).join(F.broadcast(region), F.col("c_rkey") == F.col("r_regionkey"))
        ),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select("o_orderkey", "o_orderdate")
    return (
        li_f.join(o_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            ratio(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0).cast("decimal(18,2)"))),
                F.sum(rev),
                "mkt_share",
            )
        )
        .orderBy("o_year")
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO revenue share for one ship-month.

    part broadcasts; the shipdate range prunes the lineitem scan; the
    share is a single conditional-sum aggregate (no shuffle beyond the
    one-row agg).
    """
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = _revenue()
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            ratio(
                F.lit(100).cast("double")
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0).cast("decimal(18,2)")
                    )
                ),
                F.sum(rev),
                "promo_revenue_pct",
            )
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.

    Per-supplier revenue is one shuffle; the scalar MAX is a window
    over the (|suppliers|-sized) aggregate, not a re-join of the
    aggregate against itself — the fact table is scanned exactly once.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    per_supp = (
        lineitem.groupBy("l_suppkey").agg(money_sum(_revenue(), "total_revenue"))
    )
    w = Window.partitionBy()
    return (
        per_supp.withColumn("max_rev", F.max("total_revenue").over(w))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: yearly revenue from small-quantity lines of one
    brand's parts.

    The correlated 'avg quantity of this part' subquery is
    decorrelated into a window over l_partkey on the already-filtered
    join — one shuffle on partkey, no second lineitem scan.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    lineitem = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    joined = lineitem.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).withColumn(
        "avg_qty",
        ratio(F.sum(dec2("l_quantity")).over(w), F.count(F.lit(1)).over(w), "avg_qty"),
    )
    return joined.filter(
        dec2("l_quantity").cast("double") < F.lit(0.5) * F.col("avg_qty")
    ).agg(
        ratio(F.sum(dec2("l_extendedprice")), F.lit(7.0), "avg_yearly", scale=2)
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with orders whose total quantity
    exceeds 250.

    The HAVING aggregate runs on lineitem alone (one shuffle on
    orderkey, map-side partial sums), and only the ~0.1% surviving
    orderkeys join back — broadcast — against orders + customer.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(money_sum(dec2("l_quantity"), "sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            dec2("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs brand/size/quantity
    predicate.

    The disjunction stays a single scan + broadcast join; per-branch
    part predicates could union three broadcast sides, but Catalyst
    already prunes the part build side with the OR's common structure
    and the quantity bounds push to the lineitem scan
    (l_quantity <= 30 is implied by all branches → pushed).
    """
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") <= 30
    )
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 15)) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 25)) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 35)) & q.between(20, 30))
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(money_sum(_revenue(), "revenue"))
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers with no recent orders,
    counted per market segment.

    The global average balance is a one-row broadcast (crossJoin of a
    scalar aggregate); 'no recent orders' is a left-anti hash join
    against the date-pruned orders scan. No correlated re-scan of
    customer, no row explosion.
    """
    customer = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01")
    )
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        ratio(F.sum(dec2("c_acctbal")), F.count(F.lit(1)), "avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            money_sum(dec2("c_acctbal"), "total_bal"),
        )
        .orderBy("c_mktsegment")
    )


def q13_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts
    (non-urgent orders), including zero-order customers.

    Orders pre-aggregate to one row per custkey BEFORE the join (the
    fact table never joins row-for-row), then customer left-joins the
    collapsed counts and the second aggregation is over the tiny
    count-histogram domain. Two shuffles total, both key-collapsed.
    """
    customer = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c_count"))
    )
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce("c_count", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_custs"))
        .orderBy(F.desc("n_custs"), F.desc("c_count"))
    )


SHIP_MODES = ("MAIL", "SHIP", "AIR", "RAIL", "TRUCK", "FOB", "REG AIR")


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for a quarter, EXISTS a
    line shipped >30 days after the order date.

    The EXISTS becomes a left-semi join with the compound (key +
    inequality) condition — one shuffle on orderkey, the quarter
    filter pushes to the orders scan. Adaptation: the corpus has no
    commit/receipt dates, so 'late line' = shipped 30+ days after
    order placement.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per-ship-mode counts of high- vs low-priority
    orders (two conditional sums over one join).

    The ship mode is a deterministic surrogate dim derived from the
    line keys (the corpus has no l_shipmode); the lineitem year filter
    pushes down, orders joins on orderkey once.
    """
    mode = F.element_at(
        F.array(*[F.lit(m) for m in SHIP_MODES]),
        ((F.col("l_orderkey") * 3 + F.col("l_linenumber")) % 7 + 1).cast("int"),
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .select("l_orderkey", mode.alias("l_shipmode"))
        .filter(F.col("l_shipmode").isin("MAIL", "SHIP"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q13_order_count_dist": q13_order_count_dist,
    "q7_nation_volume": q7_nation_volume,
    "q8_market_share": q8_market_share,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive": q19_disjunctive,
    "q22_idle_customers": q22_idle_customers,
}

_REV = "l_extendedprice::DECIMAL(18,2) * (1.00 - l_discount::DECIMAL(18,2))"

_MODE_LIST = ", ".join(f"'{m}'" for m in SHIP_MODES)

ORACLES = {
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= DATE '1996-07-01'
          AND o_orderdate < DATE '1996-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q12_shipmode_priority": f"""
        WITH modes AS (
          SELECT l_orderkey,
                 list_extract([{_MODE_LIST}],
                   CAST((l_orderkey * 3 + l_linenumber) % 7 + 1 AS INT))
                   AS l_shipmode
          FROM lineitem
          WHERE l_shipdate >= DATE '1997-01-01'
            AND l_shipdate < DATE '1998-01-01'
        )
        SELECT l_shipmode,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
               SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        FROM modes JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipmode IN ('MAIL', 'SHIP')
        GROUP BY l_shipmode
        ORDER BY l_shipmode
    """,
    "q13_order_count_dist": """
        SELECT c_count, COUNT(*) AS n_custs
        FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY n_custs DESC, c_count DESC
    """,
    "q7_nation_volume": f"""
        SELECT
          n1.n_name AS supp_nation,
          n2.n_name AS cust_nation,
          EXTRACT(year FROM l_shipdate) AS l_year,
          SUM({_REV})::DOUBLE AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    "q8_market_share": f"""
        SELECT
          EXTRACT(year FROM o_orderdate) AS o_year,
          ROUND(
            SUM(CASE WHEN n1.n_name = 'NATION_3' THEN {_REV}
                     ELSE 0.00::DECIMAL(18,2) END)::DOUBLE
            / SUM({_REV})::DOUBLE, 4) AS mkt_share
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY 1
        ORDER BY 1
    """,
    "q14_promo_revenue": f"""
        SELECT ROUND(
          100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                           ELSE 0.00::DECIMAL(18,2) END)::DOUBLE
          / SUM({_REV})::DOUBLE, 4) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    "q15_top_supplier": f"""
        WITH revenue AS (
          SELECT l_suppkey, SUM({_REV})::DOUBLE AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    "q17_small_qty_revenue": """
        SELECT ROUND(SUM(l_extendedprice::DECIMAL(18,2))::DOUBLE / 7.0, 2)
               AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity::DECIMAL(18,2)::DOUBLE <
            0.5 * (SELECT ROUND(SUM(l2.l_quantity::DECIMAL(18,2))::DOUBLE
                                / COUNT(*), 4)
                   FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
    """,
    "q18_large_orders": """
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_totalprice::DECIMAL(18,2)::DOUBLE AS o_totalprice,
               sum_qty
        FROM (
          SELECT l_orderkey, SUM(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity::DECIMAL(18,2))::DOUBLE > 250
        ) big
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    "q19_disjunctive": f"""
        SELECT SUM({_REV})::DOUBLE AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q22_idle_customers": """
        SELECT c_mktsegment,
               COUNT(*) AS n_custs,
               SUM(c_acctbal::DECIMAL(18,2))::DOUBLE AS total_bal
        FROM customer
        WHERE c_acctbal > (SELECT ROUND(SUM(c_acctbal::DECIMAL(18,2))::DOUBLE
                                        / COUNT(*), 4)
                           FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2001-01-01')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
}


def q_discount_depth_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue and volume by discount depth band.

    Pricing's first question: how much revenue moves at each discount
    level, and what's the give-back? Discount bands come from the
    exact 2-dp decimal (never a float bucket edge), revenue and the
    discount give-back accumulate as exact decimals, shares ROUND 6.
    One map-side classification + a bands-sized rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc = dec2("l_discount")
    band = (
        F.when(disc == 0, "0: none")
        .when(disc <= 0.03, "1: 1-3%")
        .when(disc <= 0.06, "2: 4-6%")
        .otherwise("3: 7%+")
    )
    one = F.lit(1).cast("decimal(18,2)")
    rev = dec2("l_extendedprice") * (one - disc)
    giveback = dec2("l_extendedprice") * disc
    grid = li.groupBy(band.alias("discount_band")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(rev).cast("decimal(38,4)").alias("revenue"),
        F.sum(giveback).cast("decimal(38,4)").alias("give_back"),
    )
    wt = Window.partitionBy()
    return grid.select(
        "discount_band",
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.round(F.col("revenue").cast("double"), 2).alias("revenue"),
        F.round(F.col("give_back").cast("double"), 2).alias("give_back"),
        F.round(
            F.col("revenue").cast("double")
            / F.sum("revenue").over(wt).cast("double"),
            6,
        ).alias("revenue_share"),
    ).orderBy("discount_band")


QUERIES["q_discount_depth_profile"] = q_discount_depth_profile

ORACLES["q_discount_depth_profile"] = """
    WITH grid AS (
      SELECT CASE
               WHEN CAST(l_discount AS DECIMAL(18,2)) = 0 THEN '0: none'
               WHEN CAST(l_discount AS DECIMAL(18,2)) <= 0.03 THEN '1: 1-3%'
               WHEN CAST(l_discount AS DECIMAL(18,2)) <= 0.06 THEN '2: 4-6%'
               ELSE '3: 7%+'
             END AS discount_band,
             COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2))))
                  AS DECIMAL(38,4)) AS revenue,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2)))
                  AS DECIMAL(38,4)) AS give_back
      FROM lineitem GROUP BY 1
    )
    SELECT discount_band,
           n_lines::BIGINT AS n_lines,
           ROUND(revenue::DOUBLE, 2) AS revenue,
           ROUND(give_back::DOUBLE, 2) AS give_back,
           ROUND(revenue::DOUBLE / SUM(revenue) OVER ()::DOUBLE, 6)
             AS revenue_share
    FROM grid ORDER BY discount_band
"""
