"""Shaping operators: pivot, rollup hierarchies, semi/anti joins,
JSON field extraction.

Pivot uses an explicit value list so the plan is a single-pass
conditional aggregation (no extra distinct-values job — essential at
scale, where a pivot without a value list triggers a full scan just to
discover columns). Semi/anti joins use Spark's dedicated join types so
the build side stays a broadcast hash when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_city_directories_spark.functions.numeric import dec2, money_sum, ratio
from etl_city_directories_spark.sources.tables import (
    load_table,
    load_table_parallel,
)

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event matrix: one column per event type (conditional agg)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
        .orderBy("day")
    )


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP (returnflag, linestatus) with grouping id.

    Parallel scan: rollup EXPANDs every row ×3 grouping sets before the
    partial agg, so map-side cost is 3× the scan — the widened scan
    keeps that on all cores (no-op at real multi-split scale).
    """
    l = load_table_parallel(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("grp_id"),
            money_sum(dec2("l_quantity"), "sum_qty"),
            money_sum(dec2("l_extendedprice"), "sum_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS beyond rollup/cube: a custom set mix
    ((status, priority), (status), (priority)) — neither a rollup (no
    grand total) nor a cube (not all 2² sets) — with grouping_id to
    disambiguate the NULL-vs-subtotal rows.

    Same execution shape as rollup: EXPAND ×|sets| before the partial
    agg, one shuffle on the expanded keys.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [
                ["o_orderstatus", "o_orderpriority"],
                ["o_orderstatus"],
                ["o_orderpriority"],
            ],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("grp_id"),
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(dec2("o_totalprice"), "total_price"),
        )
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders (left anti join)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_anti"
        ).select("c_custkey", "c_name", "c_mktsegment")
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one urgent order (left semi join)."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        customer.join(
            urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
        ).select("c_custkey", "c_name", "c_mktsegment")
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract a JSON field from the event props payload and aggregate.

    get_json_object is a JVM-side expression — the JSON never reaches
    Python. At 100 TB this is a pure map-side projection.
    """
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            ratio(F.sum("k"), F.count(F.lit(1)), "avg_k"),
            F.max("k").alias("max_k"),
            F.min("k").alias("min_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered event-type sequence (collect_list → array_sort
    → transform → array_join) — the sequence-analytics shape behind
    session-path mining.

    One shuffle on user_id; the ordered reconstruction happens inside
    the aggregate (structs sorted by (ts, event_id) for a total order),
    not via a global sort. Per-user memory is the user's own event
    list — bounded by per-key cardinality, the same contract as
    collect_list anywhere.
    """
    events = load_table(spark, sf_dir, "events")
    seq = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros("ts").alias("ts_us"),
                F.col("event_id").alias("event_id"),
                F.col("event_type").alias("event_type"),
            )
        )
    )
    return (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(seq, lambda s: s["event_type"]), ">"
            ).alias("path"),
        )
        .orderBy("user_id")
    )


TOP_PER_SEGMENT = 3


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered group concatenation (LISTAGG / string_agg): per market
    segment, the top-3 customers by balance joined into one ordered
    string — the reporting shape every SQL surface needs.

    Spark has no ordered string_agg aggregate, so the order is made
    explicit data: collect_list of (rank, name) structs, array_sort
    (rank is the struct's leading field, so the sort IS the order),
    then transform+array_join — deterministic regardless of partial-
    aggregation arrival order. One window rank + one tiny groupBy;
    per-group state is the top-K list only.
    """
    from pyspark.sql import Window

    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    top = customer.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_PER_SEGMENT
    )
    seq = F.array_sort(
        F.collect_list(F.struct(F.col("rnk"), F.col("c_name")))
    )
    return (
        top.groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.transform(seq, lambda s: s["c_name"]), ", "
            ).alias("top_customers"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_mktsegment")
    )


QUERIES = {
    "q_pivot": q_pivot,
    "q_string_agg": q_string_agg,
    "q_event_paths": q_event_paths,
    "q_rollup": q_rollup,
    "q_grouping_sets": q_grouping_sets,
    "q_anti_join": q_anti_join,
    "q_semi_join": q_semi_join,
    "q_json_extract": q_json_extract,
}

ORACLES = {
    "q_string_agg": f"""
        WITH ranked AS (
          SELECT c_mktsegment, c_name,
                 ROW_NUMBER() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey ASC
                 ) AS rnk
          FROM customer
        )
        SELECT c_mktsegment,
               string_agg(c_name, ', ' ORDER BY rnk) AS top_customers,
               COUNT(*) AS n
        FROM ranked
        WHERE rnk <= {TOP_PER_SEGMENT}
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q_event_paths": """
        SELECT user_id,
               COUNT(*) AS n_events,
               STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    "q_pivot": """
        SELECT
          strftime(ts, '%Y-%m-%d') AS day,
          COUNT(*) FILTER (event_type = 'click') AS click,
          COUNT(*) FILTER (event_type = 'error') AS error,
          COUNT(*) FILTER (event_type = 'purchase') AS purchase,
          COUNT(*) FILTER (event_type = 'signup') AS signup,
          COUNT(*) FILTER (event_type = 'view') AS view
        FROM events
        GROUP BY 1
        ORDER BY day
    """,
    "q_rollup": """
        SELECT
          l_returnflag,
          l_linestatus,
          GROUPING(l_returnflag, l_linestatus)::BIGINT AS grp_id,
          SUM(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
          SUM(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_price,
          COUNT(*) AS n_items
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "q_grouping_sets": """
        SELECT
          o_orderstatus,
          o_orderpriority,
          GROUPING(o_orderstatus, o_orderpriority)::BIGINT AS grp_id,
          COUNT(*) AS n_orders,
          SUM(o_totalprice::DECIMAL(18,2))::DOUBLE AS total_price
        FROM orders
        GROUP BY GROUPING SETS (
          (o_orderstatus, o_orderpriority),
          (o_orderstatus),
          (o_orderpriority)
        )
    """,
    "q_anti_join": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "q_semi_join": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        )
    """,
    "q_json_extract": """
        SELECT
          event_type,
          ROUND(SUM(json_extract(props, '$.k')::BIGINT)::DOUBLE / COUNT(*), 4) AS avg_k,
          MAX(json_extract(props, '$.k')::BIGINT) AS max_k,
          MIN(json_extract(props, '$.k')::BIGINT) AS min_k,
          COUNT(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
}


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) the daily event-type matrix back to long form —
    the inverse of ``q_pivot``, closing the reshape round-trip.

    Uses the native ``unpivot`` operator (Spark's EXPAND node: each row
    emits one output row per value column in a single map-side pass —
    no join, no shuffle beyond the upstream pivot's). Zero cells are
    kept so pivot→unpivot is lossless; the oracle replays the identical
    round trip with UNPIVOT INCLUDE NULLS semantics via UNION ALL arms.
    """
    wide = q_pivot(spark, sf_dir)
    return (
        wide.unpivot(
            ids=["day"],
            values=list(EVENT_TYPES),
            variableColumnName="event_type",
            valueColumnName="n_events",
        )
        .withColumn("n_events", F.col("n_events").cast("bigint"))
        .orderBy("day", "event_type")
    )


QUERIES["q_unpivot"] = q_unpivot

_UNPIVOT_ARMS = "\n      UNION ALL ".join(
    f"SELECT day, '{t}' AS event_type, {t} AS n_events FROM wide"
    for t in EVENT_TYPES
)

ORACLES["q_unpivot"] = f"""
    WITH wide AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             COUNT(*) FILTER (event_type = 'click')::BIGINT AS click,
             COUNT(*) FILTER (event_type = 'error')::BIGINT AS error,
             COUNT(*) FILTER (event_type = 'purchase')::BIGINT AS purchase,
             COUNT(*) FILTER (event_type = 'signup')::BIGINT AS signup,
             COUNT(*) FILTER (event_type = 'view')::BIGINT AS view
      FROM events GROUP BY 1
    )
    SELECT day, event_type, n_events FROM (
      {_UNPIVOT_ARMS}
    ) ORDER BY day, event_type
"""
