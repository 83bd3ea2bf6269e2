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


MAD_K = 3.0


def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly counts per event type: a value is anomalous when
    its absolute deviation from the type median exceeds K× the median
    absolute deviation — the outlier rule that, unlike z-scores,
    doesn't let the outliers themselves inflate the threshold.

    Two tiny per-type aggregates (median, then MAD over deviations)
    broadcast back onto the stream; the flagging pass is map-side.
    Median and MAD are quantized to 4dp BEFORE any comparison so the
    boundary predicate evaluates on identical doubles in both engines
    — a last-ulp percentile difference can't flip a flag.
    """
    events = load_table(spark, sf_dir, "events").select(
        "event_type", dec2("value").cast("double").alias("v")
    )
    med = events.groupBy("event_type").agg(
        F.round(F.expr("percentile(v, 0.5)"), 4).alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.round(F.abs(F.col("v") - F.col("med")), 4).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(adev, 0.5)"), 4).alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.first("med").alias("median"),
            F.first("mad").alias("mad"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("adev") > F.lit(MAD_K) * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_anomalies"),
        )
        .orderBy("event_type")
    )


def q_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each user's purchase revenue credited
    to their first-ever event type (first_value over the user's
    timeline). One shuffle on user_id — the attribution window and the
    per-user fold share it — then a tiny channel rollup.
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = events.select(
        "user_id",
        F.first("event_type").over(w).alias("first_channel"),
        F.when(F.col("event_type") == "purchase", dec2("value"))
        .otherwise(F.lit(0).cast("decimal(18,2)"))
        .alias("purchase_value"),
    )
    return (
        attributed.groupBy("first_channel")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.sum("purchase_value").cast("double").alias("attributed_revenue"),
        )
        .orderBy("first_channel")
    )


MOVING_AVG_DAYS = 7


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily purchase revenue (bounded ROWS
    frame over the pre-aggregated daily series).

    The raw stream collapses to one row per day FIRST (map-side
    partial agg, one shuffle), so the window frame slides over
    O(days) rows — never over raw events. The day series is a single
    unpartitioned window, fine because |days| is tiny; a per-entity
    moving average would partition by the entity key.
    """
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.sum(dec2("value")).alias("day_rev"))
    )
    w = (
        Window.partitionBy()
        .orderBy("day")
        .rowsBetween(-(MOVING_AVG_DAYS - 1), Window.currentRow)
    )
    # exact decimal frame-sum / frame-count, not windowed AVG(double):
    # incremental double add/remove on the sliding frame can drift
    # between engines; the decimal sum cannot
    return daily.select(
        "day",
        F.col("day_rev").cast("double").alias("day_revenue"),
        F.round(
            F.sum("day_rev").over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double"),
            4,
        ).alias("moving_avg_7d"),
    ).orderBy("day")


def q_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event type by day — the running
    "unique users to date" series every growth dashboard needs.

    COUNT(DISTINCT) OVER a running frame doesn't exist (and a
    collect_set window would hold every user in window state); the
    scalable form is first-occurrence flags: one row_number over
    (type, user) marks each user's first day, then the daily rollup
    of flags prefix-sums into the cumulative series. Two shuffles —
    (type, user) then (type, day) — both with map-side partials,
    state O(1) per row. This is the shape that survives a billion
    users; the window state never exceeds the daily series length.
    """
    events = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    w_first = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "event_type",
        "user_id",
        day.alias("day"),
        F.row_number().over(w_first).alias("rn"),
    )
    daily = flagged.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("new_users"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "n_events",
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w_cum).cast("bigint").alias("cum_distinct_users"),
    )


HIST_BINS = 10


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin value histogram per event type over a global [min,
    max) range — the distribution profile a data-quality dashboard
    renders.

    The bin edges come from one tiny global aggregate (broadcast as a
    1-row cross join — the scalar-subquery idiom); binning is pure
    map-side arithmetic and the histogram itself is a (type, bin)
    groupBy with partial aggregation, so shuffle volume is
    O(types × bins) regardless of row count.
    """
    events = load_table(spark, sf_dir, "events")
    v = dec2("value").cast("double")
    bounds = events.agg(
        F.min(v).alias("lo"), F.max(v).alias("hi")
    )
    binned = events.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.least(
            F.lit(HIST_BINS - 1),
            F.floor(
                (v - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / F.lit(float(HIST_BINS)))
            ),
        ).cast("bigint").alias("bin"),
    )
    return (
        binned.groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type", "bin")
    )


def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: daily purchase revenue joined onto a
    generated date spine so missing days appear as explicit zero rows
    — the densification step every downstream time-series consumer
    (moving averages, forecasting) assumes.

    The raw stream collapses to O(days) rows FIRST; the spine is
    ``sequence(min, max)`` exploded from the 1-row bounds aggregate,
    so the join is tiny-×-tiny regardless of corpus size. Zero
    shuffles beyond the daily pre-aggregation.
    """
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum(dec2("value")).cast("double").alias("rev"))
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    return (
        spine.join(daily, "d", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce("rev", F.lit(0.0)).alias("day_revenue"),
            F.col("rev").isNull().alias("is_filled"),
        )
        .orderBy("day")
    )


RANGE_FRAME_DAYS = 30


def q_range_frame_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-day order total per customer via a time-keyed RANGE
    frame — the value-based window frame (vs q_moving_avg's ROWS
    frame): the frame is defined by the ORDER-BY VALUE interval
    [day-29, day], so it is insensitive to how many rows share a day
    and needs no pre-aggregation to a daily series.

    One shuffle on the customer key; the frame sum is exact decimal so
    the sliding add/remove can't drift between engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-(RANGE_FRAME_DAYS - 1), 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            day.cast("bigint").alias("day"),
            dec2("o_totalprice").alias("p"),
        )
        .select(
            "o_custkey",
            "o_orderkey",
            "day",
            F.sum("p").over(w).cast("double").alias("trailing_total"),
            F.count(F.lit(1)).over(w).alias("n_in_frame"),
        )
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers bucketed by first-order month, then
    counted per (cohort, month-offset) — the standard retention
    triangle.

    Two shuffles on o_custkey (first-order month, distinct activity
    months) that AQE coalesces onto the same key, then one small
    shuffle on the (cohort, offset) pair. months_between on
    month-truncated dates is integral, so the offset is exact in both
    engines.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("m")
    )
    firsts = o.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    activity = o.distinct()
    return (
        activity.join(firsts, "o_custkey")
        .select(
            "o_custkey",
            F.date_format("cohort_m", "yyyy-MM").alias("cohort_month"),
            F.round(F.months_between("m", "cohort_m"))
            .cast("bigint")
            .alias("month_offset"),
        )
        .groupBy("cohort_month", "month_offset")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
        .orderBy("cohort_month", "month_offset")
    )


def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, runs of CONSECUTIVE active days
    (an island breaks when a calendar day is skipped) — the classic
    streak analysis (login streaks, sensor uptime).

    Single-pass shape: distinct (user, day) → lag(day) flags island
    starts → running sum numbers the islands → two nested groupBys.
    Every window/groupBy partitions by user_id, so the whole operator
    is ONE shuffle of narrow (user, day) rows; island state never
    leaves the executor. The date-minus-row-number trick is avoided
    on purpose: lag→flag→cumsum states the semantics and costs the
    same one pass.
    """
    events = load_table(spark, sf_dir, "events")
    days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = (
        days.withColumn(
            "new_island",
            F.when(
                F.datediff("day", F.lag("day").over(w)) == 1, F.lit(0)
            ).otherwise(F.lit(1)),
        )
        .withColumn(
            "island_id",
            F.sum("new_island").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "island_id")
        .agg(F.count(F.lit(1)).alias("len_days"))
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.max("len_days").alias("longest_streak"),
            F.sum("len_days").alias("active_days"),
        )
        .orderBy("user_id")
    )


N_DEPTH_BUCKETS = 10


def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-height) histogram of order totals: NTILE(10)
    bucket boundaries + counts — the quantile-sketch complement to
    ``q_value_histogram``'s equi-width bins, and the statistics shape
    an optimizer's column histogram stores.

    A bare ``NTILE() OVER (ORDER BY ...)`` would pull the whole table
    into ONE reducer (Spark warns: "No Partition Defined") — the
    single-machine sort that dies first at 100 TB. Instead the global
    rank is built distributed: repartitionByRange on the sort key
    (contiguous ordered ranges across partitions), row_number WITHIN
    each partition, then each partition's global offset arrives from
    an O(partitions) count table via broadcast. NTILE's exact
    fill-first-buckets semantics (first n%B buckets take one extra
    row) are then a per-row closed-form expression over the global
    rank — bit-identical to the oracle's NTILE, no single-reducer
    stage anywhere. Ties can't exist: o_orderkey completes the total
    order.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    ranged = orders.repartitionByRange(
        32, F.asc("o_totalprice"), F.asc("o_orderkey")
    ).withColumn("pid", F.spark_partition_id())
    wp = Window.partitionBy("pid").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    local = ranged.withColumn("lr", F.row_number().over(wp))
    # O(partitions) rows: per-range counts -> exclusive prefix sum
    # (the tiny table may sort on one reducer; the DATA never does)
    wo = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        local.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("off", F.coalesce(F.sum("cnt").over(wo), F.lit(0)))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy()))
        .select("pid", "off", "n")
    )
    b = F.lit(N_DEPTH_BUCKETS).cast("bigint")
    r = (F.col("lr") + F.col("off")).cast("bigint")
    q = F.floor(F.col("n") / b).cast("bigint")
    rem = (F.col("n") % b).cast("bigint")
    # ceil(a / d) in exact integer math: (a + d - 1) div d
    in_fat = r <= rem * (q + 1)
    bucket = F.when(q == 0, r).otherwise(
        F.when(in_fat, F.floor((r + q) / (q + 1))).otherwise(
            rem + F.floor((r - rem * (q + 1) + q - 1) / q)
        )
    )
    return (
        local.join(F.broadcast(offs), "pid")
        .withColumn("bucket", bucket.cast("bigint"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


QUERIES = {
    "q_running_distinct": q_running_distinct,
    "q_gaps_islands": q_gaps_islands,
    "q_histogram_equidepth": q_histogram_equidepth,
    "q_anomaly_mad": q_anomaly_mad,
    "q_value_histogram": q_value_histogram,
    "q_date_spine": q_date_spine,
    "q_range_frame_total": q_range_frame_total,
    "q_cohort_retention": q_cohort_retention,
    "q_first_touch": q_first_touch,
    "q_moving_avg": q_moving_avg,
    "q_window_running": q_window_running,
    "q_window_rank": q_window_rank,
    "q_sessionize": q_sessionize,
    "q_percentiles": q_percentiles,
}

ORACLES = {
    "q_gaps_islands": """
        WITH days AS (
          SELECT DISTINCT user_id, ts::DATE AS day FROM events
        ),
        flagged AS (
          SELECT user_id, day,
                 CASE WHEN date_diff('day',
                        LAG(day) OVER (PARTITION BY user_id ORDER BY day),
                        day) = 1
                      THEN 0 ELSE 1 END AS new_island
          FROM days
        ),
        numbered AS (
          SELECT user_id, day,
                 SUM(new_island) OVER (
                   PARTITION BY user_id ORDER BY day
                   ROWS UNBOUNDED PRECEDING
                 ) AS island_id
          FROM flagged
        ),
        islands AS (
          SELECT user_id, island_id, COUNT(*) AS len_days
          FROM numbered GROUP BY user_id, island_id
        )
        SELECT user_id,
               COUNT(*) AS n_islands,
               MAX(len_days) AS longest_streak,
               SUM(len_days)::BIGINT AS active_days
        FROM islands
        GROUP BY user_id
        ORDER BY user_id
    """,
    "q_histogram_equidepth": f"""
        WITH t AS (
          SELECT o_totalprice,
                 NTILE({N_DEPTH_BUCKETS}) OVER (
                   ORDER BY o_totalprice ASC, o_orderkey ASC
                 ) AS bucket
          FROM orders
        )
        SELECT bucket,
               COUNT(*) AS n_orders,
               ROUND(MIN(o_totalprice), 2) AS lo,
               ROUND(MAX(o_totalprice), 2) AS hi
        FROM t
        GROUP BY bucket
        ORDER BY bucket
    """,
    "q_anomaly_mad": f"""
        WITH e AS (
          SELECT event_type, value::DECIMAL(18,2)::DOUBLE AS v FROM events
        ),
        med AS (
          SELECT event_type, ROUND(quantile_cont(v, 0.5), 4) AS med
          FROM e GROUP BY event_type
        ),
        dev AS (
          SELECT e.event_type, med, ROUND(ABS(v - med), 4) AS adev
          FROM e JOIN med USING (event_type)
        ),
        mad AS (
          SELECT event_type, ROUND(quantile_cont(adev, 0.5), 4) AS mad
          FROM dev GROUP BY event_type
        )
        SELECT dev.event_type,
               MIN(dev.med) AS median,
               MIN(mad.mad) AS mad,
               COUNT(*) AS n_events,
               SUM(CASE WHEN adev > {MAD_K} * mad.mad THEN 1 ELSE 0 END)::BIGINT
                 AS n_anomalies
        FROM dev JOIN mad ON dev.event_type = mad.event_type
        GROUP BY dev.event_type
        ORDER BY dev.event_type
    """,
    "q_running_distinct": """
        WITH flagged AS (
          SELECT event_type, user_id,
                 strftime(ts, '%Y-%m-%d') AS day,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type, user_id ORDER BY ts, event_id
                 ) AS rn
          FROM events
        ),
        daily AS (
          SELECT event_type, day,
                 COUNT(*) AS n_events,
                 SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS new_users
          FROM flagged
          GROUP BY event_type, day
        )
        SELECT event_type, day, n_events,
               new_users::BIGINT AS new_users,
               (SUM(new_users) OVER (
                  PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ))::BIGINT AS cum_distinct_users
        FROM daily
    """,
    "q_value_histogram": """
        WITH b AS (
          SELECT MIN(value::DECIMAL(18,2)::DOUBLE) AS lo,
                 MAX(value::DECIMAL(18,2)::DOUBLE) AS hi
          FROM events
        )
        SELECT event_type,
               LEAST(9, FLOOR((value::DECIMAL(18,2)::DOUBLE - lo)
                              / ((hi - lo) / 10.0)))::BIGINT AS bin,
               COUNT(*) AS n_events
        FROM events CROSS JOIN b
        GROUP BY 1, 2
        ORDER BY event_type, bin
    """,
    "q_date_spine": """
        WITH daily AS (
          SELECT ts::DATE AS d,
                 SUM(value::DECIMAL(18,2))::DOUBLE AS rev
          FROM events WHERE event_type = 'purchase'
          GROUP BY 1
        ),
        b AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
        spine AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
          FROM b
        )
        SELECT strftime(d, '%Y-%m-%d') AS day,
               COALESCE(rev, 0.0) AS day_revenue,
               rev IS NULL AS is_filled
        FROM spine LEFT JOIN daily USING (d)
        ORDER BY day
    """,
    "q_range_frame_total": f"""
        SELECT o_custkey, o_orderkey,
               (o_orderdate::DATE - DATE '1970-01-01')::BIGINT AS day,
               (SUM(o_totalprice::DECIMAL(18,2)) OVER (
                  PARTITION BY o_custkey
                  ORDER BY (o_orderdate::DATE - DATE '1970-01-01')
                  RANGE BETWEEN {RANGE_FRAME_DAYS - 1} PRECEDING
                            AND CURRENT ROW
               ))::DOUBLE AS trailing_total,
               COUNT(*) OVER (
                  PARTITION BY o_custkey
                  ORDER BY (o_orderdate::DATE - DATE '1970-01-01')
                  RANGE BETWEEN {RANGE_FRAME_DAYS - 1} PRECEDING
                            AND CURRENT ROW
               ) AS n_in_frame
        FROM orders
    """,
    "q_cohort_retention": """
        WITH months AS (
          SELECT o_custkey, date_trunc('month', o_orderdate) AS m
          FROM orders
        ),
        firsts AS (
          SELECT o_custkey, MIN(m) AS cohort_m FROM months GROUP BY o_custkey
        ),
        activity AS (
          SELECT DISTINCT o_custkey, m FROM months
        )
        SELECT strftime(cohort_m, '%Y-%m') AS cohort_month,
               datediff('month', cohort_m, m)::BIGINT AS month_offset,
               COUNT(DISTINCT o_custkey) AS n_customers
        FROM activity JOIN firsts USING (o_custkey)
        GROUP BY 1, 2
        ORDER BY cohort_month, month_offset
    """,
    "q_first_touch": """
        WITH attributed AS (
          SELECT user_id,
                 FIRST_VALUE(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS first_channel,
                 CASE WHEN event_type = 'purchase'
                      THEN value::DECIMAL(18,2)
                      ELSE 0.00::DECIMAL(18,2) END AS purchase_value
          FROM events
        )
        SELECT first_channel,
               COUNT(DISTINCT user_id) AS n_users,
               SUM(purchase_value)::DOUBLE AS attributed_revenue
        FROM attributed
        GROUP BY first_channel
        ORDER BY first_channel
    """,
    "q_moving_avg": f"""
        WITH daily AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day,
                 SUM(value::DECIMAL(18,2)) AS day_rev
          FROM events WHERE event_type = 'purchase'
          GROUP BY 1
        )
        SELECT day,
               day_rev::DOUBLE AS day_revenue,
               ROUND(
                 SUM(day_rev) OVER w::DOUBLE / COUNT(*) OVER w, 4
               ) AS moving_avg_7d
        FROM daily
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN {MOVING_AVG_DAYS - 1} PRECEDING
                     AND CURRENT ROW)
        ORDER BY day
    """,
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


def q_percentile_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / decile of customer balance per nation.

    The three relative-position window functions in one pass, with
    the ANSI definitions (percent_rank = (rank-1)/(n-1) with
    tie-shared ranks, cume_dist = peers-or-less / n, NTILE with
    floor-balanced groups over a TOTAL order — the custkey tiebreak
    makes the tile assignment deterministic). The ratios are NOT the
    engines' builtins-then-ROUND: a rank ratio lands exactly on
    6-dp midpoints (e.g. 41/640), where double ROUND diverges
    cross-engine, so both sides compute round_half_up(k/d * 1e6) in
    pure integer space — (2k*1e6 + d) div (2d) — and divide by 1e6
    once. One window sort over O(customers) rows per nation; at
    100 TB this keys on the same nation partitioning every
    per-nation rollup shuffles on, and never widens beyond four
    columns.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = cust.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    w_val = Window.partitionBy("n_name").orderBy("cents")
    w_tot = Window.partitionBy("n_name").orderBy("cents", "c_custkey")
    w_peers = (
        Window.partitionBy("n_name")
        .orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    n = F.count(F.lit(1)).over(Window.partitionBy("n_name"))
    rnk = F.rank().over(w_val)
    c_le = F.count(F.lit(1)).over(w_peers)  # peers-or-less (RANGE frame)

    def _ratio6(k, d):
        # round_half_up(k/d * 1e6) via exact DECIMAL floor-division
        # (Spark's `/` on bigints is a double divide, unsafe past
        # 2^53 rows), then one exact /1e6
        num = (k.cast("bigint") * 2000000 + d).cast("decimal(38,0)")
        micro = F.floor(num / (2 * d).cast("decimal(38,0)")).cast("bigint")
        return micro.cast("double") / 1e6

    return base.select(
        "n_name",
        "c_custkey",
        (F.col("cents").cast("double") / 100).alias("acctbal"),
        F.when(n > 1, _ratio6(rnk - 1, n - 1))
        .otherwise(F.lit(0.0))
        .alias("pct_rank"),
        _ratio6(c_le, n).alias("cume_dist"),
        F.ntile(10).over(w_tot).cast("bigint").alias("decile"),
    )


QUERIES["q_percentile_position"] = q_percentile_position

ORACLES["q_percentile_position"] = """
    WITH base AS (
      SELECT n.n_name, c.c_custkey,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    w AS (
      SELECT n_name, c_custkey, cents,
             COUNT(*) OVER (PARTITION BY n_name)::BIGINT AS n,
             RANK() OVER w_val::BIGINT AS rnk,
             COUNT(*) OVER (PARTITION BY n_name ORDER BY cents
                            RANGE UNBOUNDED PRECEDING)::BIGINT AS c_le,
             NTILE(10) OVER w_tot::BIGINT AS decile
      FROM base
      WINDOW
        w_val AS (PARTITION BY n_name ORDER BY cents),
        w_tot AS (PARTITION BY n_name ORDER BY cents, c_custkey)
    )
    SELECT n_name, c_custkey,
           CAST(cents AS DOUBLE) / 100 AS acctbal,
           CASE WHEN n > 1 THEN
             CAST(((rnk - 1) * 2000000 + (n - 1)) // (2 * (n - 1))
                  AS DOUBLE) / 1e6
           ELSE 0.0 END AS pct_rank,
           CAST((c_le * 2000000 + n) // (2 * n) AS DOUBLE) / 1e6 AS cume_dist,
           decile
    FROM w
"""


def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning active users — the top-line web metric.

    A user is "new" on their first-ever active day, "returning" on
    every later active day. One distinct (user, day) collapse, a
    per-user MIN window that reuses the same user_id shuffle, and a
    day rollup. Per-user state is one date — at 100 TB the plan is
    exactly one fact-wide shuffle plus a days-sized aggregation, the
    floor for any first-seen classification (the streaming twin would
    be transformWithState keyed on user).
    """
    events = load_table(spark, sf_dir, "events")
    active = events.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id")
    marked = active.select(
        "d",
        (F.col("d") == F.min("d").over(w)).alias("is_new"),
    )
    return (
        marked.groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("n_new"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("n_active").cast("bigint").alias("n_active"),
            F.col("n_new").cast("bigint").alias("n_new"),
            (F.col("n_active") - F.col("n_new")).cast("bigint").alias(
                "n_returning"
            ),
            F.round(
                F.col("n_new").cast("double") / F.col("n_active").cast("double"),
                4,
            ).alias("new_share"),
        )
        .orderBy("day")
    )


QUERIES["q_new_vs_returning"] = q_new_vs_returning

ORACLES["q_new_vs_returning"] = """
    WITH active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    marked AS (
      SELECT d, d = MIN(d) OVER (PARTITION BY user_id) AS is_new
      FROM active
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS day,
           COUNT(*)::BIGINT AS n_active,
           SUM(CASE WHEN is_new THEN 1 ELSE 0 END)::BIGINT AS n_new,
           (COUNT(*) - SUM(CASE WHEN is_new THEN 1 ELSE 0 END))::BIGINT
             AS n_returning,
           ROUND(SUM(CASE WHEN is_new THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*)::DOUBLE, 4) AS new_share
    FROM marked GROUP BY d ORDER BY day
"""


WEIGHTED_PCT_Q = "0.5"  # median; the rule generalizes to any q


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median unit price per return flag.

    The weighted percentile every pricing analysis needs (a plain
    median over line items over-weights small lots): the first price
    whose RUNNING quantity weight reaches half the group's total —
    exact integer weight comparison by cross-multiplication
    (2·cum ≥ total), no double thresholds.

    r10 optimization (guide §2.3, aggregate before you shuffle): the
    crossing PRICE depends only on the per-(flag, price) weight
    multiset, never on the row-level (orderkey, linenumber) tiebreak —
    all rows of the crossing price report the same price. So the rows
    collapse map-side to (flag, price, Σw, n) first and the cumulative
    window runs over O(distinct prices) rows per flag instead of the
    full fact. This also removes the former 3-partition sort of the
    whole table (l_returnflag has 3 values — the window partition was
    the parallelism ceiling AND the 100 TB skew hazard); the heavy
    work is now a map-side-combinable hash aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (dec2("l_extendedprice") * 100).cast("long").alias("price_c"),
        (dec2("l_quantity") * 100).cast("long").alias("w"),
    )
    per_price = li.groupBy("l_returnflag", "price_c").agg(
        F.sum("w").alias("pw"), F.count(F.lit(1)).alias("pn")
    )
    ws = Window.partitionBy("l_returnflag").orderBy("price_c").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("l_returnflag")
    cum = per_price.select(
        "l_returnflag",
        "price_c",
        F.sum("pw").over(ws).alias("cw"),
        F.sum("pw").over(wt).alias("tw"),
        F.sum("pn").over(wt).alias("n_rows"),
    )
    hits = cum.filter(2 * F.col("cw") >= F.col("tw"))
    wmin = Window.partitionBy("l_returnflag").orderBy("price_c")
    first = hits.select(
        "l_returnflag",
        "price_c",
        "tw",
        "n_rows",
        F.row_number().over(wmin).alias("rk"),
    ).filter(F.col("rk") == 1)
    return first.select(
        "l_returnflag",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("tw").cast("double") / 100).alias("total_qty"),
        F.round(F.col("price_c").cast("double") / 100, 2).alias(
            "weighted_median_price"
        ),
    ).orderBy("l_returnflag")


QUERIES["q_weighted_median"] = q_weighted_median

ORACLES["q_weighted_median"] = """
    WITH li AS (
      SELECT l_returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS price_c,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS w,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    cum AS (
      SELECT l_returnflag, price_c,
             SUM(w) OVER (PARTITION BY l_returnflag
                          ORDER BY price_c, l_orderkey, l_linenumber
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n_rows
      FROM li
    ),
    first AS (
      SELECT l_returnflag, price_c, tw, n_rows,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY cw, price_c) AS rk
      FROM cum WHERE 2 * cw >= tw
    )
    SELECT l_returnflag,
           n_rows::BIGINT AS n_rows,
           tw::DOUBLE / 100 AS total_qty,
           ROUND(price_c::DOUBLE / 100, 2) AS weighted_median_price
    FROM first WHERE rk = 1 ORDER BY l_returnflag
"""


def q_order_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size distribution: line items per order, as a histogram.

    The order-shape profile batching and picking logistics are sized
    from: one map-side count per order, then an O(sizes) histogram
    with shares and the cumulative curve. Two chained partial-agg
    shuffles; nothing sorts the fact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items")
    )
    hist = per_order.groupBy("n_items").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    wt = Window.partitionBy()
    wc = Window.orderBy("n_items").rowsBetween(Window.unboundedPreceding, 0)
    return hist.select(
        F.col("n_items").cast("bigint").alias("n_items"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.round(
            F.col("n_orders").cast("double")
            / F.sum("n_orders").over(wt).cast("double"),
            6,
        ).alias("share"),
        F.round(
            F.sum("n_orders").over(wc).cast("double")
            / F.sum("n_orders").over(wt).cast("double"),
            6,
        ).alias("cum_share"),
    ).orderBy("n_items")


QUERIES["q_order_size_histogram"] = q_order_size_histogram

ORACLES["q_order_size_histogram"] = """
    WITH per_order AS (
      SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY 1
    ),
    hist AS (
      SELECT n_items, COUNT(*) AS n_orders FROM per_order GROUP BY 1
    )
    SELECT n_items::BIGINT AS n_items,
           n_orders::BIGINT AS n_orders,
           ROUND(n_orders::DOUBLE / SUM(n_orders) OVER ()::DOUBLE, 6)
             AS share,
           ROUND(SUM(n_orders) OVER (ORDER BY n_items
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE
                 / SUM(n_orders) OVER ()::DOUBLE, 6) AS cum_share
    FROM hist ORDER BY n_items
"""


def q_order_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap distribution per market segment.

    The purchase-cadence profile replenishment and CRM timing read:
    days between a customer's consecutive orders, rolled to exact
    min/median/p90/max per segment via the shared closed-form rank
    rule. One custkey-partitioned lag window (orderdate, orderkey
    tiebreak), one segment-partitioned rank — both dimension-scale
    sorts after the fact collapses to (customer, date) rows.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("od"), "o_orderkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    gaps = (
        orders.select(
            "o_custkey",
            F.datediff("od", F.lag("od").over(w)).cast("long").alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", "gap")
    )
    wr = Window.partitionBy("c_mktsegment").orderBy("gap")
    wn = Window.partitionBy("c_mktsegment")
    ranked = gaps.select(
        "c_mktsegment",
        "gap",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.max("n").cast("bigint").alias("n_gaps"),
            F.min("gap").alias("min_days"),
            F.max(
                F.when(F.col("rn") == F.ceil(F.col("n") / 2), F.col("gap"))
            ).alias("median_days"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.col("n") * 9 / 10), F.col("gap")
                )
            ).alias("p90_days"),
            F.max("gap").alias("max_days"),
        )
        .orderBy("c_mktsegment")
    )


QUERIES["q_order_gap_percentiles"] = q_order_gap_percentiles

ORACLES["q_order_gap_percentiles"] = """
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
               LAG(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
               CAST(o_orderdate AS DATE))::BIGINT AS gap
      FROM orders QUALIFY gap IS NOT NULL
    ),
    seg AS (
      SELECT c.c_mktsegment, g.gap
      FROM gaps g JOIN customer c ON c.c_custkey = g.o_custkey
    ),
    ranked AS (
      SELECT c_mktsegment, gap,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY gap) AS rn,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM seg
    )
    SELECT c_mktsegment,
           MAX(n)::BIGINT AS n_gaps,
           MIN(gap)::BIGINT AS min_days,
           MAX(CASE WHEN rn = CEIL(n / 2.0) THEN gap END)::BIGINT
             AS median_days,
           MAX(CASE WHEN rn = CEIL(n * 9 / 10.0) THEN gap END)::BIGINT
             AS p90_days,
           MAX(gap)::BIGINT AS max_days
    FROM ranked GROUP BY 1 ORDER BY 1
"""


DONCHIAN_DAYS = 7  # trailing channel width (excludes the current day)
RSI_DAYS = 14  # Cutler's RSI lookback (SMA of gains/losses)
WMA_DAYS = 7  # linearly-weighted MA span; weight of day t-k is 7-k


def _daily_purchase_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase revenue in integer cents — the shared price
    series under the drawdown/channel/RSI/WMA family.

    One map-side partial groupBy collapses the raw event stream to
    O(days) rows; every window below runs on that grid, so the window
    cost is independent of corpus size. Cents are BIGINT-exact, so
    the running sums / frame sums downstream are order-independent.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            (F.sum(dec2("value")) * 100).cast("bigint").alias("cents")
        )
    )


_DAILY_CENTS_CTE = """
        daily AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day,
                 CAST(SUM(value::DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'
          GROUP BY 1
        )
"""


def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running peak and drawdown of cumulative daily revenue — the
    max-drawdown series risk dashboards track on any cumulative KPI
    (equity curve, cumulative bookings, cumulative margin).

    Two stacked prefix windows over the daily grid: BIGINT running
    sum of cents, then running max of that sum; drawdown_pct is the
    one double divide, rounded. The windows are unpartitioned but run
    over O(days) rows, never over raw events — the same
    pre-aggregate-then-window shape as q_moving_avg.
    """
    daily = _daily_purchase_cents(spark, sf_dir)
    w = Window.partitionBy().orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select("day", F.sum("cents").over(w).alias("cum_cents"))
    series = cum.select(
        "day",
        "cum_cents",
        F.max("cum_cents").over(w).alias("peak_cents"),
    )
    return series.select(
        "day",
        (F.col("cum_cents").cast("double") / 100).alias("cum_revenue"),
        (F.col("peak_cents").cast("double") / 100).alias("peak_revenue"),
        F.round(
            (F.col("peak_cents") - F.col("cum_cents")).cast("double")
            / F.col("peak_cents").cast("double"),
            6,
        ).alias("drawdown_pct"),
    ).orderBy("day")


def q_donchian_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Donchian channel over daily revenue: trailing 7-day high/low
    band (EXCLUDING the current day) plus breakout flags — the
    classic band-breakout anomaly read, applied to an ops KPI.

    One frame over the daily grid; rows without a full trailing
    window are dropped (a partial channel is not a channel), so
    every emitted band summarizes exactly DONCHIAN_DAYS days. BIGINT
    min/max frames are exact; the midline is the one double divide.
    """
    daily = _daily_purchase_cents(spark, sf_dir)
    w_ord = Window.partitionBy().orderBy("day")
    w_band = w_ord.rowsBetween(-DONCHIAN_DAYS, -1)
    series = daily.select(
        "day",
        "cents",
        F.row_number().over(w_ord).alias("rn"),
        F.max("cents").over(w_band).alias("hi_cents"),
        F.min("cents").over(w_band).alias("lo_cents"),
    ).filter(F.col("rn") > DONCHIAN_DAYS)
    return series.select(
        "day",
        (F.col("cents").cast("double") / 100).alias("day_revenue"),
        (F.col("hi_cents").cast("double") / 100).alias("channel_high"),
        (F.col("lo_cents").cast("double") / 100).alias("channel_low"),
        F.round(
            (F.col("hi_cents") + F.col("lo_cents")).cast("double") / 200, 4
        ).alias("channel_mid"),
        (F.col("cents") > F.col("hi_cents")).alias("breakout_up"),
        (F.col("cents") < F.col("lo_cents")).alias("breakout_down"),
    ).orderBy("day")


def q_rsi_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day RSI (Cutler's variant: simple — not Wilder-recursive —
    averages of gains and losses), the bounded momentum oscillator.

    Cutler's SMA form is chosen deliberately: it is a pure frame
    aggregate, so it stays exact, windowable, and cross-engine
    deterministic, where Wilder's exponential recursion would need
    either an iterative loop or float-drift-prone unrolling. Deltas,
    gains, and losses are BIGINT cents; only the final ratio is a
    double. Rows without 14 full deltas are dropped.
    """
    daily = _daily_purchase_cents(spark, sf_dir)
    w_ord = Window.partitionBy().orderBy("day")
    delta = (F.col("cents") - F.lag("cents").over(w_ord)).alias("delta")
    deltas = daily.select(
        "day", "cents", delta, F.row_number().over(w_ord).alias("rn")
    ).filter(F.col("rn") > 1)
    w_frame = Window.partitionBy().orderBy("day").rowsBetween(
        -(RSI_DAYS - 1), Window.currentRow
    )
    gains = F.sum(F.greatest(F.col("delta"), F.lit(0))).over(w_frame)
    losses = F.sum(F.greatest(-F.col("delta"), F.lit(0))).over(w_frame)
    scored = deltas.select(
        "day",
        "cents",
        F.row_number().over(Window.partitionBy().orderBy("day")).alias("drn"),
        gains.alias("gain_cents"),
        losses.alias("loss_cents"),
    ).filter(F.col("drn") >= RSI_DAYS)
    return scored.select(
        "day",
        (F.col("cents").cast("double") / 100).alias("day_revenue"),
        F.when(
            F.col("gain_cents") + F.col("loss_cents") == 0, F.lit(50.0)
        )
        .otherwise(
            F.round(
                F.lit(100.0) * F.col("gain_cents").cast("double")
                / (F.col("gain_cents") + F.col("loss_cents")).cast("double"),
                4,
            )
        )
        .alias("rsi_14"),
    ).orderBy("day")


def q_weighted_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day linearly-weighted moving average (WMA): today weighs 7,
    six days ago weighs 1 — the lag-sensitive smoother chartists use
    where the plain MA reacts too slowly.

    SQL window frames cannot weight by position, so the WMA is the
    explicit LAG polynomial — 7 BIGINT terms, exact, identical text
    in both engines — divided once by the constant weight mass 28.
    Rows without a full 7-day history are dropped. Still one window
    pass over the O(days) grid.
    """
    daily = _daily_purchase_cents(spark, sf_dir)
    w_ord = Window.partitionBy().orderBy("day")
    wma_cents = sum(
        (
            F.lag("cents", k).over(w_ord) * (WMA_DAYS - k)
            for k in range(1, WMA_DAYS)
        ),
        F.col("cents") * WMA_DAYS,
    )
    weight_mass = WMA_DAYS * (WMA_DAYS + 1) // 2
    series = daily.select(
        "day",
        "cents",
        F.row_number().over(w_ord).alias("rn"),
        wma_cents.alias("wma_cents"),
    ).filter(F.col("rn") >= WMA_DAYS)
    return series.select(
        "day",
        (F.col("cents").cast("double") / 100).alias("day_revenue"),
        F.round(
            F.col("wma_cents").cast("double") / weight_mass / 100, 4
        ).alias(f"wma_{WMA_DAYS}d"),
    ).orderBy("day")


QUERIES["q_drawdown"] = q_drawdown
QUERIES["q_donchian_channel"] = q_donchian_channel
QUERIES["q_rsi_sma"] = q_rsi_sma
QUERIES["q_weighted_moving_avg"] = q_weighted_moving_avg

ORACLES["q_drawdown"] = f"""
    WITH {_DAILY_CENTS_CTE},
    cum AS (
      SELECT day,
             SUM(cents) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
               AS cum_cents
      FROM daily
    ),
    series AS (
      SELECT day, cum_cents,
             MAX(cum_cents) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
               AS peak_cents
      FROM cum
    )
    SELECT day,
           cum_cents::DOUBLE / 100 AS cum_revenue,
           peak_cents::DOUBLE / 100 AS peak_revenue,
           ROUND((peak_cents - cum_cents)::DOUBLE / peak_cents::DOUBLE, 6)
             AS drawdown_pct
    FROM series ORDER BY day
"""

ORACLES["q_donchian_channel"] = f"""
    WITH {_DAILY_CENTS_CTE},
    series AS (
      SELECT day, cents,
             ROW_NUMBER() OVER (ORDER BY day) AS rn,
             MAX(cents) OVER w AS hi_cents,
             MIN(cents) OVER w AS lo_cents
      FROM daily
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN {DONCHIAN_DAYS} PRECEDING AND 1 PRECEDING)
    )
    SELECT day,
           cents::DOUBLE / 100 AS day_revenue,
           hi_cents::DOUBLE / 100 AS channel_high,
           lo_cents::DOUBLE / 100 AS channel_low,
           ROUND((hi_cents + lo_cents)::DOUBLE / 200, 4) AS channel_mid,
           cents > hi_cents AS breakout_up,
           cents < lo_cents AS breakout_down
    FROM series WHERE rn > {DONCHIAN_DAYS} ORDER BY day
"""

ORACLES["q_rsi_sma"] = f"""
    WITH {_DAILY_CENTS_CTE},
    deltas AS (
      SELECT day, cents,
             cents - LAG(cents) OVER (ORDER BY day) AS delta,
             ROW_NUMBER() OVER (ORDER BY day) AS rn
      FROM daily QUALIFY rn > 1
    ),
    scored AS (
      SELECT day, cents,
             ROW_NUMBER() OVER (ORDER BY day) AS drn,
             SUM(GREATEST(delta, 0)) OVER w AS gain_cents,
             SUM(GREATEST(-delta, 0)) OVER w AS loss_cents
      FROM deltas
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN {RSI_DAYS - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           cents::DOUBLE / 100 AS day_revenue,
           CASE WHEN gain_cents + loss_cents = 0 THEN 50.0
                ELSE ROUND(100.0 * gain_cents::DOUBLE
                           / (gain_cents + loss_cents)::DOUBLE, 4)
           END AS rsi_14
    FROM scored WHERE drn >= {RSI_DAYS} ORDER BY day
"""

ORACLES["q_weighted_moving_avg"] = f"""
    WITH {_DAILY_CENTS_CTE},
    series AS (
      SELECT day, cents,
             ROW_NUMBER() OVER (ORDER BY day) AS rn,
             {" + ".join(
                 [f"cents * {WMA_DAYS}"]
                 + [
                     f"LAG(cents, {k}) OVER (ORDER BY day) * {WMA_DAYS - k}"
                     for k in range(1, WMA_DAYS)
                 ]
             )} AS wma_cents
      FROM daily
    )
    SELECT day,
           cents::DOUBLE / 100 AS day_revenue,
           ROUND(wma_cents::DOUBLE / {WMA_DAYS * (WMA_DAYS + 1) // 2} / 100,
                 4) AS wma_{WMA_DAYS}d
    FROM series WHERE rn >= {WMA_DAYS} ORDER BY day
"""


ROLLCORR_DAYS = 14  # trailing correlation window


def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 14-day Pearson correlation between daily purchase and
    click revenue — the co-movement monitor ("are conversions still
    tracking traffic?") whose breakdown flags attribution or tracking
    incidents before either single series alarms.

    Both series collapse to one (day, purchase_cents, click_cents)
    grid row per day; the correlation is computed from SIX exact
    BIGINT frame sums (n, Σx, Σy, Σx², Σy², Σxy) over a ROWS frame —
    no incremental covariance state, no float accumulation — and one
    closed-form double chain shared verbatim with the oracle. Rows
    without a full window are dropped; zero-variance frames emit
    NULL (correlation undefined).
    """
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            (
                F.sum(
                    F.when(F.col("event_type") == "purchase", dec2("value"))
                ) * 100
            )
            .cast("bigint")
            .alias("x"),
            (
                F.sum(
                    F.when(F.col("event_type") == "click", dec2("value"))
                ) * 100
            )
            .cast("bigint")
            .alias("y"),
        )
        .select(
            "day",
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
    )
    w_ord = Window.partitionBy().orderBy("day")
    w_frame = w_ord.rowsBetween(-(ROLLCORR_DAYS - 1), Window.currentRow)
    framed = daily.select(
        "day",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(w_frame).alias("n"),
        F.sum("x").over(w_frame).alias("sx"),
        F.sum("y").over(w_frame).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).over(w_frame).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).over(w_frame).alias("syy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).over(w_frame).alias("sxy"),
    ).filter(F.col("rn") >= ROLLCORR_DAYS)
    num = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    vx = (
        "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    vy = (
        "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    return framed.selectExpr(
        "day",
        f"CASE WHEN {vx} > 0 AND {vy} > 0 THEN"
        f" ROUND({num} / sqrt({vx} * {vy}), 6) END"
        f" AS rolling_corr_{ROLLCORR_DAYS}d",
    ).orderBy("day")


QUERIES["q_rolling_corr"] = q_rolling_corr

ORACLES["q_rolling_corr"] = f"""
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN value::DECIMAL(18,2) END) * 100 AS BIGINT), 0)
               AS x,
             COALESCE(CAST(SUM(CASE WHEN event_type = 'click'
                       THEN value::DECIMAL(18,2) END) * 100 AS BIGINT), 0)
               AS y
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY 1
    ),
    framed AS (
      SELECT day,
             ROW_NUMBER() OVER (ORDER BY day) AS rn,
             COUNT(*) OVER w AS n,
             SUM(x) OVER w AS sx,
             SUM(y) OVER w AS sy,
             SUM(x::HUGEINT * x) OVER w AS sxx,
             SUM(y::HUGEINT * y) OVER w AS syy,
             SUM(x::HUGEINT * y) OVER w AS sxy
      FROM daily
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN {ROLLCORR_DAYS - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT day,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                 AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                THEN ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                     - CAST(sy AS DOUBLE)
                                     * CAST(sy AS DOUBLE))), 6)
           END AS rolling_corr_{ROLLCORR_DAYS}d
    FROM framed WHERE rn >= {ROLLCORR_DAYS} ORDER BY day
"""
