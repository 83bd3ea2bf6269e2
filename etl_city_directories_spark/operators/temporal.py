"""Temporal operators: tumbling-window rollup, as-of join, range join.

As-of join is implemented Spark-first with the union + last-non-null
window trick: both sides are tagged, unioned, sorted once per key, and
the right side's latest values are carried forward with
``last(..., ignorenulls=True)``. This is a single shuffle on the key —
no range-BNL join, no per-row lookup — and it scales linearly in
events-per-key, which is exactly how a 100 TB as-of join must run.

Range join uses the equi-key (user) as the shuffle key with the time
range as a post-join filter; Spark plans a sort-merge join on the
equi-part, so cost is bounded by per-user event counts, not |L|×|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_city_directories_spark.functions.memo import rolling_persist
from etl_city_directories_spark.functions.numeric import dec2, money_sum
from etl_city_directories_spark.sources.tables import load_table

RANGE_HOURS = 24


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling rollup of the event stream (batch twin of the
    streaming variant in streaming/)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(dec2("value"), "total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("bucket_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the latest purchase by the same user at ts <= click ts.

    union + tag + last-ignorenulls over (user_id, ts, tag): purchases
    (tag 0) sort before clicks (tag 1) at equal ts, so an equal-ts
    purchase is visible to the click — standard as-of (>=) semantics.
    """
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        F.unix_micros("ts").alias("p_ts_us"),
        dec2("value").cast("double").alias("p_value"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        "event_id",
        F.lit(None).cast("long").alias("p_ts_us"),
        F.lit(None).cast("double").alias("p_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = purchases.unionByName(clicks).select(
        "user_id",
        "tag",
        "event_id",
        F.unix_micros("ts").alias("click_ts_us"),
        F.last("p_ts_us", ignorenulls=True).over(w).alias("purchase_ts_us"),
        F.last("p_value", ignorenulls=True).over(w).alias("purchase_value"),
    )
    return merged.filter(F.col("tag") == 1).select(
        "event_id", "user_id", "click_ts_us", "purchase_ts_us", "purchase_value"
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events-per-user within 24h after each signup (interval range join).

    Equi-join on user_id carries the shuffle; the time-interval
    predicate filters inside the sort-merge join. Left join keeps
    signups with zero follow-on activity.
    """
    events = load_table(spark, sf_dir, "events")
    signups = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.unix_micros("ts").alias("s_us"),
    )
    upper = F.col("s_us") + F.lit(RANGE_HOURS * 3600 * 1_000_000)
    others = events.select(
        "user_id", F.unix_micros("ts").alias("e_us"), dec2("value").alias("e_value")
    )
    joined = signups.join(
        others,
        (F.col("s_user") == F.col("user_id"))
        & (F.col("e_us") > F.col("s_us"))
        & (F.col("e_us") <= upper),
        "left",
    )
    return (
        joined.groupBy("signup_id", "s_user", "s_us")
        .agg(
            F.count("e_us").alias("n_following"),
            F.round(
                F.coalesce(F.sum("e_value").cast("double"), F.lit(0.0)), 2
            ).alias("value_following"),
        )
        .select(
            "signup_id",
            F.col("s_user").alias("user_id"),
            F.col("s_us").alias("signup_ts_us"),
            "n_following",
            "value_following",
        )
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: signup → first click strictly after
    signup → first purchase strictly after that click.

    Single shuffle on user_id: three chained conditional-min window
    expressions over the same unordered user partition (stage N's
    anchor timestamp feeds stage N+1's condition), then a per-user
    groupBy that reuses the window's partitioning and one global
    count. Catalyst plans ONE Exchange for all three windows + the
    per-user agg — versus the naive staged-join formulation, which
    re-scans events three times and cross-joins the counts (28
    exchanges, 4 BNL joins). Per-user state is three timestamps, so
    the design holds at any events-per-user skew.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id")
    staged = (
        events.withColumn(
            "signup_us",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts_us"))).over(w),
        )
        .withColumn(
            "click_us",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts_us") > F.col("signup_us")),
                    F.col("ts_us"),
                )
            ).over(w),
        )
        .withColumn(
            "purchase_us",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") > F.col("click_us")),
                    F.col("ts_us"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("signup_us").alias("signup_us"),
        F.first("click_us").alias("click_us"),
        F.first("purchase_us").alias("purchase_us"),
    )
    return per_user.agg(
        F.count("signup_us").alias("n_signup"),
        F.count("click_us").alias("n_click_after"),
        F.count("purchase_us").alias("n_purchase_after"),
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (the first-order Markov
    view of user behavior): consecutive event pairs via one lead()
    window per user, rolled up to (from, to) counts with the
    conditional transition probability.

    One shuffle on user_id for the lead, one tiny shuffle on the
    (from, to) pair; the per-from normalizer is a window over the
    O(types²) rollup — nothing rescans events. The probability is
    computed from unrounded counts and rounded 4dp at the edge.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    w_from = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_from).cast("double"),
            4,
        ).alias("p_transition"),
    ).orderBy("from_type", "to_type")


OVERLAP_INTERVAL_MIN = 30
_OVERLAP_US = OVERLAP_INTERVAL_MIN * 60 * 1_000_000


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency per event type via a sweep line: each
    event opens a 30-minute interval; +1/−1 boundary points, sorted,
    prefix-summed — max prefix = max concurrent intervals.

    The sweep line replaces the naive interval self-join (O(n²) in the
    overlap count) with a union + ONE window pass over 2n points —
    O(n log n) per key and a single shuffle on event_type. The window
    uses the default RANGE frame, so tied boundary points share a
    prefix value in both engines (closes sort before opens via the
    delta sort key: half-open [s, s+30m) semantics).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("t")
    )
    pts = ev.select("event_type", "t", F.lit(1).alias("delta")).unionByName(
        ev.select(
            "event_type",
            (F.col("t") + F.lit(_OVERLAP_US)).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("t", "delta")
    return (
        pts.withColumn("conc", F.sum("delta").over(w))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_intervals"),
            F.max("conc").cast("bigint").alias("max_concurrent"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "q_interval_overlap": q_interval_overlap,
    "q_event_transitions": q_event_transitions,
    "q_tumbling_window": q_tumbling_window,
    "q_asof_join": q_asof_join,
    "q_range_join": q_range_join,
    "q_funnel": q_funnel,
}

ORACLES = {
    "q_event_transitions": """
        WITH pairs AS (
          SELECT event_type AS from_type,
                 LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS to_type
          FROM events
        ),
        counted AS (
          SELECT from_type, to_type, COUNT(*) AS n_transitions
          FROM pairs WHERE to_type IS NOT NULL
          GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, n_transitions,
               ROUND(n_transitions::DOUBLE
                     / SUM(n_transitions) OVER (PARTITION BY from_type), 4)
                 AS p_transition
        FROM counted
        ORDER BY from_type, to_type
    """,
    "q_interval_overlap": f"""
        WITH pts AS (
          SELECT event_type, epoch_us(ts) AS t, 1 AS delta FROM events
          UNION ALL
          SELECT event_type, epoch_us(ts) + {_OVERLAP_US}, -1 FROM events
        ),
        r AS (
          SELECT event_type, delta,
                 SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta)
                   AS conc
          FROM pts
        )
        SELECT event_type,
               SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END)::BIGINT
                 AS n_intervals,
               MAX(conc)::BIGINT AS max_concurrent
        FROM r
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q_tumbling_window": """
        SELECT
          epoch_us(date_trunc('hour', ts)) AS bucket_start_us,
          event_type,
          COUNT(*) AS n_events,
          SUM(value::DECIMAL(18,2))::DOUBLE AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    "q_asof_join": """
        SELECT
          c.event_id,
          c.user_id,
          epoch_us(c.ts) AS click_ts_us,
          epoch_us(p.ts) AS purchase_ts_us,
          p.value::DECIMAL(18,2)::DOUBLE AS purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    "q_range_join": f"""
        SELECT
          s.event_id AS signup_id,
          s.user_id,
          epoch_us(s.ts) AS signup_ts_us,
          COUNT(e.ts) AS n_following,
          ROUND(COALESCE(SUM(e.value::DECIMAL(18,2))::DOUBLE, 0.0), 2) AS value_following
        FROM (SELECT * FROM events WHERE event_type = 'signup') s
        LEFT JOIN events e
          ON e.user_id = s.user_id
          AND e.ts > s.ts
          AND e.ts <= s.ts + INTERVAL {RANGE_HOURS} HOURS
        GROUP BY s.event_id, s.user_id, s.ts
    """,
    "q_funnel": """
        WITH s AS (
          SELECT user_id, MIN(epoch_us(ts)) AS signup_us
          FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        c AS (
          SELECT e.user_id, MIN(epoch_us(e.ts)) AS click_us
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'click' AND epoch_us(e.ts) > s.signup_us
          GROUP BY e.user_id
        ),
        p AS (
          SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_us
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.click_us
          GROUP BY e.user_id
        )
        SELECT
          (SELECT COUNT(*) FROM s) AS n_signup,
          (SELECT COUNT(*) FROM c) AS n_click_after,
          (SELECT COUNT(*) FROM p) AS n_purchase_after
    """,
}


ATTR_LOOKBACK_HOURS = 72
_ATTR_TOUCH_TYPES = ("view", "click", "signup")


def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase (conversion)
    splits one unit of credit equally across the user's touch events
    (view/click/signup) in the preceding ATTR_LOOKBACK_HOURS window —
    the marketing-analytics workload that motivates interval joins.

    Scale shape: one sort-merge join on the user equi-key with the
    time window as a post-join filter (identical cost model to
    q_range_join — per-user touch×conversion products, never |L|×|R|),
    then the per-conversion credit split via one count window on the
    conversion key and a partial-aggregated channel rollup. Credit
    fractions quantize to decimal(18,8) before the final sum so the
    per-channel totals are order-independent and the oracle replays
    them exactly; the published total rounds to 4dp."""
    events = load_table(spark, sf_dir, "events")
    conv = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"),
    )
    touch = events.filter(
        F.col("event_type").isin(*_ATTR_TOUCH_TYPES)
    ).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("touch_ts"),
    )
    joined = conv.join(
        touch,
        (F.col("c_user") == F.col("t_user"))
        & (F.col("touch_ts") <= F.col("conv_ts"))
        & (
            F.col("touch_ts")
            >= F.col("conv_ts") - F.expr(f"INTERVAL {ATTR_LOOKBACK_HOURS} HOURS")
        ),
    )
    w = Window.partitionBy("conv_id")
    credited = joined.withColumn(
        "credit",
        (F.lit(1.0) / F.count(F.lit(1)).over(w)).cast("decimal(18,8)"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.countDistinct("conv_id").alias("n_conversions_touched"),
            F.round(F.sum("credit").cast("double"), 4).alias("total_credit"),
        )
        .orderBy("channel")
    )


QUERIES["q_attribution_linear"] = q_attribution_linear

ORACLES["q_attribution_linear"] = f"""
    WITH conv AS (
      SELECT user_id AS c_user, event_id AS conv_id, ts AS conv_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id AS t_user, event_id AS touch_id,
             event_type AS channel, ts AS touch_ts
      FROM events
      WHERE event_type IN ({", ".join(f"'{t}'" for t in _ATTR_TOUCH_TYPES)})
    ),
    joined AS (
      SELECT conv_id, channel
      FROM conv JOIN touch
        ON c_user = t_user
       AND touch_ts <= conv_ts
       AND touch_ts >= conv_ts - INTERVAL {ATTR_LOOKBACK_HOURS} HOURS
    ),
    credited AS (
      SELECT conv_id, channel,
             CAST(1.0 / COUNT(*) OVER (PARTITION BY conv_id)
                  AS DECIMAL(18,8)) AS credit
      FROM joined
    )
    SELECT channel,
           COUNT(*)::BIGINT AS n_touches,
           COUNT(DISTINCT conv_id)::BIGINT AS n_conversions_touched,
           ROUND(SUM(credit)::DOUBLE, 4) AS total_credit
    FROM credited
    GROUP BY channel
    ORDER BY channel
"""


# ---------------------------------------------------------------------------
# r05: irregular-time-series ops — TWAP and OHLC bars
# ---------------------------------------------------------------------------


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per user over an IRREGULAR
    event sequence (the metric a naive AVG gets wrong when sampling is
    uneven): each reading holds until the next one, so its weight is
    the gap to the successor (lead over (ts, event_id) — the id breaks
    equal-timestamp ties identically in both engines; the last reading
    carries no duration).

    Scale shape: one window pass keyed by user (the natural shuffle
    key), weighted sums in exact decimal so shuffle order can't
    perturb a bit, one division at the end."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = events.select(
        "user_id",
        "value",
        (
            F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")
        ).alias("dt"),
    ).filter(F.col("dt").isNotNull())
    return (
        gapped.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum("dt").cast("bigint").alias("total_seconds"),
            F.sum(F.col("value").cast("decimal(18,6)") * F.col("dt")).alias("wsum"),
        )
        .filter(F.col("total_seconds") > 0)
        .select(
            "user_id",
            "n_intervals",
            "total_seconds",
            F.round(
                F.col("wsum").cast("double") / F.col("total_seconds").cast("double"), 4
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candles over purchase events: open/close picked by
    row_number over (ts, event_id) within the bar (deterministic under
    timestamp ties), high/low as plain min/max, volume as an exact
    decimal sum — one window pass + one groupBy on the bar key. The
    bar key is emitted as epoch micros (like the streaming twin) so
    the result is invariant to the parquet timestamp encoding."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    barred = events.select(
        F.date_trunc("hour", F.col("ts")).alias("bar"), "ts", "event_id", "value"
    )
    w_asc = Window.partitionBy("bar").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("bar").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    marked = barred.select(
        "bar",
        "value",
        F.row_number().over(w_asc).alias("rn_a"),
        F.row_number().over(w_desc).alias("rn_d"),
    )
    return (
        marked.groupBy("bar")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trades"),
            F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 4).alias("close"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("volume"),
        )
        .select(
            F.unix_micros(F.col("bar")).alias("bar_start_us"),
            "n_trades",
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
        .orderBy("bar_start_us")
    )


QUERIES["q_time_weighted_avg"] = q_time_weighted_avg
QUERIES["q_ohlc_bars"] = q_ohlc_bars

ORACLES["q_time_weighted_avg"] = """
    WITH gapped AS (
      SELECT user_id, value,
             date_diff('second', ts,
                       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               AS dt
      FROM events
    )
    SELECT user_id,
           COUNT(*)::BIGINT AS n_intervals,
           SUM(dt)::BIGINT AS total_seconds,
           ROUND((SUM(value::DECIMAL(18,6) * dt))::DOUBLE
                 / SUM(dt)::DOUBLE, 4) AS twap
    FROM gapped
    WHERE dt IS NOT NULL
    GROUP BY user_id
    HAVING SUM(dt) > 0
    ORDER BY user_id
"""

ORACLES["q_ohlc_bars"] = """
    WITH marked AS (
      SELECT date_trunc('hour', ts) AS bar, value,
             ROW_NUMBER() OVER (
               PARTITION BY date_trunc('hour', ts) ORDER BY ts, event_id
             ) AS rn_a,
             ROW_NUMBER() OVER (
               PARTITION BY date_trunc('hour', ts) ORDER BY ts DESC, event_id DESC
             ) AS rn_d
      FROM events WHERE event_type = 'purchase'
    )
    SELECT epoch_us(bar) AS bar_start_us,
           COUNT(*)::BIGINT AS n_trades,
           ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
           ROUND(MAX(value), 4) AS high,
           ROUND(MIN(value), 4) AS low,
           ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
           ROUND((SUM(value::DECIMAL(18,6)))::DOUBLE, 4) AS volume
    FROM marked
    GROUP BY bar
    ORDER BY bar_start_us
"""


def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal table) join: each click event picks up
    the SCD2 dimension version valid at its timestamp — Flink's
    temporal join / Delta time travel per row, the pattern every
    feature-store backfill needs (training-serving skew dies here).

    Spark-first like q_asof_join: instead of a BETWEEN range join
    against the version intervals, version-starts (src=0) and facts
    (src=1) union into ONE stream sorted per user by (t, src,
    event_id); ``last(attr, ignorenulls=True)`` carries the governing
    version forward. SCD2 intervals are contiguous per user, so
    latest-version-starting-at-or-before-t IS the valid interval —
    equal-timestamp version boundaries resolve identically to the
    BETWEEN oracle (a zero-length [t, t) version can never govern).
    One shuffle on the user key; cost O(versions + facts) per user,
    no interval explosion.
    """
    events = load_table(spark, sf_dir, "events")
    versions = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.unix_micros("ts").alias("t"),
            F.lit(0).alias("src"),
            "event_id",
            dec2("value").cast("double").alias("attr_value"),
        )
    )
    facts = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.lit(1).alias("src"),
        "event_id",
        F.lit(None).cast("double").alias("attr_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "src", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = versions.unionByName(facts).withColumn(
        "gov_value", F.last("attr_value", ignorenulls=True).over(w)
    )
    return (
        merged.filter(F.col("src") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("t").alias("click_ts_us"),
            F.round(F.col("gov_value"), 2).alias("attr_value"),
            F.col("gov_value").isNotNull().alias("has_version"),
        )
        .orderBy("event_id")
    )


QUERIES["q_pit_join"] = q_pit_join

ORACLES["q_pit_join"] = """
    WITH hist AS (
      SELECT user_id,
             ROUND(CAST(value AS DECIMAL(18,2))::DOUBLE, 2) AS attr_value,
             epoch_us(ts) AS valid_from_us,
             event_id,
             LEAD(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS valid_to_us
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT event_id, user_id, epoch_us(ts) AS click_ts_us
      FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, c.click_ts_us,
           h.attr_value,
           h.attr_value IS NOT NULL AS has_version
    FROM clicks c
    LEFT JOIN hist h
      ON h.user_id = c.user_id
     AND h.valid_from_us <= c.click_ts_us
     AND (h.valid_to_us IS NULL OR c.click_ts_us < h.valid_to_us)
    ORDER BY c.event_id
"""


# Each event opens a fixed activity lease; overlapping leases coalesce.
COALESCE_LEASE_US = 900_000_000  # 15 minutes


def q_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping per-user activity intervals into islands.

    The interval-union primitive (packing PostGIS ranges / Snowflake
    MATCH_RECOGNIZE-style island detection into windows): every event
    opens a [ts, ts+15 min) lease, and leases that overlap an earlier
    one in the same user's timeline fuse. Classic gaps-and-islands on
    intervals: a running MAX of interval end over preceding rows marks
    island heads (start > max end so far), a running SUM of head flags
    numbers islands, one groupBy collapses them. All integer epoch
    micros — parquet ts encoding can't perturb the hash.

    One shuffle on user_id; both windows and the final groupBy reuse
    that partitioning (Catalyst plans a single Exchange), so at 100 TB
    cost is one fact shuffle — the floor for any per-user timeline op.
    The reference computes validSince/validUntil intervals per entry
    (city-directories.js:416-417); this is the corpus-level rollup of
    exactly such validity leases.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + F.lit(COALESCE_LEASE_US)).alias("e_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("s_us", "event_id")
    prev_end = F.max("e_us").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.select(
        "user_id",
        "s_us",
        "e_us",
        "event_id",
        F.when(prev_end.isNull() | (F.col("s_us") > prev_end), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_head"),
    )
    numbered = marked.select(
        "user_id",
        "s_us",
        "e_us",
        F.sum("is_head")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    return (
        numbered.groupBy("user_id", "island")
        .agg(
            F.min("s_us").alias("island_start_us"),
            F.max("e_us").alias("island_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.col("island").cast("bigint").alias("island"),
            "island_start_us",
            "island_end_us",
            F.col("n_events").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id", "island")
    )


QUERIES["q_interval_coalesce"] = q_interval_coalesce

ORACLES["q_interval_coalesce"] = f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS s_us,
             epoch_us(ts) + {COALESCE_LEASE_US} AS e_us, event_id
      FROM events
    ),
    marked AS (
      SELECT user_id, s_us, e_us,
             CASE WHEN MAX(e_us) OVER (
                    PARTITION BY user_id ORDER BY s_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) IS NULL
                  OR s_us > MAX(e_us) OVER (
                    PARTITION BY user_id ORDER BY s_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  )
             THEN 1 ELSE 0 END AS is_head,
             event_id
      FROM ev
    ),
    numbered AS (
      SELECT user_id, s_us, e_us,
             SUM(is_head) OVER (
               PARTITION BY user_id ORDER BY s_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island
      FROM marked
    )
    SELECT user_id, island::BIGINT AS island,
           MIN(s_us)::BIGINT AS island_start_us,
           MAX(e_us)::BIGINT AS island_end_us,
           COUNT(*)::BIGINT AS n_events
    FROM numbered
    GROUP BY user_id, island
    ORDER BY user_id, island
"""


# Band half-width for the bucketed band join (microseconds).
BAND_US = 120_000_000  # +/- 2 minutes


def q_band_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join (|ts_a − ts_b| ≤ 2 min) via bucketed candidate join.

    The canonical scalable plan for a pure temporal-proximity theta
    join (cross-user co-occurrence: fraud rings, coordinated bursts).
    A naive theta join is O(|L|·|R|); bucketing time into band-width
    buckets makes it an EQUI join: each left row probes its own and
    both adjacent buckets (3× map-side fan-out), each right row sits
    in exactly one bucket — so every qualifying pair matches exactly
    once, no post-dedup — and the |Δts| ≤ band filter runs after the
    hash join. Shuffle key = (event_type, bucket): cost tracks pairs
    per band-width window, never |L|·|R|. DuckDB's oracle runs the
    naive BETWEEN join (its IEJoin), proving identical semantics.

    Output is the per-type pair rollup (count, closest/widest gap,
    mean |Δ| in seconds) — pair rows themselves would be the operator
    on a cluster; the audit summary is the query a user runs first.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
    )
    left = ev.select(
        "event_type",
        F.col("user_id").alias("user_a"),
        F.col("event_id").alias("id_a"),
        F.col("t_us").alias("t_a"),
        F.explode(
            F.array(
                (F.col("t_us") / BAND_US).cast("long") - 1,
                (F.col("t_us") / BAND_US).cast("long"),
                (F.col("t_us") / BAND_US).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    right = ev.select(
        "event_type",
        F.col("user_id").alias("user_b"),
        F.col("event_id").alias("id_b"),
        F.col("t_us").alias("t_b"),
        (F.col("t_us") / BAND_US).cast("long").alias("bucket"),
    )
    pairs = left.join(right, ["event_type", "bucket"]).filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.col("user_a") != F.col("user_b"))
        & (F.abs(F.col("t_a") - F.col("t_b")) <= BAND_US)
    )
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(F.abs(F.col("t_a") - F.col("t_b"))).alias("min_gap_us"),
            F.max(F.abs(F.col("t_a") - F.col("t_b"))).alias("max_gap_us"),
            F.round(
                F.sum(F.abs(F.col("t_a") - F.col("t_b"))).cast("double")
                / (F.count(F.lit(1)).cast("double") * 1_000_000),
                4,
            ).alias("mean_gap_s"),
        )
        .orderBy("event_type")
    )


QUERIES["q_band_join_bucketed"] = q_band_join_bucketed

ORACLES["q_band_join_bucketed"] = f"""
    WITH ev AS (
      SELECT event_type, user_id, event_id, epoch_us(ts) AS t_us FROM events
    ),
    pairs AS (
      SELECT a.event_type, abs(a.t_us - b.t_us) AS gap
      FROM ev a JOIN ev b
        ON b.event_type = a.event_type
       AND b.t_us BETWEEN a.t_us - {BAND_US} AND a.t_us + {BAND_US}
       AND a.event_id < b.event_id
       AND a.user_id <> b.user_id
    )
    SELECT event_type,
           COUNT(*)::BIGINT AS n_pairs,
           MIN(gap)::BIGINT AS min_gap_us,
           MAX(gap)::BIGINT AS max_gap_us,
           ROUND(SUM(gap)::DOUBLE / (COUNT(*)::DOUBLE * 1000000), 4)
             AS mean_gap_s
    FROM pairs GROUP BY 1 ORDER BY 1
"""


MARKOV_ROUNDS = 4
MARKOV_MICRO = 1_000_000  # probability mass in integer micro-units


def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain.

    Closes the Markov story q_event_transitions opens: fold the
    per-user transition counts into a row-stochastic matrix and run
    MARKOV_ROUNDS unrolled power-iteration steps from the uniform
    start — the same integer micro-unit replay discipline as
    graph_pagerank_dupes, so both engines truncate identically at
    every step (x'_j = Σ_i (x_i·c_ij) div r_i, all BIGINT). The
    matrix is O(types²) — after the single fact pass for transition
    counts, every iteration costs a broadcast-sized join, at any
    corpus size.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    row_tot = pairs.groupBy("from_type").agg(F.sum("c").alias("r"))
    # r10 optimization (guide §2.4 / §3.1): the O(types²) matrix is
    # re-read by every unrolled iteration — persist it once (rolling:
    # released on re-entry) so the fact pass (lead window + transition
    # count) runs a single time instead of per round, and broadcast it
    # in the loop join (it is broadcast-sized by construction).
    matrix = rolling_persist(
        spark, ("markov_matrix", sf_dir), pairs.join(row_tot, "from_type")
    )
    types = events.select(F.col("event_type").alias("t")).distinct()
    n_types = types.count()  # scalar: |event types| (single digits)
    x = types.select(
        "t", F.lit(MARKOV_MICRO // n_types).cast("long").alias("micro")
    )
    for _ in range(MARKOV_ROUNDS):
        x = (
            x.join(F.broadcast(matrix), x.t == matrix.from_type)
            .select(
                F.col("to_type").alias("t"),
                F.expr("micro * c div r").alias("m"),
            )
            .groupBy("t")
            .agg(F.sum("m").cast("long").alias("micro"))
        )
    return x.select(
        F.col("t").alias("event_type"),
        F.col("micro").alias("stationary_micro"),
        F.round(F.col("micro").cast("double") / MARKOV_MICRO, 6).alias(
            "stationary"
        ),
    ).orderBy("event_type")


QUERIES["q_markov_stationary"] = q_markov_stationary


def _markov_oracle() -> str:
    rounds = []
    for i in range(1, MARKOV_ROUNDS + 1):
        rounds.append(f"""
    x{i} AS (
      SELECT m.to_type AS t, SUM(x.micro * m.c // m.r)::BIGINT AS micro
      FROM x{i - 1} x JOIN matrix m ON m.from_type = x.t
      GROUP BY 1
    )""")
    return f"""
    WITH pairs AS (
      SELECT from_type, to_type, COUNT(*) AS c FROM (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
      ) WHERE to_type IS NOT NULL
      GROUP BY 1, 2
    ),
    matrix AS (
      SELECT p.from_type, p.to_type, p.c, r.r
      FROM pairs p JOIN (
        SELECT from_type, SUM(c) AS r FROM pairs GROUP BY 1
      ) r USING (from_type)
    ),
    x0 AS (
      SELECT event_type AS t,
             ({MARKOV_MICRO} // (SELECT COUNT(DISTINCT event_type)
                                 FROM events))::BIGINT AS micro
      FROM events GROUP BY 1
    ),{",".join(rounds)}
    SELECT t AS event_type, micro AS stationary_micro,
           ROUND(micro::DOUBLE / {MARKOV_MICRO}, 6) AS stationary
    FROM x{MARKOV_ROUNDS} ORDER BY event_type
    """


ORACLES["q_markov_stationary"] = _markov_oracle()


def q_vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily and month-to-date volume-weighted average unit price
    (VWAP) of shipped lineitems — the realized-price series a pricing
    team tracks against list price.

    Money and quantity both collapse to exact BIGINT sufficient
    statistics per ship day in ONE map-side partial aggregation
    (cents = decimal sum, units = quantities are integral doubles);
    the month-to-date VWAP is then two prefix sums over the O(days)
    grid — running cents over running units, the only double divides
    in the plan. The heavy table is touched once; both windows run on
    the daily grid, so the plan is insensitive to corpus size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(
        (F.sum(dec2("l_extendedprice")) * 100).cast("bigint").alias("cents"),
        F.sum("l_quantity").cast("bigint").alias("units"),
    )
    w_mtd = (
        Window.partitionBy(F.substring("day", 1, 7))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # 4-dp VWAPs rounded in EXACT integer arithmetic (half-up via
    # +d/2 before the integer divide): a double divide-then-round hit
    # a real one-ulp boundary at sf0.1 (2067.86455 rounding apart in
    # the two engines), so the divide that decides the 4th decimal
    # never happens in floating point.
    cum = daily.select(
        "day",
        "units",
        "cents",
        F.sum("cents").over(w_mtd).alias("mtd_cents"),
        F.sum("units").over(w_mtd).alias("mtd_units"),
    )
    return cum.selectExpr(
        "day",
        "units",
        "CAST((cents * 100 + units DIV 2) DIV units AS DOUBLE) / 1e4"
        " AS vwap_day",
        "CAST((mtd_cents * 100 + mtd_units DIV 2) DIV mtd_units AS DOUBLE)"
        " / 1e4 AS vwap_mtd",
    ).orderBy("day")


QUERIES["q_vwap_daily"] = q_vwap_daily

ORACLES["q_vwap_daily"] = """
    WITH daily AS (
      SELECT strftime(l_shipdate, '%Y-%m-%d') AS day,
             CAST(SUM(l_extendedprice::DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             CAST(SUM(l_quantity) AS BIGINT) AS units
      FROM lineitem GROUP BY 1
    )
    , cum AS (
      SELECT day, units, cents,
             SUM(cents) OVER w AS mtd_cents,
             SUM(units) OVER w AS mtd_units
      FROM daily
      WINDOW w AS (PARTITION BY substring(day, 1, 7) ORDER BY day
                   ROWS UNBOUNDED PRECEDING)
    )
    SELECT day, units,
           ((cents * 100 + units // 2) // units)::DOUBLE / 1e4 AS vwap_day,
           ((mtd_cents * 100 + mtd_units // 2) // mtd_units)::DOUBLE / 1e4
             AS vwap_mtd
    FROM cum
    ORDER BY day
"""
