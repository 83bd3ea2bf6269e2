"""Distribution-statistics and drift-audit operators.

The reference emits per-entry objects with no corpus-level statistics
(nypl-spacetime/etl-city-directories city-directories.js:338-451); a
warehouse user auditing 100 TB of such output needs the classical
distribution toolkit this module adds: Benford first-digit fraud
audit, Simpson diversity / market concentration (Gini), a chi-square
association test, IQR outlier fences, lag autocorrelation, Bollinger
bands, closed-form CUSUM drift detection, and a dyadic-weight EWMA.

Cross-engine determinism policy (functions/numeric.py): every
aggregate is reduced to integer/decimal sufficient statistics first
(order-independent sums), followed by deterministic IEEE double ops
(+, -, *, /, sqrt are all correctly rounded, hence bit-identical in
the JVM and DuckDB) and ONE final ROUND. No transcendental functions
on the data path — Benford's log10 expectations are 6-dp literals,
"entropy" is the Simpson/Herfindahl index (fully rational), EWMA
weights are powers of two (exact in binary) — so no last-ulp
libm divergence can ever flip a driver hash.

Scale shape: every operator collapses the fact table to a small grid
(days x types, digits, nations, contingency cells) in ONE map-side
partial aggregation before any window/join runs; the windows then
cost O(grid), not O(events), at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_city_directories_spark.functions.numeric import dec2
from etl_city_directories_spark.sources.tables import (
    load_table,
    load_table_parallel,
)

# Benford expected first-digit frequencies, log10(1 + 1/d) to 6 dp.
# Literals, not log10() calls: both engines parse the decimal string
# to the same double, whereas libm log10 may differ in the last ulp.
BENFORD_EXPECTED = {
    1: "0.30103",
    2: "0.176091",
    3: "0.124939",
    4: "0.09691",
    5: "0.079181",
    6: "0.066947",
    7: "0.057992",
    8: "0.051153",
    9: "0.045757",
}

AUTOCORR_LAG = 7  # days
BOLLINGER_WINDOW = 7  # trailing days
BOLLINGER_K = 2  # band half-width in population stddevs
CUSUM_THRESH_X = 3  # drift flag when CUSUM exceeds 3x the daily target
EWMA_WINDOW = 16  # trailing observed days; weight of day t-i is 2^(15-i)


def _daily_type_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, day) revenue in integer cents.

    The single pass over the fact stream: one map-side partial
    groupBy collapses 100 TB of events to O(types x days) rows; every
    window below runs on that grid. DECIMAL sum -> exact cents.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit of order totals.

    First digit of the exact cents representation (prices are >= 1
    dollar, so the leading cent digit IS the leading price digit).
    One groupBy to 9 rows; observed frequency is the single double
    divide (ROUND 6), expectations are 6-dp literals, and the
    absolute deviation subtracts two already-identical doubles.
    Map-side partial agg makes this one narrow shuffle of 9 keys
    regardless of corpus size.
    """
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .cast("string"),
        1,
        1,
    ).cast("int")
    counts = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = Window.partitionBy()
    expected = F.element_at(
        F.array(*[F.lit(float(BENFORD_EXPECTED[d])) for d in range(1, 10)]),
        F.col("digit"),
    )
    obs = F.round(
        F.col("n").cast("double") / F.sum("n").over(total).cast("double"), 6
    )
    return counts.select(
        "digit",
        "n",
        obs.alias("obs_freq"),
        expected.alias("exp_freq"),
        F.abs(obs - expected).alias("abs_dev"),
    )


def q_diversity_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity: Simpson index over event types.

    1 - sum(p_i^2) = 1 - sum(c_i^2)/N^2 — the fully-rational
    diversity measure (Shannon entropy needs ln(), which is not
    cross-engine bit-stable; Simpson carries the same signal with
    integer-only sufficient statistics). Two chained partial aggs on
    the user key: (user, type) counts, then per-user sum of squares.
    One shuffle on user_id; no window, no join.
    """
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_user = per_type.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    simpson = F.round(
        F.lit(1.0)
        - F.col("ss").cast("double")
        / (F.col("n_events") * F.col("n_events")).cast("double"),
        6,
    )
    return per_user.select(
        "user_id", "n_events", "n_types", simpson.alias("simpson_diversity")
    )


def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer order spend within each nation.

    Rank-sum form over ascending spend: G = (2*sum(r*x) - (n+1)*S) /
    (n*S), exact in integer cents with DECIMAL(38,0) products (rank x
    cents escapes BIGINT at cluster scale; DuckDB's HUGEINT matches).
    Spend collapses per customer first (one shuffle on custkey), the
    rank window then sorts O(customers) rows per nation — never the
    order fact. Ties break on custkey so the rank assignment (and
    hence the rank-sum, which is tie-order-invariant only in
    aggregate) is identical in both engines.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    spend = (
        orders.groupBy("o_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey", "cents")
    )
    w = Window.partitionBy("n_name").orderBy("cents", "c_custkey")
    ranked = spend.select(
        "n_name",
        "cents",
        F.row_number().over(w).cast("decimal(38,0)").alias("r"),
    )
    agg = ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("r") * F.col("cents").cast("decimal(38,0)")).alias("rs"),
    )
    num = (
        F.lit(2).cast("decimal(38,0)") * F.col("rs")
        - (F.col("n_customers") + 1).cast("decimal(38,0)") * F.col("s")
    )
    den = F.col("n_customers").cast("decimal(38,0)") * F.col("s")
    return agg.select(
        "n_name",
        "n_customers",
        (F.col("s").cast("double") / 100).alias("total_spend"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("gini"),
    ).filter(F.col("n_customers") > 0)


def q_chi_square_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square association audit: order priority x order status.

    The contingency table is one map-side partial agg (15 cells);
    margins come from windows over those cells, never a second fact
    pass. Expected counts and per-cell contributions are IEEE basic
    ops on bigint-cast doubles (deterministic cross-engine); each
    contribution is micro-rounded to BIGINT before the chi2 total so
    the SUM is order-independent. Every cell row carries the shared
    chi2 for a fully hash-checkable result.
    """
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    w_row = Window.partitionBy("o_orderpriority")
    w_col = Window.partitionBy("o_orderstatus")
    w_all = Window.partitionBy()
    expected = (
        F.sum("n_obs").over(w_row).cast("double")
        * F.sum("n_obs").over(w_col).cast("double")
        / F.sum("n_obs").over(w_all).cast("double")
    )
    contrib = (F.col("n_obs").cast("double") - expected) * (
        F.col("n_obs").cast("double") - expected
    ) / expected
    with_micro = cells.select(
        "o_orderpriority",
        "o_orderstatus",
        "n_obs",
        F.round(expected, 4).alias("expected"),
        F.round(contrib, 4).alias("contrib"),
        F.floor(contrib * 1e6 + F.lit(0.5)).cast("bigint").alias("micro"),
    )
    chi2 = F.round(
        F.sum("micro").over(Window.partitionBy()).cast("double") / 1e6, 4
    )
    return with_micro.select(
        "o_orderpriority",
        "o_orderstatus",
        "n_obs",
        "expected",
        "contrib",
        chi2.alias("chi2_total"),
    )


def q_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR outlier fences on customer balance, per nation.

    Discrete quartiles by explicit rank selection (value at
    ceil(p*n)) — NOT the engines' percentile built-ins, whose
    interpolation rules differ. Fences compare in doubled-cent
    integer space (2x < 2*q1 - 3*iqr), so the 1.5x multiplier never
    leaves exact arithmetic. One rank window over O(customers) rows
    per nation + a broadcast join of the 25-row quartile table back
    onto the spine — the fact table is read once.
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
    ).select("n_name", "c_custkey", "cents")
    w = Window.partitionBy("n_name").orderBy("cents", "c_custkey")
    ranked = base.select(
        "n_name", "cents", F.row_number().over(w).alias("rnk")
    )
    n_per = ranked.groupBy("n_name").agg(F.count(F.lit(1)).alias("n_customers"))
    with_n = ranked.join(F.broadcast(n_per), "n_name")
    q1r = F.floor((F.col("n_customers") + 3) / 4)  # ceil(n/4)
    q3r = F.floor((3 * F.col("n_customers") + 3) / 4)  # ceil(3n/4)
    quart = with_n.groupBy("n_name", "n_customers").agg(
        F.max(F.when(F.col("rnk") == q1r, F.col("cents"))).alias("q1c"),
        F.max(F.when(F.col("rnk") == q3r, F.col("cents"))).alias("q3c"),
    )
    flagged = base.join(F.broadcast(quart), "n_name").select(
        "n_name",
        "n_customers",
        "q1c",
        "q3c",
        (
            (2 * F.col("cents") < 2 * F.col("q1c") - 3 * (F.col("q3c") - F.col("q1c")))
            | (2 * F.col("cents") > 2 * F.col("q3c") + 3 * (F.col("q3c") - F.col("q1c")))
        ).cast("int").alias("is_out"),
    )
    return flagged.groupBy("n_name", "n_customers", "q1c", "q3c").agg(
        F.sum("is_out").cast("bigint").alias("n_outliers")
    ).select(
        "n_name",
        "n_customers",
        (F.col("q1c").cast("double") / 100).alias("q1"),
        (F.col("q3c").cast("double") / 100).alias("q3"),
        ((F.col("q3c") - F.col("q1c")).cast("double") / 100).alias("iqr"),
        "n_outliers",
    )


def q_autocorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-7 autocorrelation of daily order revenue.

    The fact stream collapses to ONE global daily series (O(days)
    rows) before the lag pairing; Pearson r over (x_t, x_{t-7})
    reduces to six DECIMAL(38,0) sufficient sums — exact and
    order-independent — then one closed-form double expression
    (sqrt is correctly rounded IEEE, so cross-engine stable),
    ROUND 6. The single-partition lag window is safe by
    construction: it sorts days, not events.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy().orderBy("d")
    pairs = daily.select(
        F.col("cents").alias("a"),
        F.lag("cents", AUTOCORR_LAG).over(w).alias("b"),
    ).filter(F.col("b").isNotNull())
    d38 = "decimal(38,0)"
    agg = pairs.groupBy().agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("a").cast(d38).alias("sa"),
        F.sum("b").cast(d38).alias("sb"),
        F.sum(F.col("a").cast(d38) * F.col("a").cast(d38)).alias("saa"),
        F.sum(F.col("b").cast(d38) * F.col("b").cast(d38)).alias("sbb"),
        F.sum(F.col("a").cast(d38) * F.col("b").cast(d38)).alias("sab"),
    )
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    var_a = (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    var_b = (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    return agg.select(
        F.lit(AUTOCORR_LAG).alias("lag_days"),
        F.col("n").cast("bigint").alias("n_pairs"),
        F.round(num / F.sqrt(var_a * var_b), 6).alias("autocorr"),
    )


def q_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day Bollinger bands on daily revenue per type.

    Mean and POPULATION stddev from integer window sums (n, S, SS in
    DECIMAL(38,0) — SS escapes BIGINT at cluster scale): sd =
    sqrt(n*SS - S^2)/n. All window math runs on the collapsed
    O(types x days) grid; the three outputs share one deterministic
    double pipeline and round at the edge (ROUND 4).
    """
    daily = _daily_type_cents(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-(BOLLINGER_WINDOW - 1), 0)
    )
    d38 = "decimal(38,0)"
    n = F.count(F.lit(1)).over(w).cast(d38)
    s = F.sum(F.col("cents").cast(d38)).over(w)
    ss = F.sum(F.col("cents").cast(d38) * F.col("cents").cast(d38)).over(w)
    mean = s.cast("double") / (n.cast("double") * 100)
    sd = F.sqrt((n * ss - s * s).cast("double")) / (n.cast("double") * 100)
    return daily.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        n.cast("bigint").alias("n_days"),
        F.round(mean, 4).alias("ma"),
        F.round(mean + BOLLINGER_K * sd, 4).alias("bb_upper"),
        F.round(mean - BOLLINGER_K * sd, 4).alias("bb_lower"),
    )


def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection on daily revenue per type.

    The textbook recursion S+_t = max(0, S+_{t-1} + dev_t) has the
    closed form S+_t = R_t - min(0, min_{k<=t} R_k) over the running
    deviation sum R — two windows, no recursion, no UDF. Target is
    the per-type mean daily cents by exact integer floor-division.
    Everything stays BIGINT: the drift flag is an integer compare
    against CUSUM_THRESH_X * target. Windows run on the collapsed
    grid only.
    """
    daily = _daily_type_cents(spark, sf_dir)
    per_type = Window.partitionBy("event_type")
    target = F.floor(
        F.sum("cents").over(per_type) / F.count(F.lit(1)).over(per_type)
    ).cast("bigint")
    dev = daily.select(
        "event_type", "d", "cents", (F.col("cents") - target).alias("dev"),
        target.alias("target"),
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = F.sum("dev").over(w_run)
    run = dev.select(
        "event_type", "d", "cents", "target", r.alias("r")
    )
    w_min = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cus_high = F.col("r") - F.least(F.lit(0).cast("bigint"), F.min("r").over(w_min))
    cus_low = F.greatest(F.lit(0).cast("bigint"), F.max("r").over(w_min)) - F.col("r")
    return run.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        (F.col("cents").cast("double") / 100).alias("rev"),
        (cus_high.cast("double") / 100).alias("cusum_high"),
        (cus_low.cast("double") / 100).alias("cusum_low"),
        (cus_high > CUSUM_THRESH_X * F.col("target")).alias("drift_flag"),
    )


def q_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA of daily revenue per type with dyadic (2^-k) weights.

    alpha = 1/2 makes every weight a power of two — exact in binary —
    so the trailing-16-observation EWMA is a pure integer weighted
    sum: num = sum(cents_i << (15 - lag_i)), den = sum(2^(15-lag_i)),
    one double divide at the end (ROUND 4). Implemented as a banded
    self-join on per-type row numbers over the collapsed grid (grid
    is O(types x days); the join fan-out is a constant 16), which
    both engines express identically — no per-offset lag() tower.
    """
    daily = _daily_type_cents(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("d")
    g = daily.select(
        "event_type", "d", "cents", F.row_number().over(w).alias("rn")
    )
    cur = g.select(
        "event_type",
        F.col("d").alias("day_d"),
        F.col("rn").alias("rn_cur"),
    )
    hist = g.select(
        "event_type", F.col("cents").alias("h_cents"), F.col("rn").alias("rn_h")
    )
    lag = F.col("rn_cur") - F.col("rn_h")
    joined = cur.join(hist, "event_type").filter(
        (lag >= 0) & (lag < EWMA_WINDOW)
    )
    weight = F.expr(
        f"shiftleft(1L, {EWMA_WINDOW - 1} - int(rn_cur - rn_h))"
    ).cast("bigint")
    agg = joined.groupBy("event_type", "day_d").agg(
        F.sum(F.col("h_cents").cast("decimal(38,0)") * weight.cast("decimal(38,0)"))
        .alias("num"),
        F.sum(weight).alias("den"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    return agg.select(
        "event_type",
        F.date_format("day_d", "yyyy-MM-dd").alias("day"),
        F.col("n_obs").cast("bigint").alias("n_obs"),
        F.round(
            F.col("num").cast("double") / (F.col("den").cast("double") * 100), 4
        ).alias("ewma"),
    )


QUERIES = {
    "q_benford_digits": q_benford_digits,
    "q_diversity_simpson": q_diversity_simpson,
    "q_gini_concentration": q_gini_concentration,
    "q_chi_square_assoc": q_chi_square_assoc,
    "q_outlier_iqr": q_outlier_iqr,
    "q_autocorr_lag": q_autocorr_lag,
    "q_bollinger_bands": q_bollinger_bands,
    "q_cusum_drift": q_cusum_drift,
    "q_ewma_dyadic": q_ewma_dyadic,
}

_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {v}" for d, v in BENFORD_EXPECTED.items()
) + " END"

ORACLES = {
    "q_benford_digits": f"""
        WITH c AS (
          SELECT CAST(SUBSTR(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                         * 100 AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
                 COUNT(*)::BIGINT AS n
          FROM orders GROUP BY 1
        )
        SELECT digit, n,
               ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE), 6)
                 AS obs_freq,
               {_BENFORD_CASE} AS exp_freq,
               ABS(ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE), 6)
                   - {_BENFORD_CASE}) AS abs_dev
        FROM c
    """,
    "q_diversity_simpson": """
        WITH per_type AS (
          SELECT user_id, event_type, COUNT(*)::BIGINT AS c
          FROM events GROUP BY 1, 2
        ),
        per_user AS (
          SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
                 COUNT(*)::BIGINT AS n_types,
                 CAST(SUM(c * c) AS BIGINT) AS ss
          FROM per_type GROUP BY 1
        )
        SELECT user_id, n_events, n_types,
               ROUND(1.0 - CAST(ss AS DOUBLE)
                     / CAST(n_events * n_events AS DOUBLE), 6)
                 AS simpson_diversity
        FROM per_user
    """,
    "q_gini_concentration": """
        WITH spend AS (
          SELECT n.n_name, c.c_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY 1, 2
        ),
        ranked AS (
          SELECT n_name, cents,
                 CAST(ROW_NUMBER() OVER (PARTITION BY n_name
                                         ORDER BY cents, c_custkey)
                      AS HUGEINT) AS r
          FROM spend
        ),
        agg AS (
          SELECT n_name, COUNT(*)::BIGINT AS n_customers,
                 CAST(SUM(cents) AS HUGEINT) AS s,
                 SUM(r * CAST(cents AS HUGEINT)) AS rs
          FROM ranked GROUP BY 1
        )
        SELECT n_name, n_customers,
               CAST(s AS DOUBLE) / 100 AS total_spend,
               ROUND(CAST(2 * rs - (n_customers + 1) * s AS DOUBLE)
                     / CAST(CAST(n_customers AS HUGEINT) * s AS DOUBLE), 6)
                 AS gini
        FROM agg WHERE n_customers > 0
    """,
    "q_chi_square_assoc": """
        WITH cells AS (
          SELECT o_orderpriority, o_orderstatus, COUNT(*)::BIGINT AS n_obs
          FROM orders GROUP BY 1, 2
        ),
        m AS (
          SELECT o_orderpriority, o_orderstatus, n_obs,
                 CAST(SUM(n_obs) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
                   * CAST(SUM(n_obs) OVER (PARTITION BY o_orderstatus) AS DOUBLE)
                   / CAST(SUM(n_obs) OVER () AS DOUBLE) AS e
          FROM cells
        ),
        t AS (
          SELECT o_orderpriority, o_orderstatus, n_obs,
                 ROUND(e, 4) AS expected,
                 ROUND((CAST(n_obs AS DOUBLE) - e) * (CAST(n_obs AS DOUBLE) - e)
                       / e, 4) AS contrib,
                 CAST(FLOOR((CAST(n_obs AS DOUBLE) - e)
                            * (CAST(n_obs AS DOUBLE) - e) / e * 1e6 + 0.5)
                      AS BIGINT) AS micro
          FROM m
        )
        SELECT o_orderpriority, o_orderstatus, n_obs, expected, contrib,
               ROUND(CAST(SUM(micro) OVER () AS DOUBLE) / 1e6, 4) AS chi2_total
        FROM t
    """,
    "q_outlier_iqr": """
        WITH base AS (
          SELECT n.n_name, c.c_custkey,
                 CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        ),
        ranked AS (
          SELECT n_name, cents,
                 ROW_NUMBER() OVER (PARTITION BY n_name
                                    ORDER BY cents, c_custkey) AS rnk,
                 COUNT(*) OVER (PARTITION BY n_name) AS n_customers
          FROM base
        ),
        quart AS (
          SELECT n_name, CAST(n_customers AS BIGINT) AS n_customers,
                 MAX(CASE WHEN rnk = (n_customers + 3) // 4 THEN cents END)
                   AS q1c,
                 MAX(CASE WHEN rnk = (3 * n_customers + 3) // 4 THEN cents END)
                   AS q3c
          FROM ranked GROUP BY 1, 2
        )
        SELECT b.n_name, q.n_customers,
               CAST(q1c AS DOUBLE) / 100 AS q1,
               CAST(q3c AS DOUBLE) / 100 AS q3,
               CAST(q3c - q1c AS DOUBLE) / 100 AS iqr,
               CAST(SUM(CASE WHEN 2 * b.cents < 2 * q1c - 3 * (q3c - q1c)
                               OR 2 * b.cents > 2 * q3c + 3 * (q3c - q1c)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM base b JOIN quart q ON b.n_name = q.n_name
        GROUP BY 1, 2, 3, 4, 5
    """,
    "q_autocorr_lag": f"""
        WITH daily AS (
          SELECT o_orderdate AS d,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
          FROM orders GROUP BY 1
        ),
        pairs AS (
          SELECT cents AS a,
                 LAG(cents, {AUTOCORR_LAG}) OVER (ORDER BY d) AS b
          FROM daily
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                 CAST(SUM(a) AS HUGEINT) AS sa,
                 CAST(SUM(b) AS HUGEINT) AS sb,
                 SUM(CAST(a AS HUGEINT) * CAST(a AS HUGEINT)) AS saa,
                 SUM(CAST(b AS HUGEINT) * CAST(b AS HUGEINT)) AS sbb,
                 SUM(CAST(a AS HUGEINT) * CAST(b AS HUGEINT)) AS sab
          FROM pairs WHERE b IS NOT NULL
        )
        SELECT {AUTOCORR_LAG} AS lag_days,
               CAST(n AS BIGINT) AS n_pairs,
               ROUND(CAST(n * sab - sa * sb AS DOUBLE)
                     / SQRT(CAST(n * saa - sa * sa AS DOUBLE)
                            * CAST(n * sbb - sb * sb AS DOUBLE)), 6)
                 AS autocorr
        FROM agg
    """,
    "q_bollinger_bands": f"""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
          FROM events GROUP BY 1, 2
        ),
        s AS (
          SELECT event_type, d,
                 CAST(COUNT(*) OVER w AS HUGEINT) AS n,
                 CAST(SUM(cents) OVER w AS HUGEINT) AS s,
                 SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) OVER w
                   AS ss
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN {BOLLINGER_WINDOW - 1} PRECEDING
                       AND CURRENT ROW)
        )
        SELECT event_type, STRFTIME(d, '%Y-%m-%d') AS day,
               CAST(n AS BIGINT) AS n_days,
               ROUND(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 100), 4) AS ma,
               ROUND(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 100)
                     + {BOLLINGER_K} * SQRT(CAST(n * ss - s * s AS DOUBLE))
                       / (CAST(n AS DOUBLE) * 100), 4) AS bb_upper,
               ROUND(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 100)
                     - {BOLLINGER_K} * SQRT(CAST(n * ss - s * s AS DOUBLE))
                       / (CAST(n AS DOUBLE) * 100), 4) AS bb_lower
        FROM s
    """,
    "q_cusum_drift": f"""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
          FROM events GROUP BY 1, 2
        ),
        dev AS (
          SELECT event_type, d, cents,
                 CAST(FLOOR(CAST(SUM(cents) OVER (PARTITION BY event_type)
                                 AS DOUBLE)
                            / CAST(COUNT(*) OVER (PARTITION BY event_type)
                                   AS DOUBLE)) AS BIGINT) AS target
          FROM daily
        ),
        run AS (
          SELECT event_type, d, cents, target,
                 SUM(cents - target) OVER (PARTITION BY event_type ORDER BY d
                                           ROWS UNBOUNDED PRECEDING) AS r
          FROM dev
        ),
        m AS (
          SELECT event_type, d, cents, target, r,
                 r - LEAST(0, MIN(r) OVER (PARTITION BY event_type ORDER BY d
                                           ROWS UNBOUNDED PRECEDING))
                   AS cus_high,
                 GREATEST(0, MAX(r) OVER (PARTITION BY event_type ORDER BY d
                                          ROWS UNBOUNDED PRECEDING)) - r
                   AS cus_low
          FROM run
        )
        SELECT event_type, STRFTIME(d, '%Y-%m-%d') AS day,
               CAST(cents AS DOUBLE) / 100 AS rev,
               CAST(cus_high AS DOUBLE) / 100 AS cusum_high,
               CAST(cus_low AS DOUBLE) / 100 AS cusum_low,
               cus_high > {CUSUM_THRESH_X} * target AS drift_flag
        FROM m
    """,
    "q_ewma_dyadic": f"""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
          FROM events GROUP BY 1, 2
        ),
        g AS (
          SELECT event_type, d, cents,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
          FROM daily
        )
        SELECT c.event_type, STRFTIME(c.d, '%Y-%m-%d') AS day,
               COUNT(*)::BIGINT AS n_obs,
               ROUND(CAST(SUM(CAST(h.cents AS HUGEINT)
                              * CAST(1 << ({EWMA_WINDOW - 1}
                                           - (c.rn - h.rn)) AS HUGEINT))
                          AS DOUBLE)
                     / (CAST(SUM(1 << ({EWMA_WINDOW - 1} - (c.rn - h.rn)))
                             AS DOUBLE) * 100), 4) AS ewma
        FROM g c JOIN g h
          ON c.event_type = h.event_type
         AND c.rn - h.rn >= 0 AND c.rn - h.rn < {EWMA_WINDOW}
        GROUP BY 1, 2
    """,
}


AB_CONV_EVENT = "purchase"  # conversion event for the A/B proportion test
AB_Z_CRIT = "1.959964"  # two-sided 95% critical value as an exact literal


def q_ab_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on conversion, variant = user_id parity.

    The experimentation readout every event warehouse serves: split
    users into A/B by a deterministic parity assignment, compare
    "conversion" rates with the pooled two-proportion z statistic.
    Conversion = the user's purchase count exceeds the global integer
    mean purchases-per-user — an interior proportion by construction,
    so the pooled standard error cannot collapse to zero the way a
    has-any-purchase definition does on a dense stream (every user
    qualifies and se = 0). Sufficient statistics are four integers
    (users and converters per arm) from one per-user collapse —
    map-side combinable, O(1) output — and the z formula is a single
    closed-form double expression (+ - * / sqrt are all correctly
    rounded, hence cross-engine bit-stable), ROUND 4, guarded
    against the still-degenerate se = 0 edge. The critical value is
    a 6-dp literal, so the significance flag is a deterministic
    double compare.
    """
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == AB_CONV_EVENT, 1).otherwise(0)
        ).alias("n_purch")
    )
    # exact integer threshold: floor(total / users) via div, not /
    flagged = per_user.withColumn(
        "thresh",
        F.expr(
            "CAST(SUM(n_purch) OVER () AS BIGINT) div "
            "CAST(COUNT(1) OVER () AS BIGINT)"
        ),
    ).select(
        F.pmod(F.col("user_id"), F.lit(2)).cast("int").alias("variant"),
        F.when(F.col("n_purch") > F.col("thresh"), 1).otherwise(0).alias(
            "conv"
        ),
    )
    arms = flagged.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k")
    )
    a = arms.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("k").alias("k_a")
    )
    b = arms.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("k").alias("k_b")
    )
    j = a.crossJoin(b)  # two 1-row frames
    p_a = F.col("k_a").cast("double") / F.col("n_a").cast("double")
    p_b = F.col("k_b").cast("double") / F.col("n_b").cast("double")
    pool = (F.col("k_a") + F.col("k_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pool
        * (1 - pool)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    z = F.when(se > 0, (p_a - p_b) / se).otherwise(F.lit(0.0))
    return j.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("k_a").cast("bigint").alias("k_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("k_b").cast("bigint").alias("k_b"),
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > F.lit(float(AB_Z_CRIT))).alias("significant"),
    )


QUERIES["q_ab_proportion_ztest"] = q_ab_proportion_ztest

ORACLES["q_ab_proportion_ztest"] = f"""
    WITH per_user AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = '{AB_CONV_EVENT}' THEN 1 ELSE 0 END)
               AS n_purch
      FROM events GROUP BY 1
    ),
    flagged AS (
      SELECT CAST(user_id % 2 AS INT) AS variant,
             CASE WHEN n_purch >
                    CAST(SUM(n_purch) OVER () AS BIGINT)
                    // CAST(COUNT(1) OVER () AS BIGINT)
                  THEN 1 ELSE 0 END AS conv
      FROM per_user
    ),
    arms AS (
      SELECT variant, COUNT(*) AS n, SUM(conv) AS k
      FROM flagged GROUP BY 1
    ),
    j AS (
      SELECT a.n AS n_a, a.k AS k_a, b.n AS n_b, b.k AS k_b
      FROM (SELECT n, k FROM arms WHERE variant = 0) a
      CROSS JOIN (SELECT n, k FROM arms WHERE variant = 1) b
    ),
    d AS (
      SELECT n_a, k_a, n_b, k_b,
             k_a::DOUBLE / n_a::DOUBLE AS p_a,
             k_b::DOUBLE / n_b::DOUBLE AS p_b,
             SQRT(((k_a + k_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                  * (1 - (k_a + k_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                  * (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE)) AS se
      FROM j
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(k_a AS BIGINT) AS k_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(k_b AS BIGINT) AS k_b,
           ROUND(p_a, 6) AS p_a, ROUND(p_b, 6) AS p_b,
           ROUND(CASE WHEN se > 0 THEN (p_a - p_b) / se ELSE 0.0 END, 4)
             AS z_stat,
           ABS(CASE WHEN se > 0 THEN (p_a - p_b) / se ELSE 0.0 END)
             > {AB_Z_CRIT} AS significant
    FROM d
"""


# --- Welch's unequal-variance t-test -------------------------------
# Two customer segments compared on order value. Both engines evaluate
# the IDENTICAL SQL fragments below (Spark via selectExpr, DuckDB
# verbatim), so the double math cannot diverge even in association
# order: exact decimal sufficient statistics in, one shared closed
# form out, single ROUND at the boundary.
WELCH_SEG_A = "BUILDING"
WELCH_SEG_B = "MACHINERY"

_W_VA = (
    "((CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)"
    " / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1))"
)
_W_VB = (
    "((CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)"
    " / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1))"
)
_W_SE2 = f"({_W_VA} / CAST(n_a AS DOUBLE) + {_W_VB} / CAST(n_b AS DOUBLE))"
_W_T = (
    "((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
    " - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
    f" / sqrt({_W_SE2}))"
)
_W_DF = (
    f"(({_W_SE2} * {_W_SE2}) / "
    f"(({_W_VA} / CAST(n_a AS DOUBLE)) * ({_W_VA} / CAST(n_a AS DOUBLE))"
    " / (CAST(n_a AS DOUBLE) - 1)"
    f" + ({_W_VB} / CAST(n_b AS DOUBLE)) * ({_W_VB} / CAST(n_b AS DOUBLE))"
    " / (CAST(n_b AS DOUBLE) - 1)))"
)
_WELCH_SELECT = [
    "CAST(n_a AS BIGINT) AS n_a",
    "CAST(n_b AS BIGINT) AS n_b",
    "ROUND(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100, 4) AS mean_a",
    "ROUND(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100, 4) AS mean_b",
    f"ROUND(sqrt({_W_VA}) / 100, 4) AS sd_a",
    f"ROUND(sqrt({_W_VB}) / 100, 4) AS sd_b",
    f"ROUND({_W_T}, 6) AS t_stat",
    f"ROUND({_W_DF}, 2) AS welch_df",
    f"(abs({_W_T}) > 1.96) AS significant_5pct",
]


def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two customer segments.

    The A/B companion to q_ab_proportion_ztest for CONTINUOUS metrics
    (order value), the test a warehouse experimentation platform runs
    thousands of times a day. Each segment's 100 TB of orders reduces
    map-side to three exact numbers — n, sum(cents), sum(cents^2) in
    DECIMAL(38,0), order-independent — then the Welch t statistic and
    Satterthwaite degrees of freedom come from ONE closed-form double
    expression shared verbatim with the oracle (selectExpr on the same
    SQL strings), so no engine can associate the arithmetic
    differently. One shuffle (the custkey join), one 2-row aggregate,
    one output row.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = orders.join(
        cust,
        orders.o_custkey == cust.c_custkey,
    ).filter(F.col("c_mktsegment").isin(WELCH_SEG_A, WELCH_SEG_B))
    cents = (dec2("o_totalprice") * 100).cast("long").cast("decimal(18,0)")
    is_a = F.col("c_mktsegment") == WELCH_SEG_A
    suff = joined.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(is_a, cents).otherwise(F.lit(0).cast("decimal(18,0)")))
        .cast("decimal(38,0)")
        .alias("s_a"),
        F.sum(F.when(is_a, cents * cents).otherwise(F.lit(0).cast("decimal(37,0)")))
        .cast("decimal(38,0)")
        .alias("ss_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(~is_a, cents).otherwise(F.lit(0).cast("decimal(18,0)")))
        .cast("decimal(38,0)")
        .alias("s_b"),
        F.sum(F.when(~is_a, cents * cents).otherwise(F.lit(0).cast("decimal(37,0)")))
        .cast("decimal(38,0)")
        .alias("ss_b"),
    )
    return suff.selectExpr(*_WELCH_SELECT)


QUERIES["q_welch_ttest"] = q_welch_ttest

ORACLES["q_welch_ttest"] = f"""
    WITH suff AS (
      SELECT
        SUM(CASE WHEN c.c_mktsegment = '{WELCH_SEG_A}' THEN 1 ELSE 0 END)
          AS n_a,
        SUM(CASE WHEN c.c_mktsegment = '{WELCH_SEG_A}'
            THEN CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            ELSE 0 END)::HUGEINT AS s_a,
        SUM(CASE WHEN c.c_mktsegment = '{WELCH_SEG_A}'
            THEN CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
                 * CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
            ELSE 0 END) AS ss_a,
        SUM(CASE WHEN c.c_mktsegment = '{WELCH_SEG_B}' THEN 1 ELSE 0 END)
          AS n_b,
        SUM(CASE WHEN c.c_mktsegment = '{WELCH_SEG_B}'
            THEN CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            ELSE 0 END)::HUGEINT AS s_b,
        SUM(CASE WHEN c.c_mktsegment = '{WELCH_SEG_B}'
            THEN CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
                 * CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
            ELSE 0 END) AS ss_b
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment IN ('{WELCH_SEG_A}', '{WELCH_SEG_B}')
    )
    SELECT {", ".join(_WELCH_SELECT)} FROM suff
"""


# --- Two-feature OLS via exact normal equations --------------------
# Cramer's rule on the 3x3 normal-equation system, every matrix entry
# an exact decimal sufficient sum. The determinant expressions are
# shared verbatim between engines (selectExpr / SQL), so association
# order is pinned. y = order total (cents), x1 = order quantity
# (centi-units), x2 = line-item count.
def _d(col: str) -> str:
    return f"CAST({col} AS DOUBLE)"


_O_DET = (
    f"({_d('n')} * ({_d('s11')} * {_d('s22')} - {_d('s12')} * {_d('s12')})"
    f" - {_d('sx1')} * ({_d('sx1')} * {_d('s22')} - {_d('s12')} * {_d('sx2')})"
    f" + {_d('sx2')} * ({_d('sx1')} * {_d('s12')} - {_d('s11')} * {_d('sx2')}))"
)
_O_DET0 = (
    f"({_d('sy')} * ({_d('s11')} * {_d('s22')} - {_d('s12')} * {_d('s12')})"
    f" - {_d('sx1')} * ({_d('s1y')} * {_d('s22')} - {_d('s12')} * {_d('s2y')})"
    f" + {_d('sx2')} * ({_d('s1y')} * {_d('s12')} - {_d('s11')} * {_d('s2y')}))"
)
_O_DET1 = (
    f"({_d('n')} * ({_d('s1y')} * {_d('s22')} - {_d('s12')} * {_d('s2y')})"
    f" - {_d('sy')} * ({_d('sx1')} * {_d('s22')} - {_d('s12')} * {_d('sx2')})"
    f" + {_d('sx2')} * ({_d('sx1')} * {_d('s2y')} - {_d('s1y')} * {_d('sx2')}))"
)
_O_DET2 = (
    f"({_d('n')} * ({_d('s11')} * {_d('s2y')} - {_d('s1y')} * {_d('s12')})"
    f" - {_d('sx1')} * ({_d('sx1')} * {_d('s2y')} - {_d('s1y')} * {_d('sx2')})"
    f" + {_d('sy')} * ({_d('sx1')} * {_d('s12')} - {_d('s11')} * {_d('sx2')}))"
)
_O_B0 = f"({_O_DET0} / {_O_DET})"
_O_B1 = f"({_O_DET1} / {_O_DET})"
_O_B2 = f"({_O_DET2} / {_O_DET})"
_O_SST = f"({_d('syy')} - {_d('sy')} * {_d('sy')} / {_d('n')})"
_O_SSR = (
    f"({_O_B0} * {_d('sy')} + {_O_B1} * {_d('s1y')} + {_O_B2} * {_d('s2y')}"
    f" - {_d('sy')} * {_d('sy')} / {_d('n')})"
)
_OLS_SELECT = [
    "CAST(n AS BIGINT) AS n_orders",
    f"ROUND({_O_B0} / 100, 6) AS intercept_dollars",
    f"ROUND({_O_B1}, 6) AS beta_qty",
    f"ROUND({_O_B2} / 100, 6) AS beta_items_dollars",
    f"ROUND({_O_SSR} / {_O_SST}, 6) AS r_squared",
]


def q_ols_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression (2 features + intercept), exactly.

    Extends q_regr_trend's sufficient-statistics pattern from simple to
    MULTIPLE regression: predict order total from order quantity and
    line-item count. The fact table reduces map-side to ten exact
    decimal sums (n, Sx1, Sx2, Sy, Sx1x1, Sx2x2, Sx1x2, Sx1y, Sx2y,
    Syy) — the whole 3x3 normal-equation system — then Cramer's rule
    runs in doubles through expression strings SHARED with the oracle,
    so both engines execute the same tree. Where Spark's builtin
    regr_* aggregates are non-deterministic under partial-aggregation
    order, this is bit-stable at any partitioning: the only
    order-sensitive step (the decimal sums) is order-independent by
    construction. One lineitem shuffle (per-order rollup), one
    orderkey join, one scalar aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum((dec2("l_quantity") * 100).cast("long")).alias("x1"),
        F.count(F.lit(1)).alias("x2"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"), (dec2("o_totalprice") * 100).cast("long").alias("y")
    )
    xy = per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)

    def _s(expr, alias):
        return F.sum(expr.cast("decimal(38,0)")).cast("decimal(38,0)").alias(alias)

    d18 = lambda c: F.col(c).cast("decimal(18,0)")  # noqa: E731
    suff = xy.agg(
        F.count(F.lit(1)).alias("n"),
        _s(d18("x1"), "sx1"),
        _s(d18("x2"), "sx2"),
        _s(d18("y"), "sy"),
        _s(d18("x1") * d18("x1"), "s11"),
        _s(d18("x2") * d18("x2"), "s22"),
        _s(d18("x1") * d18("x2"), "s12"),
        _s(d18("x1") * d18("y"), "s1y"),
        _s(d18("x2") * d18("y"), "s2y"),
        _s(d18("y") * d18("y"), "syy"),
    )
    return suff.selectExpr(*_OLS_SELECT)


QUERIES["q_ols_two_feature"] = q_ols_two_feature

ORACLES["q_ols_two_feature"] = f"""
    WITH per_order AS (
      SELECT l_orderkey,
             SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS x1,
             COUNT(*) AS x2
      FROM lineitem GROUP BY 1
    ),
    xy AS (
      SELECT p.x1::HUGEINT AS x1, p.x2::HUGEINT AS x2,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT) AS y
      FROM per_order p JOIN orders o ON o.o_orderkey = p.l_orderkey
    ),
    suff AS (
      SELECT COUNT(*) AS n,
             SUM(x1) AS sx1, SUM(x2) AS sx2, SUM(y) AS sy,
             SUM(x1 * x1) AS s11, SUM(x2 * x2) AS s22,
             SUM(x1 * x2) AS s12, SUM(x1 * y) AS s1y,
             SUM(x2 * y) AS s2y, SUM(y * y) AS syy
      FROM xy
    )
    SELECT {", ".join(_OLS_SELECT)} FROM suff
"""


def _dyadic_band(cur: DataFrame, hist: DataFrame, val: str) -> DataFrame:
    """Shared banded self-join: trailing EWMA_WINDOW dyadic-weighted
    sums of ``val`` (a decimal column on hist) per (event_type, day).
    Returns (event_type, day_d, rn_cur, n_obs, num decimal, den bigint).
    """
    lag = F.col("rn_cur") - F.col("rn_h")
    joined = cur.join(hist, "event_type").filter((lag >= 0) & (lag < EWMA_WINDOW))
    weight = F.expr(
        f"shiftleft(1L, {EWMA_WINDOW - 1} - int(rn_cur - rn_h))"
    ).cast("bigint")
    return joined.groupBy("event_type", "day_d", "rn_cur").agg(
        F.sum(F.col(val).cast("decimal(38,6)") * weight.cast("decimal(38,0)"))
        .alias("num"),
        F.sum(weight).alias("den"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def q_double_ewma_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double exponential smoothing (level + trend forecast).

    The classic trend-aware forecaster (Brown 1959; the fixed-alpha
    sibling of Holt's method): S1 = EWMA(y), S2 = EWMA(S1), level =
    2·S1 − S2, trend = S1 − S2 (alpha = 1/2 makes the alpha/(1−alpha)
    factor exactly 1), forecast(+1) = level + trend. Runs the SAME
    dyadic-weight banded self-join as q_ewma_dyadic twice — first over
    daily cents, then over the S1 series quantized to DECIMAL(18,6)
    (the one double divide per stage is deterministic; quantizing
    before the second weighted sum keeps that sum order-independent).
    Both passes are O(grid × 16) on the collapsed (type, day) grid —
    the fact table is read once, at any corpus size.
    """
    daily = _daily_type_cents(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("d")
    g = daily.select(
        "event_type", "d", "cents", F.row_number().over(w).alias("rn")
    )
    cur = g.select(
        "event_type", F.col("d").alias("day_d"), F.col("rn").alias("rn_cur")
    )
    hist1 = g.select(
        "event_type",
        F.col("cents").cast("decimal(38,6)").alias("v"),
        F.col("rn").alias("rn_h"),
    )
    s1 = _dyadic_band(cur, hist1, "v").select(
        "event_type",
        "day_d",
        "rn_cur",
        "n_obs",
        (F.col("num").cast("double") / F.col("den").cast("double"))
        .cast("decimal(18,6)")
        .alias("s1"),
    )
    hist2 = s1.select(
        "event_type", F.col("s1").alias("v"), F.col("rn_cur").alias("rn_h")
    )
    s2 = _dyadic_band(
        s1.select("event_type", "day_d", "rn_cur"), hist2, "v"
    ).select(
        "event_type",
        "day_d",
        (F.col("num").cast("double") / F.col("den").cast("double"))
        .cast("decimal(18,6)")
        .alias("s2"),
    )
    out = s1.join(s2, ["event_type", "day_d"])
    lvl = 2 * F.col("s1").cast("double") - F.col("s2").cast("double")
    trd = F.col("s1").cast("double") - F.col("s2").cast("double")
    return out.select(
        "event_type",
        F.date_format("day_d", "yyyy-MM-dd").alias("day"),
        F.col("n_obs").cast("bigint").alias("n_obs"),
        F.round(F.col("s1").cast("double") / 100, 4).alias("s1"),
        F.round(F.col("s2").cast("double") / 100, 4).alias("s2"),
        F.round(lvl / 100, 4).alias("level"),
        F.round(trd / 100, 4).alias("trend_per_day"),
        F.round((lvl + trd) / 100, 4).alias("forecast_next"),
    ).orderBy("event_type", "day")


QUERIES["q_double_ewma_trend"] = q_double_ewma_trend

ORACLES["q_double_ewma_trend"] = f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    g AS (
      SELECT event_type, d, cents,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
      FROM daily
    ),
    s1 AS (
      SELECT c.event_type, c.d AS day_d, c.rn AS rn_cur,
             COUNT(*) AS n_obs,
             CAST(SUM(h.cents::DECIMAL(38,6)
                      * (1::BIGINT << ({EWMA_WINDOW - 1}
                                       - (c.rn - h.rn)))::DECIMAL(38,0))::DOUBLE
                  / SUM(1::BIGINT << ({EWMA_WINDOW - 1} - (c.rn - h.rn)))::DOUBLE
                  AS DECIMAL(18,6)) AS s1
      FROM g c JOIN g h ON h.event_type = c.event_type
                       AND c.rn - h.rn >= 0 AND c.rn - h.rn < {EWMA_WINDOW}
      GROUP BY 1, 2, 3
    ),
    s2 AS (
      SELECT c.event_type, c.day_d,
             CAST(SUM(h.s1::DECIMAL(38,6)
                      * (1::BIGINT << ({EWMA_WINDOW - 1}
                                       - (c.rn_cur - h.rn_cur)))::DECIMAL(38,0))::DOUBLE
                  / SUM(1::BIGINT << ({EWMA_WINDOW - 1} - (c.rn_cur - h.rn_cur)))::DOUBLE
                  AS DECIMAL(18,6)) AS s2
      FROM s1 c JOIN s1 h ON h.event_type = c.event_type
                         AND c.rn_cur - h.rn_cur >= 0
                         AND c.rn_cur - h.rn_cur < {EWMA_WINDOW}
      GROUP BY 1, 2
    )
    SELECT s1.event_type,
           strftime(s1.day_d, '%Y-%m-%d') AS day,
           s1.n_obs::BIGINT AS n_obs,
           ROUND(s1.s1::DOUBLE / 100, 4) AS s1,
           ROUND(s2.s2::DOUBLE / 100, 4) AS s2,
           ROUND((2 * s1.s1::DOUBLE - s2.s2::DOUBLE) / 100, 4) AS level,
           ROUND((s1.s1::DOUBLE - s2.s2::DOUBLE) / 100, 4) AS trend_per_day,
           ROUND((2 * s1.s1::DOUBLE - s2.s2::DOUBLE
                  + s1.s1::DOUBLE - s2.s2::DOUBLE) / 100, 4) AS forecast_next
    FROM s1 JOIN s2 ON s2.event_type = s1.event_type AND s2.day_d = s1.day_d
    ORDER BY s1.event_type, day
"""


# Two-sided alpha=0.05 and power=0.80 normal quantiles, 6-dp literals
# (parsing a decimal string is deterministic; libm's inverse-normal is
# not available in either engine anyway).
POWER_Z_ALPHA = 1.959964
POWER_Z_BETA = 0.841621
POWER_TARGET_REL = 0.02  # planning target: +2% relative uplift

_MDE_SHARED = [
    "CAST(n_a AS BIGINT) AS n_a",
    "CAST(n_b AS BIGINT) AS n_b",
    "ROUND(p_pool, 6) AS p_pool",
    f"ROUND(({POWER_Z_ALPHA} + {POWER_Z_BETA})"
    " * sqrt(2 * p_pool * (1 - p_pool) / CAST(n_a AS DOUBLE)), 6)"
    " AS mde_abs",
    f"ROUND(({POWER_Z_ALPHA} + {POWER_Z_BETA})"
    " * sqrt(2 * p_pool * (1 - p_pool) / CAST(n_a AS DOUBLE)) / p_pool, 6)"
    " AS mde_rel",
    f"CAST(ceil(({POWER_Z_ALPHA} + {POWER_Z_BETA})"
    f" * ({POWER_Z_ALPHA} + {POWER_Z_BETA}) * 2 * p_pool * (1 - p_pool)"
    f" / (({POWER_TARGET_REL} * p_pool) * ({POWER_TARGET_REL} * p_pool)))"
    " AS BIGINT) AS n_per_arm_for_2pct",
]


def q_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power planning: MDE now, sample size for +2%.

    The question asked BEFORE q_ab_proportion_ztest is asked after:
    with the traffic we have, what's the minimum detectable effect at
    alpha=.05 / power=.80, and how many users per arm would a +2%
    relative uplift need? Reuses the z-test's arm assignment and
    conversion definition (same parity split, same interior-by-
    construction threshold), reduces to (n_a, n_b, pooled p), then
    evaluates the textbook closed forms through expression strings
    shared verbatim with the oracle — normal quantiles are 6-dp
    literals, so no inverse-CDF enters either engine.
    """
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == AB_CONV_EVENT, 1).otherwise(0)
        ).alias("n_purch")
    )
    flagged = per_user.withColumn(
        "thresh",
        F.expr(
            "CAST(SUM(n_purch) OVER () AS BIGINT) div "
            "CAST(COUNT(1) OVER () AS BIGINT)"
        ),
    ).select(
        (F.col("user_id") % 2).cast("int").alias("variant"),
        F.when(F.col("n_purch") > F.col("thresh"), 1).otherwise(0).alias("conv"),
    )
    arms = flagged.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k")
    )
    a = arms.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("k").alias("k_a")
    )
    b = arms.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("k").alias("k_b")
    )
    j = a.crossJoin(b).withColumn(
        "p_pool",
        (F.col("k_a") + F.col("k_b")).cast("double")
        / (F.col("n_a") + F.col("n_b")).cast("double"),
    )
    return j.selectExpr(*_MDE_SHARED)


QUERIES["q_ab_power_mde"] = q_ab_power_mde

ORACLES["q_ab_power_mde"] = f"""
    WITH per_user AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = '{AB_CONV_EVENT}' THEN 1 ELSE 0 END)
               AS n_purch
      FROM events GROUP BY 1
    ),
    flagged AS (
      SELECT CAST(user_id % 2 AS INT) AS variant,
             CASE WHEN n_purch >
                    CAST(SUM(n_purch) OVER () AS BIGINT)
                    // CAST(COUNT(1) OVER () AS BIGINT)
                  THEN 1 ELSE 0 END AS conv
      FROM per_user
    ),
    arms AS (
      SELECT variant, COUNT(*) AS n, SUM(conv) AS k
      FROM flagged GROUP BY 1
    ),
    j AS (
      SELECT a.n AS n_a, a.k AS k_a, b.n AS n_b, b.k AS k_b,
             (a.k + b.k)::DOUBLE / (a.n + b.n)::DOUBLE AS p_pool
      FROM (SELECT n, k FROM arms WHERE variant = 0) a
      CROSS JOIN (SELECT n, k FROM arms WHERE variant = 1) b
    )
    SELECT {", ".join(_MDE_SHARED)} FROM j
"""


PSI_BUCKETS = 10


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the two halves of the stream.

    THE model-monitoring drift score: bucket the metric (event value)
    on reference-period decile edges, compare bucket shares between
    reference (first half of time) and current (second half), PSI =
    Σ (p_cur − p_ref)·ln(p_cur/p_ref). Reference edges come from
    exact NTILE deciles of the reference half (o(1) rows); both
    halves then classify map-side against the broadcast edge table.
    The ln per bucket quantizes to DECIMAL(18,8) before the sum
    (same discipline as the LM surprisal ops), so accumulation order
    cannot flip a bit. Output is per-bucket shares + the one-row PSI
    verdict folded in as a column (grand total via window over the
    10-row rollup). >0.2 = investigate — the industry threshold.
    """
    events = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros("ts")
    split = events.agg(
        ((F.min(ts_us) + F.max(ts_us)) / 2).cast("long").alias("s")
    )
    vals = events.crossJoin(F.broadcast(split)).select(
        (ts_us >= F.col("s")).alias("is_cur"),
        (dec2("value") * 100).cast("long").alias("cents"),
    )
    ref = vals.filter(~F.col("is_cur"))
    w = Window.orderBy("cents")
    # decile upper edges from the reference half: max cents per NTILE
    edges = (
        ref.select(F.ntile(PSI_BUCKETS).over(w.orderBy("cents")).alias("b"), "cents")
        .groupBy("b")
        .agg(F.max("cents").alias("hi"))
        .filter(F.col("b") < PSI_BUCKETS)  # top bucket is open-ended
        .select("b", "hi")
    )
    edge_arr = edges.agg(
        F.array_sort(F.collect_list(F.struct("b", "hi"))).alias("es")
    )
    bucketed = vals.crossJoin(F.broadcast(edge_arr)).select(
        "is_cur",
        (
            F.size(F.filter("es", lambda e: e["hi"] < F.col("cents"))) + 1
        ).alias("bucket"),
    )
    counts = bucketed.groupBy("bucket").agg(
        F.sum(F.when(~F.col("is_cur"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("is_cur"), 1).otherwise(0)).alias("n_cur"),
    )
    wt = Window.partitionBy()
    shares = counts.select(
        "bucket",
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        (
            F.col("n_ref").cast("double")
            / F.sum("n_ref").over(wt).cast("double")
        ).alias("p_ref"),
        (
            F.col("n_cur").cast("double")
            / F.sum("n_cur").over(wt).cast("double")
        ).alias("p_cur"),
    )
    term = (
        ((F.col("p_cur") - F.col("p_ref")) * F.log(F.col("p_cur") / F.col("p_ref")))
        .cast("decimal(18,8)")
    )
    with_term = shares.select(
        "bucket", "n_ref", "n_cur",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_cur", 6).alias("p_cur"),
        term.alias("t"),
    )
    return (
        with_term.select(
            "bucket",
            "n_ref",
            "n_cur",
            "p_ref",
            "p_cur",
            F.round(F.col("t").cast("double"), 6).alias("psi_term"),
            F.round(F.sum("t").over(wt).cast("double"), 6).alias("psi_total"),
        )
        .orderBy("bucket")
    )


QUERIES["q_psi_drift"] = q_psi_drift

ORACLES["q_psi_drift"] = f"""
    WITH vals AS (
      SELECT epoch_us(ts) >= (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2
                              FROM events) AS is_cur,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    edges AS (
      SELECT b, MAX(cents) AS hi FROM (
        SELECT NTILE({PSI_BUCKETS}) OVER (ORDER BY cents) AS b, cents
        FROM vals WHERE NOT is_cur
      ) GROUP BY b HAVING b < {PSI_BUCKETS}
    ),
    bucketed AS (
      SELECT is_cur,
             (SELECT COUNT(*) FROM edges e WHERE e.hi < v.cents) + 1 AS bucket
      FROM vals v
    ),
    counts AS (
      SELECT bucket,
             SUM(CASE WHEN NOT is_cur THEN 1 ELSE 0 END) AS n_ref,
             SUM(CASE WHEN is_cur THEN 1 ELSE 0 END) AS n_cur
      FROM bucketed GROUP BY 1
    ),
    shares AS (
      SELECT bucket, n_ref::BIGINT AS n_ref, n_cur::BIGINT AS n_cur,
             n_ref::DOUBLE / SUM(n_ref) OVER ()::DOUBLE AS p_ref,
             n_cur::DOUBLE / SUM(n_cur) OVER ()::DOUBLE AS p_cur
      FROM counts
    ),
    terms AS (
      SELECT bucket, n_ref, n_cur, p_ref, p_cur,
             CAST((p_cur - p_ref) * ln(p_cur / p_ref) AS DECIMAL(18,8)) AS t
      FROM shares
    )
    SELECT bucket, n_ref, n_cur,
           ROUND(p_ref, 6) AS p_ref, ROUND(p_cur, 6) AS p_cur,
           ROUND(t::DOUBLE, 6) AS psi_term,
           ROUND((SUM(t) OVER ())::DOUBLE, 6) AS psi_total
    FROM terms ORDER BY bucket
"""


def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier repeat-purchase curve, in the log domain.

    Survival analysis on "days from first to second order" with
    right-censoring (one-order customers censor at the dataset's last
    order date) — the retention readout subscription businesses live
    on. Per-duration (events d, censors c) counts collapse map-side;
    n_at_risk is total minus the running count of everyone who left
    strictly earlier, and the KM product Π(1 − d/n) is carried as a
    SUM of per-step ln(1 − d/n) terms quantized to DECIMAL(18,8) —
    reporting log-survival keeps the whole pipeline inside the repo's
    deterministic-transcendental discipline (no cross-engine exp at
    the boundary). O(customers) collapse + O(distinct durations)
    windows.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("od")
    )
    w = Window.partitionBy("o_custkey").orderBy("od")
    firsts = orders.select(
        "o_custkey",
        "od",
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= 2)
    per_cust = firsts.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("od"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("od"))).alias("d2"),
    )
    anchor = orders.agg(F.max("od").alias("dmax"))
    durs = per_cust.crossJoin(F.broadcast(anchor)).select(
        F.when(
            F.col("d2").isNotNull(), F.datediff("d2", "d1")
        ).otherwise(F.datediff("dmax", "d1")).cast("long").alias("t"),
        F.col("d2").isNotNull().alias("is_event"),
    )
    per_t = durs.groupBy("t").agg(
        F.sum(F.when(F.col("is_event"), 1).otherwise(0)).alias("d"),
        F.sum(F.when(~F.col("is_event"), 1).otherwise(0)).alias("c"),
    )
    wt = Window.partitionBy()
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risky = per_t.select(
        "t",
        "d",
        (
            F.sum(F.col("d") + F.col("c")).over(wt)
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wcum), F.lit(0))
        ).alias("n_risk"),
    ).filter(F.col("d") > 0)
    # the terminal step (d == n_risk) sends survival to exactly 0:
    # its log term is -inf, so that row reports NULL log-survival
    term = (
        F.when(
            F.col("d") < F.col("n_risk"),
            F.log(
                F.lit(1.0)
                - F.col("d").cast("double") / F.col("n_risk").cast("double")
            ),
        )
    ).cast("decimal(18,8)")
    wsurv = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    stepped = risky.select(
        "t",
        F.col("d").cast("bigint").alias("d_events"),
        F.col("n_risk").cast("bigint").alias("n_at_risk"),
        F.round(
            F.col("d").cast("double") / F.col("n_risk").cast("double"), 6
        ).alias("hazard"),
        term.alias("lt"),
    )
    return (
        stepped.select(
            F.col("t").alias("t_days"),
            "d_events",
            "n_at_risk",
            "hazard",
            F.when(
                F.col("d_events") < F.col("n_at_risk"),
                F.round(F.sum("lt").over(wsurv).cast("double"), 6),
            ).alias("log_survival"),
        )
        .orderBy("t_days")
    )


QUERIES["q_survival_km"] = q_survival_km

ORACLES["q_survival_km"] = """
    WITH firsts AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY CAST(o_orderdate AS DATE)) AS rn
      FROM orders QUALIFY rn <= 2
    ),
    per_cust AS (
      SELECT o_custkey,
             MIN(CASE WHEN rn = 1 THEN od END) AS d1,
             MIN(CASE WHEN rn = 2 THEN od END) AS d2
      FROM firsts GROUP BY 1
    ),
    durs AS (
      SELECT CASE WHEN d2 IS NOT NULL
                  THEN date_diff('day', d1, d2)
                  ELSE date_diff('day', d1,
                         (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders))
             END::BIGINT AS t,
             d2 IS NOT NULL AS is_event
      FROM per_cust
    ),
    per_t AS (
      SELECT t,
             SUM(CASE WHEN is_event THEN 1 ELSE 0 END) AS d,
             SUM(CASE WHEN is_event THEN 0 ELSE 1 END) AS c
      FROM durs GROUP BY 1
    ),
    risky AS (
      SELECT t, d,
             SUM(d + c) OVER ()
               - COALESCE(SUM(d + c) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM per_t QUALIFY d > 0
    ),
    stepped AS (
      SELECT t, d, n_risk,
             CASE WHEN d < n_risk THEN
               CAST(ln(1.0 - d::DOUBLE / n_risk::DOUBLE) AS DECIMAL(18,8))
             END AS lt
      FROM risky
    )
    SELECT t AS t_days,
           d::BIGINT AS d_events,
           n_risk::BIGINT AS n_at_risk,
           ROUND(d::DOUBLE / n_risk::DOUBLE, 6) AS hazard,
           CASE WHEN d < n_risk THEN
             ROUND((SUM(lt) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE,
                   6)
           END AS log_survival
    FROM stepped ORDER BY t_days
"""


def q_elasticity_loglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log demand curve slope per part type prefix (elasticity proxy).

    The classic econometric readout: regress ln(quantity) on
    ln(unit price) across a type family's line items — the slope is
    the (proxy) price elasticity of demand. Unit price and quantity
    reduce to exact integer centi-units first; both logs quantize to
    DECIMAL(18,8) BEFORE the sufficient sums (the Zipf/LM
    discipline), then the closed-form OLS slope runs per group with
    one double divide. One map-side pass to O(groups) rows.

    r10: loaded via ``load_table_parallel`` — the log + DECIMAL(38,16)
    sufficient-product math dominates and was serialized on the
    single-row-group scan task; no-op at scale (1.75 s → 1.13 s).
    """
    li = load_table_parallel(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 10).alias("type_bucket"),
        (dec2("l_extendedprice") * 100).cast("long").alias("price_c"),
        (dec2("l_quantity") * 100).cast("long").alias("qty_c"),
    )
    logged = li.select(
        "type_bucket",
        F.log(F.col("price_c").cast("double") / F.col("qty_c").cast("double"))
        .cast("decimal(18,8)")
        .alias("lx"),
        F.log(F.col("qty_c").cast("double") / 100)
        .cast("decimal(18,8)")
        .alias("ly"),
    )
    suff = logged.groupBy("type_bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum((F.col("lx") * F.col("lx")).cast("decimal(38,16)")).alias("sxx"),
        F.sum((F.col("lx") * F.col("ly")).cast("decimal(38,16)")).alias("sxy"),
    )
    return (
        suff.selectExpr(
            "CAST(type_bucket AS BIGINT) AS type_bucket",
            "CAST(n AS BIGINT) AS n_lines",
            "ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
            " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)"
            " AS elasticity",
        )
        .orderBy("type_bucket")
    )


QUERIES["q_elasticity_loglog"] = q_elasticity_loglog

ORACLES["q_elasticity_loglog"] = """
    WITH li AS (
      SELECT l_partkey % 10 AS type_bucket,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS price_c,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c
      FROM lineitem
    ),
    logged AS (
      SELECT type_bucket,
             CAST(ln(price_c::DOUBLE / qty_c::DOUBLE) AS DECIMAL(18,8)) AS lx,
             CAST(ln(qty_c::DOUBLE / 100) AS DECIMAL(18,8)) AS ly
      FROM li
    ),
    suff AS (
      SELECT type_bucket, COUNT(*) AS n, SUM(lx) AS sx, SUM(ly) AS sy,
             SUM(CAST(CAST(lx AS DECIMAL(19,8)) * lx AS DECIMAL(38,16)))
               AS sxx,
             SUM(CAST(CAST(lx AS DECIMAL(19,8)) * ly AS DECIMAL(38,16)))
               AS sxy
      FROM logged GROUP BY 1
    )
    SELECT CAST(type_bucket AS BIGINT) AS type_bucket,
           CAST(n AS BIGINT) AS n_lines,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             AS elasticity
    FROM suff ORDER BY type_bucket
"""


def q_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across all market segments on order value.

    Welch's t compares two segments; ANOVA asks the k-group question
    ("does segment matter at all?"). Per-group exact decimal
    (n, Σcents, Σcents²) collapse map-side, then the classic
    decomposition on the k-row table: SSB = Σ nᵢ(mᵢ − m)²,
    SSW = Σ (ssᵢ − sᵢ²/nᵢ), F = (SSB/(k−1)) / (SSW/(N−k)) — one
    closed-form double chain per output cell, mirrored verbatim in
    the oracle. Output: one row with the F statistic, df pair, and
    eta² effect size.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    cents = (dec2("o_totalprice") * 100).cast("long").cast("decimal(18,0)")
    per_seg = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).cast("decimal(38,0)").alias("s"),
            F.sum((cents * cents).cast("decimal(38,0)")).alias("ss"),
        )
    )
    # fold the k-row group table into one row of exact totals plus the
    # decimal-quantized between/within components
    grand = per_seg.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_total"),
        F.sum("s").cast("decimal(38,0)").alias("s_tot"),
        F.sum("ss").cast("decimal(38,0)").alias("ss_tot"),
        F.sum(
            (
                (F.col("s").cast("double") * F.col("s").cast("double"))
                / F.col("n").cast("double")
            ).cast("decimal(38,6)")
        ).alias("sum_sq_over_n"),
    )
    ssb = (
        "CAST(sum_sq_over_n AS DOUBLE)"
        " - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE)"
        " / CAST(n_total AS DOUBLE)"
    )
    ssw = "CAST(ss_tot AS DOUBLE) - CAST(sum_sq_over_n AS DOUBLE)"
    f_stat = (
        f"(({ssb}) / (CAST(k AS DOUBLE) - 1))"
        f" / (({ssw}) / (CAST(n_total AS DOUBLE) - CAST(k AS DOUBLE)))"
    )
    eta2 = f"({ssb}) / (({ssb}) + ({ssw}))"
    return grand.selectExpr(
        "CAST(k AS BIGINT) AS k_groups",
        "CAST(n_total AS BIGINT) AS n_total",
        f"ROUND({f_stat}, 6) AS f_stat",
        "CAST(k - 1 AS BIGINT) AS df_between",
        "CAST(n_total - k AS BIGINT) AS df_within",
        f"ROUND({eta2}, 6) AS eta_squared",
    )


QUERIES["q_anova_oneway"] = q_anova_oneway

ORACLES["q_anova_oneway"] = """
    WITH per_seg AS (
      SELECT c.c_mktsegment,
             COUNT(*) AS n,
             SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               ::HUGEINT AS s,
             SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
                 * CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS HUGEINT)) AS ss
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1
    ),
    grand AS (
      SELECT COUNT(*) AS k, SUM(n) AS n_total,
             SUM(s) AS s_tot, SUM(ss) AS ss_tot,
             SUM(CAST(s::DOUBLE * s::DOUBLE / n::DOUBLE AS DECIMAL(38,6)))
               AS sum_sq_over_n
      FROM per_seg
    )
    SELECT CAST(k AS BIGINT) AS k_groups,
           CAST(n_total AS BIGINT) AS n_total,
           ROUND(((CAST(sum_sq_over_n AS DOUBLE)
                   - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE)
                     / CAST(n_total AS DOUBLE)) / (CAST(k AS DOUBLE) - 1))
                 / ((CAST(ss_tot AS DOUBLE) - CAST(sum_sq_over_n AS DOUBLE))
                    / (CAST(n_total AS DOUBLE) - CAST(k AS DOUBLE))), 6)
             AS f_stat,
           CAST(k - 1 AS BIGINT) AS df_between,
           CAST(n_total - k AS BIGINT) AS df_within,
           ROUND((CAST(sum_sq_over_n AS DOUBLE)
                  - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE)
                    / CAST(n_total AS DOUBLE))
                 / ((CAST(sum_sq_over_n AS DOUBLE)
                     - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE)
                       / CAST(n_total AS DOUBLE))
                    + (CAST(ss_tot AS DOUBLE)
                       - CAST(sum_sq_over_n AS DOUBLE))), 6)
             AS eta_squared
    FROM grand
"""


# --- r06: most-likely changepoint (CUSUM argmax) ----------------------------


def q_changepoint_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-likely level-shift day per event type: the day k whose
    centered CUSUM |S_k| = |n·cum_k − k·total| is largest (the
    classical changepoint location estimator behind binary
    segmentation). Cross-multiplied to keep everything BIGINT — no
    mean, no float — so the argmax day cannot differ between engines;
    ties break to the earliest day. Runs entirely on the collapsed
    O(types × days) grid; the only corpus-sized work is the one
    map-side partial agg that builds the grid.
    """
    daily = _daily_type_cents(spark, sf_dir)
    per_type = Window.partitionBy("event_type")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = daily.select(
        "event_type",
        "d",
        (
            F.count(F.lit(1)).over(per_type) * F.sum("cents").over(w_run)
            - F.row_number().over(Window.partitionBy("event_type").orderBy("d"))
            * F.sum("cents").over(per_type)
        ).alias("s_k"),
    )
    w_pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s_k")).desc(), F.col("d")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("change_day"),
            F.abs(F.col("s_k")).cast("bigint").alias("cusum_abs"),
            F.when(F.col("s_k") > 0, F.lit("down")).otherwise(F.lit("up"))
            .alias("shift_direction"),
        )
        .orderBy("event_type")
    )


QUERIES["q_changepoint_argmax"] = q_changepoint_argmax

ORACLES["q_changepoint_argmax"] = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, d,
             COUNT(*) OVER (PARTITION BY event_type)
               * SUM(cents) OVER (PARTITION BY event_type ORDER BY d
                                  ROWS UNBOUNDED PRECEDING)
             - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
               * SUM(cents) OVER (PARTITION BY event_type) AS s_k
      FROM daily
    ),
    picked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY ABS(s_k) DESC, d) AS rn
      FROM scored
    )
    SELECT event_type,
           strftime(d, '%Y-%m-%d') AS change_day,
           CAST(ABS(s_k) AS BIGINT) AS cusum_abs,
           CASE WHEN s_k > 0 THEN 'down' ELSE 'up' END AS shift_direction
    FROM picked WHERE rn = 1 ORDER BY event_type
"""


# ---- r08 statistics batch: moment tests, robust outlier/association ----
#
# Shared discipline (same as q_welch_ttest / q_chi_square_assoc): facts
# reduce to exact integer/decimal sufficient statistics in ONE map-side
# partial agg; the test statistic is then a closed-form double chain
# shared VERBATIM between selectExpr and the DuckDB oracle, with any
# cross-row double sum micro-rounded to BIGINT first so the SUM is
# shuffle-order-independent.

JB_CRIT_5PCT = "5.991464"  # chi2(2) 95% quantile, 6-dp literal
GRUBBS_FLAG_G = "4.0"  # conventional large-n flag threshold (doc note)
MOOD_CRIT_5PCT = "9.487729"  # chi2(4) 95% quantile for the 5 event types
RUNS_CRIT_Z = "1.959964"  # two-sided normal 95% quantile

# raw->central moment chains on integer-cent sums; {p} = prefix
_MU = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
_M2 = f"(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - {_MU} * {_MU})"
_M3 = (
    f"(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 3 * {_MU} * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" + 2 * {_MU} * {_MU} * {_MU})"
)
_M4 = (
    f"(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 4 * {_MU} * CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" + 6 * {_MU} * {_MU} * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 3 * {_MU} * {_MU} * {_MU} * {_MU})"
)
# Zero-variance guard: a constant group (every value identical — the
# degenerate-corpus case) has M2 = 0 and skew/kurtosis undefined; the
# unguarded divide raises under Spark 4's default ANSI mode and gives
# NaN in DuckDB. Report NULL moments and FALSE flags, identically.
_M2_DEGEN = f"({_M2} <= 0)"
_SKEW = f"({_M3} / sqrt({_M2} * {_M2} * {_M2}))"
_KURT = f"({_M4} / ({_M2} * {_M2}))"
_JB = (
    f"(CAST(n AS DOUBLE) / 6.0 * ({_SKEW} * {_SKEW}"
    f" + ({_KURT} - 3.0) * ({_KURT} - 3.0) / 4.0))"
)

_JB_SELECT = [
    "event_type",
    "CAST(n AS BIGINT) AS n",
    f"ROUND({_MU} / 100, 4) AS mean_value",
    f"(CASE WHEN {_M2_DEGEN} THEN NULL ELSE ROUND({_SKEW}, 6) END)"
    " AS skewness",
    f"(CASE WHEN {_M2_DEGEN} THEN NULL ELSE ROUND({_KURT}, 6) END)"
    " AS kurtosis",
    f"(CASE WHEN {_M2_DEGEN} THEN NULL ELSE ROUND({_JB}, 4) END)"
    " AS jb_stat",
    f"(CASE WHEN {_M2_DEGEN} THEN FALSE"
    f" ELSE {_JB} > {JB_CRIT_5PCT} END) AS non_normal_5pct",
]


def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test per event type: skewness + excess
    kurtosis folded into the asymptotic chi2(2) statistic.

    Four exact moment sums (cents, cents²·³·⁴ — DECIMAL(38,0), far
    under overflow for 2-dp values below ~10^7) reduce map-side in one
    pass; skew and kurtosis are scale-invariant so the cent scaling
    cancels, and m2^1.5 is written sqrt(m2·m2·m2) to stay inside the
    correctly-rounded IEEE op set. One closed-form chain, shared
    verbatim with the oracle.
    """
    events = load_table(spark, sf_dir, "events")
    c = (dec2("value") * 100).cast("long").cast("decimal(18,0)")
    suff = (
        events.select("event_type", c.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").cast("decimal(38,0)").alias("s1"),
            F.sum(F.col("c") * F.col("c")).cast("decimal(38,0)").alias("s2"),
            F.sum(F.col("c") * F.col("c") * F.col("c"))
            .cast("decimal(38,0)")
            .alias("s3"),
            F.sum(F.col("c") * F.col("c") * F.col("c") * F.col("c"))
            .cast("decimal(38,0)")
            .alias("s4"),
        )
    )
    return suff.selectExpr(*_JB_SELECT).orderBy("event_type")


_G_SD = f"sqrt({_M2})"
_G_SUSPECT = (
    f"(CASE WHEN CAST(mx AS DOUBLE) - {_MU} >= {_MU} - CAST(mn AS DOUBLE)"
    " THEN CAST(mx AS DOUBLE) ELSE CAST(mn AS DOUBLE) END)"
)
_G_STAT = f"(abs({_G_SUSPECT} - {_MU}) / {_G_SD})"

_GRUBBS_SELECT = [
    "event_type",
    "CAST(n AS BIGINT) AS n",
    f"ROUND({_MU} / 100, 4) AS mean_value",
    f"ROUND({_G_SD} / 100, 4) AS sd_value",
    f"ROUND({_G_SUSPECT} / 100, 2) AS suspect_value",
    # zero-variance guard: see _M2_DEGEN — G divides by sd
    f"(CASE WHEN {_M2_DEGEN} THEN NULL ELSE ROUND({_G_STAT}, 6) END)"
    " AS g_stat",
    f"(CASE WHEN {_M2_DEGEN} THEN FALSE"
    f" ELSE {_G_STAT} > {GRUBBS_FLAG_G} END) AS outlier_flagged",
]


def q_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' max-deviation outlier statistic per event type:
    G = |suspect − mean| / sd, suspect = the extreme farther from the
    mean.

    The exact-t critical value depends on the t-distribution, which
    neither engine can evaluate deterministically, so the flag uses
    the conventional large-n screening threshold G > 4.0 (a literal;
    for n ≈ 2000 the true 5% critical value is ≈ 4.07) and the raw
    G statistic is emitted for downstream calibration. Sufficient
    statistics: n, Σc, Σc² plus min/max — one map-side pass.
    """
    events = load_table(spark, sf_dir, "events")
    c = (dec2("value") * 100).cast("long").cast("decimal(18,0)")
    suff = (
        events.select("event_type", c.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").cast("decimal(38,0)").alias("s1"),
            F.sum(F.col("c") * F.col("c")).cast("decimal(38,0)").alias("s2"),
            F.min("c").alias("mn"),
            F.max("c").alias("mx"),
        )
    )
    return suff.selectExpr(*_GRUBBS_SELECT).orderBy("event_type")


def _value_cents_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cents, count) value histogram of event values — the collapsed
    grid every exact rank statistic below runs on. The fact table
    never enters a sort: distinct 2-dp values are bounded by the value
    range (O(10^4) rows here), so the median comes from a cumulative
    window over the histogram, the scalable shape at any corpus size.
    """
    events = load_table(spark, sf_dir, "events")
    c = (dec2("value") * 100).cast("long")
    return events.groupBy(c.alias("cents")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def q_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across event types: is each type's value
    distribution centered on the same median?

    The grand median is rank-selected from the (cents, count) value
    histogram (cumulative window over O(distinct values) rows — the
    fact is never sorted). Each type then collapses to (above, ≤)
    counts and the 2×k chi-square folds per-group contributions
    micro-rounded to BIGINT (order-independent sum). One output row.
    """
    events = load_table(spark, sf_dir, "events")
    hist = _value_cents_hist(spark, sf_dir)
    w_cum = Window.partitionBy().orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    med = (
        hist.select(
            "cents",
            F.sum("cnt").over(w_cum).alias("cum"),
            F.sum("cnt").over(w_all).alias("n"),
        )
        .filter(F.col("cum") >= F.ceil(F.col("n") / 2))
        .agg(F.min("cents").alias("med_cents"))
    )
    c = (dec2("value") * 100).cast("long")
    per_type = (
        events.select("event_type", c.alias("c"))
        .crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.max("med_cents").alias("med_cents"),
            F.sum(F.when(F.col("c") > F.col("med_cents"), 1).otherwise(0)).alias("above"),
            F.sum(F.when(F.col("c") <= F.col("med_cents"), 1).otherwise(0)).alias("below"),
        )
    )
    wt = Window.partitionBy()
    tot = per_type.select(
        "event_type",
        "med_cents",
        "above",
        "below",
        F.sum("above").over(wt).alias("ta"),
        F.sum("below").over(wt).alias("tb"),
        F.count(F.lit(1)).over(wt).alias("k"),
    )
    ea = "(CAST(above + below AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(ta + tb AS DOUBLE))"
    eb = "(CAST(above + below AS DOUBLE) * CAST(tb AS DOUBLE) / CAST(ta + tb AS DOUBLE))"
    contrib = (
        f"((CAST(above AS DOUBLE) - {ea}) * (CAST(above AS DOUBLE) - {ea}) / {ea}"
        f" + (CAST(below AS DOUBLE) - {eb}) * (CAST(below AS DOUBLE) - {eb}) / {eb})"
    )
    scored = tot.selectExpr(
        "med_cents",
        "k",
        "ta",
        "tb",
        f"CAST(floor({contrib} * 1e6 + 0.5) AS BIGINT) AS micro",
    )
    return scored.groupBy("med_cents", "k", "ta", "tb").agg(
        F.sum("micro").alias("micro_sum")
    ).selectExpr(
        "ROUND(CAST(med_cents AS DOUBLE) / 100, 2) AS grand_median",
        "CAST(k AS BIGINT) AS k_groups",
        "CAST(ta + tb AS BIGINT) AS n",
        "ROUND(CAST(micro_sum AS DOUBLE) / 1e6, 4) AS chi2_stat",
        "CAST(k - 1 AS BIGINT) AS df",
        f"(CAST(micro_sum AS DOUBLE) / 1e6 > {MOOD_CRIT_5PCT}) AS differs_5pct",
    )


_RUNS_MU = "(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) + 1)"
_RUNS_VAR = (
    "(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
    " * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
    " - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))"
    " / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)"
    " * (CAST(n1 + n2 AS DOUBLE) - 1)))"
)
_RUNS_Z = f"((CAST(r AS DOUBLE) - {_RUNS_MU}) / sqrt({_RUNS_VAR}))"

# One-sided series (all remaining days on one side of the median)
# have zero run variance — z is undefined, not infinite: NULL guard.
_RUNS_DEGENERATE = "(n1 = 0 OR n2 = 0 OR n1 + n2 < 2)"

_RUNS_SELECT = [
    "CAST(n1 + n2 AS BIGINT) AS n_days",
    "CAST(n1 AS BIGINT) AS n_above",
    "CAST(n2 AS BIGINT) AS n_below",
    "CAST(r AS BIGINT) AS n_runs",
    f"CASE WHEN NOT {_RUNS_DEGENERATE} THEN ROUND({_RUNS_MU}, 4) END"
    " AS expected_runs",
    f"CASE WHEN NOT {_RUNS_DEGENERATE} THEN ROUND({_RUNS_Z}, 6) END"
    " AS z_stat",
    f"CASE WHEN NOT {_RUNS_DEGENERATE} THEN abs({_RUNS_Z}) <= {RUNS_CRIT_Z}"
    " END AS random_5pct",
]


def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily revenue series: are
    above-median and below-median days randomly interleaved, or does
    the series trend/cluster?

    Days at exactly the median are excluded (the standard
    convention). The median of the O(days) grid is rank-selected, the
    run count is one lag window over the grid, and the z statistic is
    the closed-form normal approximation — shared verbatim with the
    oracle. Everything after the one fact pass is day-grid-sized.
    """
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg((F.sum(dec2("value")) * 100).cast("bigint").alias("cents"))
    )
    w_rank = Window.partitionBy().orderBy("cents", "day")
    w_all = Window.partitionBy()
    med = (
        daily.select(
            "cents",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w_all).alias("n"),
        )
        .filter(F.col("rn") == F.ceil(F.col("n") / 2))
        .select(F.col("cents").alias("med_cents"))
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("cents") != F.col("med_cents"))
        .select(
            "day", (F.col("cents") > F.col("med_cents")).cast("int").alias("s")
        )
    )
    w_ord = Window.partitionBy().orderBy("day")
    runs = signed.select(
        "s",
        F.when(
            F.lag("s").over(w_ord).isNull()
            | (F.lag("s").over(w_ord) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    suff = runs.agg(
        F.sum("s").alias("n1"),
        F.sum(1 - F.col("s")).alias("n2"),
        F.sum("new_run").alias("r"),
    )
    return suff.selectExpr(*_RUNS_SELECT)


def _cramers_pair(
    cells: DataFrame, pair_name: str
) -> DataFrame:
    """Chi2 + Cramér's V from a (x, y, n_obs) contingency frame.

    Margins come from windows over the O(r·c) cells; per-cell
    contributions micro-round to BIGINT before the total (the
    q_chi_square_assoc discipline), then V normalizes by
    N·(min(r,c)−1) in the shared closed-form chain.
    """
    w_row = Window.partitionBy("x")
    w_col = Window.partitionBy("y")
    w_all = Window.partitionBy()
    expected = (
        F.sum("n_obs").over(w_row).cast("double")
        * F.sum("n_obs").over(w_col).cast("double")
        / F.sum("n_obs").over(w_all).cast("double")
    )
    contrib = (F.col("n_obs").cast("double") - expected) * (
        F.col("n_obs").cast("double") - expected
    ) / expected
    scored = cells.select(
        F.floor(contrib * 1e6 + F.lit(0.5)).cast("bigint").alias("micro"),
        F.col("n_obs"),
        F.col("x"),
        F.col("y"),
    )
    suff = scored.agg(
        F.sum("micro").alias("micro_sum"),
        F.sum("n_obs").alias("n"),
        F.countDistinct("x").alias("r"),
        F.countDistinct("y").alias("c"),
    )
    v = (
        "sqrt(CAST(micro_sum AS DOUBLE) / 1e6 / (CAST(n AS DOUBLE)"
        " * (CAST(LEAST(r, c) AS DOUBLE) - 1)))"
    )
    return suff.selectExpr(
        f"'{pair_name}' AS pair",
        "CAST(n AS BIGINT) AS n",
        "CAST(r AS BIGINT) AS levels_x",
        "CAST(c AS BIGINT) AS levels_y",
        "ROUND(CAST(micro_sum AS DOUBLE) / 1e6, 4) AS chi2_stat",
        "CAST((r - 1) * (c - 1) AS BIGINT) AS df",
        f"ROUND({v}, 6) AS cramers_v",
    )


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association strength for a panel of categorical
    column pairs — the normalized [0,1] effect size the raw chi2 of
    q_chi_square_assoc can't give (chi2 grows with N; V doesn't).

    Each pair's contingency table is one map-side partial agg; all
    downstream math runs on O(r·c) cells. Two pairs cover the
    canonical cases: priority×status (both small) and status×year
    (categorical × derived time bucket).
    """
    orders = load_table(spark, sf_dir, "orders")
    p_s = orders.groupBy(
        F.col("o_orderpriority").alias("x"), F.col("o_orderstatus").alias("y")
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    s_y = orders.groupBy(
        F.col("o_orderstatus").alias("x"),
        F.year("o_orderdate").cast("string").alias("y"),
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    return (
        _cramers_pair(p_s, "priority_x_status")
        .unionAll(_cramers_pair(s_y, "status_x_year"))
        .orderBy("pair")
    )


def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between event type and day-of-week —
    "does WHAT users do depend on WHEN?", the dependence measure a
    correlation can't give for two categoricals.

    Plug-in estimator over the O(types×7) contingency grid: each
    p·ln(p/(px·py)) term quantizes to micro-nat BIGINT before the sum
    (the repo's transcendental discipline — ln is the one non-IEEE-
    exact op, so per-term rounding keeps the cross-engine hash
    stable). Marginal entropies ship alongside for the normalized MI.
    """
    events = load_table(spark, sf_dir, "events")
    cells = events.groupBy(
        F.col("event_type").alias("x"),
        F.dayofweek("ts").cast("string").alias("y"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w_row = Window.partitionBy("x")
    w_col = Window.partitionBy("y")
    w_all = Window.partitionBy()
    n = F.sum("c").over(w_all).cast("double")
    p_xy = F.col("c").cast("double") / n
    p_x = F.sum("c").over(w_row).cast("double") / n
    p_y = F.sum("c").over(w_col).cast("double") / n
    mi_term = p_xy * F.log(p_xy / (p_x * p_y))
    scored = cells.select(
        F.col("c"),
        F.floor(mi_term * F.lit(1e8) + F.lit(0.5)).cast("bigint").alias("mi_micro"),
    )
    hx_grid = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("cx"))
        .select(
            "cx", F.sum("cx").over(Window.partitionBy()).alias("nn")
        )
        .select(
            F.floor(
                -(F.col("cx").cast("double") / F.col("nn"))
                * F.log(F.col("cx").cast("double") / F.col("nn"))
                * F.lit(1e8)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("hx_micro")
        )
        .agg(F.sum("hx_micro").alias("hx_sum"))
    )
    hy_grid = (
        cells.groupBy("y")
        .agg(F.sum("c").alias("cy"))
        .select(
            "cy", F.sum("cy").over(Window.partitionBy()).alias("nn")
        )
        .select(
            F.floor(
                -(F.col("cy").cast("double") / F.col("nn"))
                * F.log(F.col("cy").cast("double") / F.col("nn"))
                * F.lit(1e8)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("hy_micro")
        )
        .agg(F.sum("hy_micro").alias("hy_sum"))
    )
    mi = scored.agg(
        F.sum("c").alias("n"), F.sum("mi_micro").alias("mi_sum")
    )
    return (
        mi.crossJoin(F.broadcast(hx_grid))
        .crossJoin(F.broadcast(hy_grid))
        .selectExpr(
            "CAST(n AS BIGINT) AS n",
            "ROUND(CAST(mi_sum AS DOUBLE) / 1e8, 6) AS mi_nats",
            "ROUND(CAST(hx_sum AS DOUBLE) / 1e8, 6) AS h_type",
            "ROUND(CAST(hy_sum AS DOUBLE) / 1e8, 6) AS h_dow",
            # a constant marginal (one event type / one weekday in the
            # corpus) has zero entropy: normalized MI undefined (x/0
            # raises under Spark 4 ANSI)
            "(CASE WHEN LEAST(hx_sum, hy_sum) <= 0 THEN NULL ELSE"
            " ROUND(CAST(mi_sum AS DOUBLE)"
            " / CAST(LEAST(hx_sum, hy_sum) AS DOUBLE), 6) END)"
            " AS normalized_mi",
        )
    )


def q_entropy_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily Shannon entropy of the event-type mix — the diversity
    series that flags days where one event type crowds out the rest
    (incident fingerprint). Complements q_diversity_simpson (which is
    fully rational) with the information-theoretic measure, under the
    same per-term micro-nat quantization as q_mutual_information.
    """
    events = load_table(spark, sf_dir, "events")
    cells = events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    w_day = Window.partitionBy("day")
    p = F.col("c").cast("double") / F.sum("c").over(w_day).cast("double")
    scored = cells.select(
        "day",
        "c",
        F.floor(-p * F.log(p) * F.lit(1e8) + F.lit(0.5))
        .cast("bigint")
        .alias("h_micro"),
    )
    return (
        scored.groupBy("day")
        .agg(
            F.sum("c").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("k_types"),
            F.sum("h_micro").alias("h_sum"),
        )
        .selectExpr(
            "day",
            "n_events",
            "k_types",
            "ROUND(CAST(h_sum AS DOUBLE) / 1e8, 6) AS entropy_nats",
        )
        .orderBy("day")
    )


QUERIES["q_jarque_bera"] = q_jarque_bera
QUERIES["q_grubbs_outlier"] = q_grubbs_outlier
QUERIES["q_mood_median_test"] = q_mood_median_test
QUERIES["q_runs_test"] = q_runs_test
QUERIES["q_cramers_v"] = q_cramers_v
QUERIES["q_mutual_information"] = q_mutual_information
QUERIES["q_entropy_by_group"] = q_entropy_by_group


ORACLES["q_jarque_bera"] = f"""
    WITH suff AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))::HUGEINT
               AS s1,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT)
                 * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS s2,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT)
                 * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT)
                 * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS s3,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT)
                 * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT)
                 * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT)
                 * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS s4
      FROM events GROUP BY 1
    )
    SELECT {", ".join(_JB_SELECT)} FROM suff ORDER BY event_type
"""

ORACLES["q_grubbs_outlier"] = f"""
    WITH suff AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))::HUGEINT
               AS s1,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT)
                 * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS s2,
             MIN(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS mn,
             MAX(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS mx
      FROM events GROUP BY 1
    )
    SELECT {", ".join(_GRUBBS_SELECT)} FROM suff ORDER BY event_type
"""

_MOOD_EA = (
    "(CAST(above + below AS DOUBLE) * CAST(ta AS DOUBLE)"
    " / CAST(ta + tb AS DOUBLE))"
)
_MOOD_EB = (
    "(CAST(above + below AS DOUBLE) * CAST(tb AS DOUBLE)"
    " / CAST(ta + tb AS DOUBLE))"
)
_MOOD_CONTRIB = (
    f"((CAST(above AS DOUBLE) - {_MOOD_EA}) * (CAST(above AS DOUBLE)"
    f" - {_MOOD_EA}) / {_MOOD_EA}"
    f" + (CAST(below AS DOUBLE) - {_MOOD_EB}) * (CAST(below AS DOUBLE)"
    f" - {_MOOD_EB}) / {_MOOD_EB})"
)

ORACLES["q_mood_median_test"] = f"""
    WITH hist AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             COUNT(*) AS cnt
      FROM events GROUP BY 1
    ),
    med AS (
      SELECT MIN(cents) AS med_cents FROM (
        SELECT cents,
               SUM(cnt) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
                 AS cum,
               SUM(cnt) OVER () AS n
        FROM hist
      ) WHERE cum >= CEIL(n / 2.0)
    ),
    per_type AS (
      SELECT event_type,
             MAX(med_cents) AS med_cents,
             SUM(CASE WHEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      > med_cents THEN 1 ELSE 0 END) AS above,
             SUM(CASE WHEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      <= med_cents THEN 1 ELSE 0 END) AS below
      FROM events, med GROUP BY event_type
    ),
    tot AS (
      SELECT event_type, med_cents, above, below,
             SUM(above) OVER () AS ta,
             SUM(below) OVER () AS tb,
             COUNT(*) OVER () AS k
      FROM per_type
    ),
    scored AS (
      SELECT med_cents, k, ta, tb,
             CAST(FLOOR({_MOOD_CONTRIB} * 1e6 + 0.5) AS BIGINT) AS micro
      FROM tot
    )
    SELECT ROUND(CAST(med_cents AS DOUBLE) / 100, 2) AS grand_median,
           CAST(k AS BIGINT) AS k_groups,
           CAST(ta + tb AS BIGINT) AS n,
           ROUND(CAST(SUM(micro) AS DOUBLE) / 1e6, 4) AS chi2_stat,
           CAST(k - 1 AS BIGINT) AS df,
           (CAST(SUM(micro) AS DOUBLE) / 1e6 > {MOOD_CRIT_5PCT})
             AS differs_5pct
    FROM scored GROUP BY med_cents, k, ta, tb
"""

ORACLES["q_runs_test"] = f"""
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(SUM(value::DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    med AS (
      SELECT cents AS med_cents FROM (
        SELECT cents,
               ROW_NUMBER() OVER (ORDER BY cents, day) AS rn,
               COUNT(*) OVER () AS n
        FROM daily
      ) WHERE rn = CEIL(n / 2.0)
    ),
    signed AS (
      SELECT day, CAST(cents > med_cents AS INT) AS s
      FROM daily, med WHERE cents <> med_cents
    ),
    runs AS (
      SELECT s,
             CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
                  OR LAG(s) OVER (ORDER BY day) <> s
                  THEN 1 ELSE 0 END AS new_run
      FROM signed
    ),
    suff AS (
      SELECT SUM(s) AS n1, SUM(1 - s) AS n2, SUM(new_run) AS r FROM runs
    )
    SELECT {", ".join(_RUNS_SELECT)} FROM suff
"""

_CRAMERS_V_SQL = (
    "sqrt(CAST(micro_sum AS DOUBLE) / 1e6 / (CAST(n AS DOUBLE)"
    " * (CAST(LEAST(r, c) AS DOUBLE) - 1)))"
)


def _cramers_oracle_pair(cells_sql: str, pair_name: str) -> str:
    """DuckDB replay of _cramers_pair over a (x, y, n_obs) cell CTE."""
    expected = (
        "(SUM(n_obs) OVER (PARTITION BY x)::DOUBLE"
        " * SUM(n_obs) OVER (PARTITION BY y)::DOUBLE"
        " / SUM(n_obs) OVER ()::DOUBLE)"
    )
    contrib = (
        f"((n_obs::DOUBLE - {expected}) * (n_obs::DOUBLE - {expected})"
        f" / {expected})"
    )
    return f"""
    SELECT '{pair_name}' AS pair,
           CAST(n AS BIGINT) AS n,
           CAST(r AS BIGINT) AS levels_x,
           CAST(c AS BIGINT) AS levels_y,
           ROUND(CAST(micro_sum AS DOUBLE) / 1e6, 4) AS chi2_stat,
           CAST((r - 1) * (c - 1) AS BIGINT) AS df,
           ROUND({_CRAMERS_V_SQL}, 6) AS cramers_v
    FROM (
      SELECT SUM(micro) AS micro_sum, SUM(n_obs) AS n,
             COUNT(DISTINCT x) AS r, COUNT(DISTINCT c_y) AS c
      FROM (
        SELECT x, y AS c_y, n_obs,
               CAST(FLOOR({contrib} * 1e6 + 0.5) AS BIGINT) AS micro
        FROM ({cells_sql})
      )
    )"""


ORACLES["q_cramers_v"] = (
    _cramers_oracle_pair(
        "SELECT o_orderpriority AS x, o_orderstatus AS y,"
        " COUNT(*) AS n_obs FROM orders GROUP BY 1, 2",
        "priority_x_status",
    )
    + "\n    UNION ALL\n"
    + _cramers_oracle_pair(
        "SELECT o_orderstatus AS x,"
        " CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS y,"
        " COUNT(*) AS n_obs FROM orders GROUP BY 1, 2",
        "status_x_year",
    )
    + "\n    ORDER BY pair"
)

ORACLES["q_mutual_information"] = """
    WITH cells AS (
      SELECT event_type AS x,
             CAST(dayofweek(ts) + 1 AS VARCHAR) AS y,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT c,
             CAST(FLOOR(
               (c::DOUBLE / SUM(c) OVER ()::DOUBLE)
               * ln((c::DOUBLE / SUM(c) OVER ()::DOUBLE)
                    / ((SUM(c) OVER (PARTITION BY x)::DOUBLE
                        / SUM(c) OVER ()::DOUBLE)
                       * (SUM(c) OVER (PARTITION BY y)::DOUBLE
                          / SUM(c) OVER ()::DOUBLE)))
               * 1e8 + 0.5) AS BIGINT) AS mi_micro
      FROM cells
    ),
    hx AS (
      SELECT SUM(hx_micro) AS hx_sum FROM (
        SELECT CAST(FLOOR(
                 -(cx::DOUBLE / nn) * ln(cx::DOUBLE / nn) * 1e8 + 0.5)
               AS BIGINT) AS hx_micro
        FROM (
          SELECT cx, SUM(cx) OVER () AS nn FROM (
            SELECT x, SUM(c) AS cx FROM cells GROUP BY 1
          )
        )
      )
    ),
    hy AS (
      SELECT SUM(hy_micro) AS hy_sum FROM (
        SELECT CAST(FLOOR(
                 -(cy::DOUBLE / nn) * ln(cy::DOUBLE / nn) * 1e8 + 0.5)
               AS BIGINT) AS hy_micro
        FROM (
          SELECT cy, SUM(cy) OVER () AS nn FROM (
            SELECT y, SUM(c) AS cy FROM cells GROUP BY 1
          )
        )
      )
    ),
    mi AS (SELECT SUM(c) AS n, SUM(mi_micro) AS mi_sum FROM scored)
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(CAST(mi_sum AS DOUBLE) / 1e8, 6) AS mi_nats,
           ROUND(CAST(hx_sum AS DOUBLE) / 1e8, 6) AS h_type,
           ROUND(CAST(hy_sum AS DOUBLE) / 1e8, 6) AS h_dow,
           (CASE WHEN LEAST(hx_sum, hy_sum) <= 0 THEN NULL ELSE
            ROUND(CAST(mi_sum AS DOUBLE)
                  / CAST(LEAST(hx_sum, hy_sum) AS DOUBLE), 6) END)
             AS normalized_mi
    FROM mi, hx, hy
"""

ORACLES["q_entropy_by_group"] = """
    WITH cells AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT day, c,
             CAST(FLOOR(
               -(c::DOUBLE / SUM(c) OVER (PARTITION BY day)::DOUBLE)
               * ln(c::DOUBLE / SUM(c) OVER (PARTITION BY day)::DOUBLE)
               * 1e8 + 0.5) AS BIGINT) AS h_micro
      FROM cells
    )
    SELECT day,
           SUM(c)::BIGINT AS n_events,
           COUNT(*)::BIGINT AS k_types,
           ROUND(CAST(SUM(h_micro) AS DOUBLE) / 1e8, 6) AS entropy_nats
    FROM scored GROUP BY day ORDER BY day
"""


BF_CRIT_5PCT = "2.372"  # F(4, inf) 95% literal (df1 = 5 types - 1)
# shared Brown-Forsythe F chain + degenerate guard (identical string in
# selectExpr and oracle): k=1 (one group), n=k (all-singleton groups)
# or zero within-variance makes F undefined — the unguarded divide
# raises under Spark 4 ANSI mode on a degenerate corpus.
_BF_BETWEEN = (
    "(CAST(szn_sum AS DOUBLE)"
    " - CAST(sz_all AS DOUBLE) * CAST(sz_all AS DOUBLE)"
    " / CAST(n AS DOUBLE))"
)
_BF_WITHIN = "(CAST(ssz_all AS DOUBLE) - CAST(szn_sum AS DOUBLE))"
_BF_F = (
    f"(({_BF_BETWEEN} / (CAST(k AS DOUBLE) - 1))"
    f" / ({_BF_WITHIN} / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))))"
)
_BF_DEGEN = f"(k <= 1 OR n <= k OR {_BF_WITHIN} <= 0)"
_BF_SELECT = [
    "CAST(k AS BIGINT) AS k_groups",
    "CAST(n AS BIGINT) AS n",
    f"(CASE WHEN {_BF_DEGEN} THEN NULL ELSE ROUND({_BF_F}, 6) END)"
    " AS f_stat",
    "CAST(k - 1 AS BIGINT) AS df1",
    "CAST(n - k AS BIGINT) AS df2",
    f"(CASE WHEN {_BF_DEGEN} THEN FALSE ELSE {_BF_F} > {BF_CRIT_5PCT} END)"
    " AS heteroscedastic_5pct",
]
LB_LAGS = 7  # Ljung-Box lag depth over the daily grid
LB_CRIT_5PCT = "14.067140"  # chi2(7) 95% quantile, 6-dp literal


def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe robust variance-homogeneity test across event
    types: Levene's ANOVA on |x − group MEDIAN| — the
    outlier-insensitive "are the spreads equal?" gate run before any
    pooled-variance test (Welch/ANOVA) is trusted.

    Per-group medians rank-select from per-group (cents, count) value
    histograms (the fact is never sorted); |x − med| stays an exact
    integer, the one-way F on those deviations reduces to per-group
    (n, Σz, Σz²) sums with the rational Σz_g²/n_g terms micro-rounded
    to BIGINT before the cross-group sum (order-independent). One
    output row, closed-form F chain.
    """
    events = load_table(spark, sf_dir, "events")
    c = (dec2("value") * 100).cast("long")
    hist = events.groupBy(
        "event_type", c.alias("cents")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_grp = Window.partitionBy("event_type")
    med = (
        hist.select(
            "event_type",
            "cents",
            F.sum("cnt").over(w_cum).alias("cum"),
            F.sum("cnt").over(w_grp).alias("ng"),
        )
        .filter(F.col("cum") >= F.ceil(F.col("ng") / 2))
        .groupBy("event_type")
        .agg(F.min("cents").alias("med_cents"))
    )
    z = F.abs(F.col("c") - F.col("med_cents"))
    per_group = (
        events.select("event_type", c.alias("c"))
        .join(F.broadcast(med), "event_type")
        .select("event_type", z.alias("z"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("ng"),
            F.sum("z").alias("sz"),
            F.sum(F.col("z").cast("decimal(38,0)") * F.col("z")).alias("ssz"),
        )
    )
    scored = per_group.selectExpr(
        "ng",
        "sz",
        "ssz",
        # Σz_g²/n_g is rational — round to the nearest INTEGER before
        # the global sum (unit quantization: the term is ~1e9 even at
        # sf0.01, so relative error ≤ 1e-9; a 1e-6 grain overflowed
        # BIGINT at the 10× probe). DECIMAL(38,0) carries the sum.
        "CAST(floor(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)"
        " / CAST(ng AS DOUBLE) + 0.5) AS DECIMAL(38,0)) AS szn_unit",
    )
    suff = scored.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sz").cast("decimal(38,0)").alias("sz_all"),
        F.sum("ssz").cast("decimal(38,0)").alias("ssz_all"),
        F.sum("szn_unit").cast("decimal(38,0)").alias("szn_sum"),
    )
    return suff.selectExpr(*_BF_SELECT)


def _lb_terms() -> tuple[list, list]:
    """(agg column exprs, shared rho²/(n−k) term strings) for the
    unrolled Ljung-Box lags — built once so the Spark selectExpr and
    the DuckDB oracle evaluate the IDENTICAL expression text."""
    aggs, terms = [], []
    for k in range(1, LB_LAGS + 1):
        # pairs (x_{t-k}, x_t): a = head element, b = tail element
        aggs.append(
            f"SUM(CASE WHEN a{k} IS NOT NULL THEN a{k} * b END) AS p{k}"
        )
        aggs.append(f"SUM(CASE WHEN a{k} IS NOT NULL THEN a{k} END) AS h{k}")
        aggs.append(f"SUM(CASE WHEN a{k} IS NOT NULL THEN b END) AS t{k}")
        num = (
            f"(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(p{k} AS DOUBLE)"
            f" - CAST(n AS DOUBLE) * CAST(s AS DOUBLE)"
            f" * (CAST(h{k} AS DOUBLE) + CAST(t{k} AS DOUBLE))"
            f" + (CAST(n AS DOUBLE) - {k}) * CAST(s AS DOUBLE)"
            f" * CAST(s AS DOUBLE))"
        )
        den = (
            "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)"
            " - CAST(n AS DOUBLE) * CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
        )
        terms.append(
            f"(({num} / {den}) * ({num} / {den})"
            f" / (CAST(n AS DOUBLE) - {k}))"
        )
    return aggs, terms


def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on daily purchase revenue: is there
    ANY autocorrelation in the first 7 lags, jointly? — the
    white-noise gate a forecaster runs on residuals (and the
    multi-lag generalization of q_autocorr_lag's single lag).

    Sample ACF with the full-series mean, cleared of the rational x̄
    by scaling through n² so every sufficient statistic is an exact
    DECIMAL(38,0) integer; Q = n(n+2)·Σρ_k²/(n−k) unrolls the 7 lags
    into ONE expression string shared verbatim with the oracle (fixed
    evaluation order — no cross-row double sum at all). The 7 lag
    windows run over the O(days) grid.
    """
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg((F.sum(dec2("value")) * 100).cast("bigint").alias("cents"))
    )
    w = Window.partitionBy().orderBy("day")
    lagged = daily.select(
        F.col("cents").cast("decimal(38,0)").alias("b"),
        *[
            F.lag("cents", k).over(w).cast("decimal(38,0)").alias(f"a{k}")
            for k in range(1, LB_LAGS + 1)
        ],
    )
    aggs, terms = _lb_terms()
    suff = lagged.selectExpr(
        "b",
        *[f"a{k}" for k in range(1, LB_LAGS + 1)],
    ).selectExpr(
        "COUNT(*) AS n",
        "SUM(b) AS s",
        "SUM(b * b) AS ss",
        *aggs,
    )
    q_expr = (
        "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2) * ("
        + " + ".join(terms)
        + "))"
    )
    return suff.selectExpr(
        "CAST(n AS BIGINT) AS n_days",
        f"CAST({LB_LAGS} AS BIGINT) AS m_lags",
        f"ROUND({q_expr}, 6) AS q_stat",
        f"({q_expr} > {LB_CRIT_5PCT}) AS autocorrelated_5pct",
    )


QUERIES["q_brown_forsythe"] = q_brown_forsythe
QUERIES["q_ljung_box"] = q_ljung_box

ORACLES["q_brown_forsythe"] = f"""
    WITH hist AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type, MIN(cents) AS med_cents FROM (
        SELECT event_type, cents,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER (PARTITION BY event_type) AS ng
        FROM hist
      ) WHERE cum >= CEIL(ng / 2.0) GROUP BY event_type
    ),
    per_group AS (
      SELECT e.event_type,
             COUNT(*) AS ng,
             SUM(ABS(CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT)
                     - m.med_cents)) AS sz,
             SUM(ABS(CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT)
                     - m.med_cents)::HUGEINT
                 * ABS(CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       - m.med_cents)) AS ssz
      FROM events e JOIN med m USING (event_type)
      GROUP BY 1
    ),
    scored AS (
      SELECT ng, sz, ssz,
             CAST(floor(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                  / CAST(ng AS DOUBLE) + 0.5) AS HUGEINT) AS szn_unit
      FROM per_group
    ),
    suff AS (
      SELECT COUNT(*) AS k, SUM(ng) AS n,
             SUM(sz)::HUGEINT AS sz_all, SUM(ssz)::HUGEINT AS ssz_all,
             SUM(szn_unit) AS szn_sum
      FROM scored
    )
    SELECT {", ".join(_BF_SELECT)}
    FROM suff
"""


def _lb_oracle() -> str:
    aggs, terms = _lb_terms()
    q_expr = (
        "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2) * ("
        + " + ".join(terms)
        + "))"
    )
    lag_cols = ",\n             ".join(
        f"LAG(cents, {k}) OVER (ORDER BY day)::HUGEINT AS a{k}"
        for k in range(1, LB_LAGS + 1)
    )
    agg_cols = ",\n             ".join(aggs)
    return f"""
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(SUM(value::DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    lagged AS (
      SELECT cents::HUGEINT AS b,
             {lag_cols}
      FROM daily
    ),
    suff AS (
      SELECT COUNT(*) AS n, SUM(b) AS s, SUM(b * b) AS ss,
             {agg_cols}
      FROM lagged
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST({LB_LAGS} AS BIGINT) AS m_lags,
           ROUND({q_expr}, 6) AS q_stat,
           ({q_expr} > {LB_CRIT_5PCT}) AS autocorrelated_5pct
    FROM suff
"""


ORACLES["q_ljung_box"] = _lb_oracle()


BOOT_B = 16  # bootstrap replicates
# Poisson(1) CDF breakpoints to 9 dp — literals, per the no-exp()-on-
# the-data-path discipline (both engines parse identical doubles)
_POIS1_CDF = (
    "0.367879441", "0.735758882", "0.919698603", "0.981011843",
    "0.996340153", "0.999405815", "0.999916759", "0.999989751",
    "0.999998875",
)


def _pois1_weight_sql(u: str) -> str:
    """Inverse-CDF Poisson(1) draw from a uniform expression ``u`` —
    a CASE ladder over the literal breakpoints (max weight 9)."""
    clauses = " ".join(
        f"WHEN {u} < {p} THEN {k}" for k, p in enumerate(_POIS1_CDF)
    )
    return f"(CASE {clauses} ELSE 9 END)"


def q_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for mean order value —
    the warehouse-scale resampling device (Chamandy et al.: per-row
    Poisson(1) replicate weights ≈ multinomial resampling, with NO
    shuffle of the data): each row contributes hash-derived weights to
    all B replicates in one scan, so the bootstrap costs one pass at
    any corpus size and is rerun-stable (no RNG state).

    The uniform is md5-derived per (orderkey, replicate) — exact
    integer → [0,1) double, identical in both engines — and the
    weight is an inverse-CDF CASE ladder over 9-dp Poisson(1)
    literals. Replicate means use exact integer cents; the summary
    emits the point mean, bootstrap SE, and the percentile CI from
    the replicate rank order (replicates are few and fixed — the
    rank runs over B rows).

    r10: the B-way replicate fan-out multiplies the per-row md5 + CASE
    ladder ×BOOT_B and runs in the SCAN stage — on a single-row-group
    local file that serialized 16× the md5 work onto one core.
    ``load_table_parallel`` widens it (a no-op at scale, where the
    scan has thousands of splits); measured 3.37 s → 0.65 s on the
    weighted-sums subtree.
    """
    orders = load_table_parallel(spark, sf_dir, "orders").select(
        "o_orderkey", (dec2("o_totalprice") * 100).cast("long").alias("cents")
    )
    reps = spark.range(BOOT_B).select(F.col("id").alias("rep"))
    u = (
        "(CAST(CONV(SUBSTRING(md5(CONCAT(CAST(o_orderkey AS STRING), '|',"
        " CAST(rep AS STRING))), 1, 8), 16, 10) AS DOUBLE) / 4294967296.0)"
    )
    weighted = orders.crossJoin(F.broadcast(reps)).selectExpr(
        "rep",
        "cents",
        f"{_pois1_weight_sql(u)} AS w",
    )
    per_rep = weighted.groupBy("rep").agg(
        F.sum(F.col("w") * F.col("cents")).cast("decimal(38,0)").alias("wc"),
        F.sum("w").cast("bigint").alias("wn"),
    )
    # drop zero-weight replicates: Poisson(1) weights can all land 0
    # on a tiny corpus (P ~ e^-n per replicate) and wc/wn would raise
    # under Spark 4 ANSI mode; a weightless replicate has no defined
    # mean in either engine. Live corpora keep all B replicates.
    rep_means = per_rep.filter("wn > 0").selectExpr(
        "rep",
        "CAST(wc AS DOUBLE) / CAST(wn AS DOUBLE) / 100 AS rep_mean",
    )
    point = orders.agg(
        F.sum("cents").cast("decimal(38,0)").alias("tc"),
        F.count(F.lit(1)).alias("tn"),
    )
    w_rank = Window.partitionBy().orderBy("rep_mean")
    ranked = rep_means.select(
        "rep_mean", F.row_number().over(w_rank).alias("rk")
    )
    lo_rk, hi_rk = 2, BOOT_B - 1  # ~P12.5/P87.5 at B=16 (doc'd grain)
    summary = ranked.agg(
        F.count(F.lit(1)).alias("b"),
        F.sum(
            F.floor(F.col("rep_mean") * 1e6 + F.lit(0.5)).cast("bigint")
        ).alias("sm_micro"),
        F.sum(
            (
                F.floor(F.col("rep_mean") * 1e6 + F.lit(0.5)).cast(
                    "decimal(38,0)"
                )
                * F.floor(F.col("rep_mean") * 1e6 + F.lit(0.5)).cast(
                    "decimal(38,0)"
                )
            )
        ).alias("sm2_micro"),
        F.max(F.when(F.col("rk") == lo_rk, F.col("rep_mean"))).alias("lo"),
        F.max(F.when(F.col("rk") == hi_rk, F.col("rep_mean"))).alias("hi"),
    )
    mu = "(CAST(sm_micro AS DOUBLE) / b / 1e6)"
    var = (
        "(CAST(sm2_micro AS DOUBLE) / 1e12 / b"
        f" - {mu} * {mu})"
    )
    return summary.crossJoin(F.broadcast(point)).selectExpr(
        "CAST(b AS BIGINT) AS n_replicates",
        "(CASE WHEN tn = 0 THEN NULL ELSE"
        " ROUND(CAST(tc AS DOUBLE) / CAST(tn AS DOUBLE) / 100, 4) END)"
        " AS point_mean",
        f"(CASE WHEN b <= 1 THEN NULL ELSE"
        f" ROUND(sqrt({var} * b / (b - 1)), 4) END) AS boot_se",
        "ROUND(lo, 4) AS ci_lo",
        "ROUND(hi, 4) AS ci_hi",
    )


QUERIES["q_bootstrap_ci_mean"] = q_bootstrap_ci_mean

_BOOT_U = (
    "(CAST(('0x' || SUBSTRING(md5(CONCAT(CAST(o_orderkey AS VARCHAR), '|',"
    " CAST(rep AS VARCHAR))), 1, 8))::UBIGINT AS DOUBLE) / 4294967296.0)"
)

ORACLES["q_bootstrap_ci_mean"] = f"""
    WITH orders_c AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ),
    reps AS (SELECT UNNEST(generate_series(0, {BOOT_B - 1})) AS rep),
    weighted AS (
      SELECT rep, cents, {_pois1_weight_sql(_BOOT_U)} AS w
      FROM orders_c, reps
    ),
    per_rep AS (
      SELECT rep, SUM(w * cents)::HUGEINT AS wc, SUM(w)::BIGINT AS wn
      FROM weighted GROUP BY rep
    ),
    rep_means AS (
      SELECT rep, CAST(wc AS DOUBLE) / CAST(wn AS DOUBLE) / 100 AS rep_mean
      FROM per_rep WHERE wn > 0
    ),
    point AS (
      SELECT SUM(cents)::HUGEINT AS tc, COUNT(*) AS tn FROM orders_c
    ),
    ranked AS (
      SELECT rep_mean, ROW_NUMBER() OVER (ORDER BY rep_mean) AS rk
      FROM rep_means
    ),
    summary AS (
      SELECT COUNT(*) AS b,
             SUM(CAST(FLOOR(rep_mean * 1e6 + 0.5) AS BIGINT)) AS sm_micro,
             SUM(CAST(FLOOR(rep_mean * 1e6 + 0.5) AS HUGEINT)
                 * CAST(FLOOR(rep_mean * 1e6 + 0.5) AS HUGEINT))
               AS sm2_micro,
             MAX(CASE WHEN rk = 2 THEN rep_mean END) AS lo,
             MAX(CASE WHEN rk = {BOOT_B - 1} THEN rep_mean END) AS hi
      FROM ranked
    )
    SELECT CAST(b AS BIGINT) AS n_replicates,
           (CASE WHEN tn = 0 THEN NULL ELSE
            ROUND(CAST(tc AS DOUBLE) / CAST(tn AS DOUBLE) / 100, 4) END)
             AS point_mean,
           (CASE WHEN b <= 1 THEN NULL ELSE
            ROUND(sqrt((CAST(sm2_micro AS DOUBLE) / 1e12 / b
                        - (CAST(sm_micro AS DOUBLE) / b / 1e6)
                        * (CAST(sm_micro AS DOUBLE) / b / 1e6))
                       * b / (b - 1)), 4) END) AS boot_se,
           ROUND(lo, 4) AS ci_lo,
           ROUND(hi, 4) AS ci_hi
    FROM summary, point
"""
