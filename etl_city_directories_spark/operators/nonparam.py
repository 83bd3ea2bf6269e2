"""Nonparametric statistics and seasonal decomposition operators.

Extends the stats suite (operators/stats.py) with the rank- and
order-statistic toolkit a 100 TB warehouse audit reaches for when the
data is NOT normal: Mann-Kendall monotone-trend detection, Spearman
rank correlation, a binned two-sample Kolmogorov-Smirnov distance,
and a classical trend / day-of-week-seasonal / remainder
decomposition. The reference pipeline has no corpus statistics at
all (nypl-spacetime/etl-city-directories city-directories.js:338-451
emits per-entry objects only); these close that gap for drift and
data-quality monitoring over event streams.

Cross-engine determinism policy (same as stats.py): collapse the
fact stream to a bounded grid with ONE map-side-combinable partial
aggregation, do every comparison in integer/decimal space (signs,
ranks, cumulative counts, cents), and allow only correctly-rounded
IEEE double ops (+ - * / sqrt) plus ONE final ROUND at the edge. No
transcendental functions anywhere, so no libm last-ulp divergence
can flip a driver hash.

Scale shape: every self-join / window below runs on the collapsed
grid — O(types x days) or O(types x value buckets), both bounded by
calendar and value range, not corpus size. The Mann-Kendall pair
join is O(days^2) per type with days capped by the audit window (a
year = 365 -> 66k pairs), never O(events^2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_city_directories_spark.functions.numeric import dec2
from etl_city_directories_spark.operators.stats import _daily_type_cents
from etl_city_directories_spark.sources.tables import load_table

KS_BUCKET_DOLLARS = 5  # histogram-KS value resolution (integer dollars)
TREND_HALF = 3  # centered moving-average half-width (7-day trend)


def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test per event type (daily revenue).

    S = sum over ordered day pairs (i < j) of sign(x_j - x_i): the
    classical distribution-free trend statistic — pure integer
    comparisons on exact cents, so the driver hash cannot drift.
    tau_a = S / (n(n-1)/2) normalizes to [-1, 1] (one double divide,
    ROUND 6). The pair join runs on the collapsed O(types x days)
    grid; fan-out is days-per-type (bounded by the calendar window),
    so the stage costs O(types x days^2) constants regardless of how
    many trillion events fed the grid.
    """
    daily = _daily_type_cents(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("d")
    g = daily.select(
        "event_type", "cents", F.row_number().over(w).alias("rn")
    )
    a = g.select(
        "event_type", F.col("cents").alias("xa"), F.col("rn").alias("ra")
    )
    b = g.select(
        "event_type", F.col("cents").alias("xb"), F.col("rn").alias("rb")
    )
    pairs = a.join(b, "event_type").filter(F.col("ra") < F.col("rb"))
    sign = (
        F.when(F.col("xb") > F.col("xa"), F.lit(1))
        .when(F.col("xb") < F.col("xa"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    agg = pairs.groupBy("event_type").agg(
        F.sum(sign).cast("bigint").alias("s_stat"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    return agg.select(
        "event_type",
        "s_stat",
        "n_pairs",
        F.round(
            F.col("s_stat").cast("double") / F.col("n_pairs").cast("double"), 6
        ).alias("tau_a"),
    ).orderBy("event_type")


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of daily event count vs daily revenue.

    Per event type: are busier days also higher-revenue days, robust
    to outliers? Fractional (average) ranks are kept exact as DOUBLED
    integers — r2 = 2*rank + (ties - 1) — so ties never introduce a
    .5 float; Pearson over the doubled ranks (scale-invariant) uses
    six DECIMAL(38,0) sufficient sums and one closed-form double
    expression (sqrt is correctly rounded), ROUND 6. Everything runs
    on the collapsed O(types x days) grid: two rank windows + one
    partial agg, no fact-sized shuffle.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents"),
    )

    def doubled_rank(col: str) -> F.Column:
        w_rank = Window.partitionBy("event_type").orderBy(col)
        w_tie = Window.partitionBy("event_type", col)
        return (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1)

    ranked = daily.select(
        "event_type",
        doubled_rank("n_ev").alias("rx"),
        doubled_rank("cents").alias("ry"),
    )
    d38 = "decimal(38,0)"
    agg = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("rx").cast(d38)).alias("sx"),
        F.sum(F.col("ry").cast(d38)).alias("sy"),
        F.sum(F.col("rx").cast(d38) * F.col("rx").cast(d38)).alias("sxx"),
        F.sum(F.col("ry").cast(d38) * F.col("ry").cast(d38)).alias("syy"),
        F.sum(F.col("rx").cast(d38) * F.col("ry").cast(d38)).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    # Zero-variance guard: a type whose daily counts (or cents) are all
    # equal has vx*vy = 0 and 0/0 = NaN, whose serialization is
    # engine-specific — return NULL on both sides instead.
    rho = F.when(
        (vx > 0) & (vy > 0), F.round(num / F.sqrt(vx * vy), 6)
    ).otherwise(F.lit(None).cast("double"))
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        rho.alias("spearman_rho"),
    ).orderBy("event_type")


def q_ks_twosample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov distance per event type.

    Does each event type's value distribution drift from the rest of
    the stream? D = max over value buckets of |CDF_type - CDF_rest|,
    kept exact by cross-multiplying the cumulative counts: d_num =
    max |c_t * m - c_r * n| with denominator n*m, one double divide
    at the edge (ROUND 6). Values are binned to integer
    KS_BUCKET_DOLLARS cells first, so the CDF grid is O(types x
    buckets) — bounded by the value range, not the corpus — and the
    per-type cumulative windows never see a fact row. The full
    types x buckets lattice comes from one tiny cross join of two
    sub-hundred-row dimension frames.
    """
    events = load_table(spark, sf_dir, "events")
    binned = events.select(
        "event_type",
        (F.floor(F.col("value") / KS_BUCKET_DOLLARS)).cast("bigint").alias("b"),
    ).groupBy("event_type", "b").agg(F.count(F.lit(1)).alias("c"))
    types = binned.select("event_type").distinct()
    buckets = binned.select("b").distinct()
    lattice = types.crossJoin(F.broadcast(buckets))
    grid = lattice.join(binned, ["event_type", "b"], "left").select(
        "event_type", "b", F.coalesce("c", F.lit(0)).alias("c")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    per_bucket_all = grid.groupBy("b").agg(F.sum("c").alias("c_all"))
    cum = grid.join(F.broadcast(per_bucket_all), "b").select(
        "event_type",
        "b",
        F.sum("c").over(w_cum).alias("cum_t"),
        F.col("c_all").alias("c_all"),
    )
    w_cum_all = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum2 = cum.select(
        "event_type",
        "b",
        "cum_t",
        (F.sum("c_all").over(w_cum_all) - F.col("cum_t")).alias("cum_r"),
    )
    w_tot = Window.partitionBy("event_type")
    tot = cum2.select(
        "event_type",
        "cum_t",
        "cum_r",
        F.max("cum_t").over(w_tot).alias("n"),
        F.max("cum_r").over(w_tot).alias("m"),
    )
    d_num = F.abs(F.col("cum_t") * F.col("m") - F.col("cum_r") * F.col("n"))
    return (
        tot.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_type"),
            F.max("m").cast("bigint").alias("n_rest"),
            F.max(d_num).cast("bigint").alias("d_num"),
        )
        .select(
            "event_type",
            "n_type",
            "n_rest",
            "d_num",
            F.round(
                F.col("d_num").cast("double")
                / (F.col("n_type") * F.col("n_rest")).cast("double"),
                6,
            ).alias("ks_d"),
        )
        .orderBy("event_type")
    )


def q_seasonal_dow_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend / day-of-week-seasonal / remainder split of daily revenue.

    Classical seasonal-means decomposition on the global daily order
    revenue series: trend = centered 7-day moving average (half-up
    integer rounding to cents — (2S + n) div 2n is exact for the
    all-positive series), seasonal = per-day-of-week mean of the
    integer detrended series (exact BIGINT sum, ONE double divide,
    ROUND 4), remainder = revenue - trend - seasonal of the rounded
    parts. The fact stream collapses to O(days) rows in one partial
    agg; the centered window and the 7-key day-of-week agg both run
    on that grid only.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    w_ma = (
        Window.partitionBy()
        .orderBy("d")
        .rowsBetween(-TREND_HALF, TREND_HALF)
    )
    ma = daily.select(
        "d",
        "cents",
        F.count(F.lit(1)).over(w_ma).alias("n_ma"),
        F.sum("cents").over(w_ma).alias("s_ma"),
    )
    # Half-up rounding by INTEGER division ((2S + n) div 2n): `div` stays
    # BIGINT-exact where a double `/` would lose bits past 2^53 at scale.
    trend_cents = F.expr("(2 * s_ma + n_ma) div (2 * n_ma)").cast("bigint")
    t = ma.select(
        "d",
        "cents",
        trend_cents.alias("trend_cents"),
        (F.col("cents") - trend_cents).alias("detr"),
        F.dayofweek("d").alias("dow"),
    )
    dow_mean = t.groupBy("dow").agg(
        F.sum("detr").alias("s_detr"), F.count(F.lit(1)).alias("n_dow")
    )
    seasonal = F.round(
        F.col("s_detr").cast("double") / (F.col("n_dow").cast("double") * 100),
        4,
    )
    out = t.join(F.broadcast(dow_mean), "dow")
    rev = F.col("cents").cast("double") / 100
    trend = F.round(F.col("trend_cents").cast("double") / 100, 4)
    return out.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("dow").cast("int").alias("dow"),
        rev.alias("rev"),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        F.round(rev - trend - seasonal, 4).alias("remainder"),
    ).orderBy("day")


QUERIES = {
    "q_mann_kendall": q_mann_kendall,
    "q_spearman_corr": q_spearman_corr,
    "q_ks_twosample": q_ks_twosample,
    "q_seasonal_dow_decompose": q_seasonal_dow_decompose,
}

_DAILY_SQL = """
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
"""

ORACLES = {
    "q_mann_kendall": f"""
        WITH daily AS ({_DAILY_SQL}),
        g AS (
          SELECT event_type, cents,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
          FROM daily
        )
        SELECT a.event_type,
               CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                             WHEN b.cents < a.cents THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat,
               COUNT(*)::BIGINT AS n_pairs,
               ROUND(CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                                   WHEN b.cents < a.cents THEN -1 ELSE 0 END)
                          AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS tau_a
        FROM g a JOIN g b
          ON a.event_type = b.event_type AND a.rn < b.rn
        GROUP BY 1 ORDER BY 1
    """,
    "q_spearman_corr": """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 COUNT(*) AS n_ev,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
          FROM events GROUP BY 1, 2
        ),
        ranked AS (
          SELECT event_type,
                 2 * RANK() OVER (PARTITION BY event_type ORDER BY n_ev)
                   + COUNT(*) OVER (PARTITION BY event_type, n_ev) - 1 AS rx,
                 2 * RANK() OVER (PARTITION BY event_type ORDER BY cents)
                   + COUNT(*) OVER (PARTITION BY event_type, cents) - 1 AS ry
          FROM daily
        ),
        agg AS (
          SELECT event_type,
                 CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
                 SUM(CAST(rx AS DECIMAL(38,0))) AS sx,
                 SUM(CAST(ry AS DECIMAL(38,0))) AS sy,
                 SUM(CAST(rx AS DECIMAL(38,0)) * CAST(rx AS DECIMAL(38,0)))
                   AS sxx,
                 SUM(CAST(ry AS DECIMAL(38,0)) * CAST(ry AS DECIMAL(38,0)))
                   AS syy,
                 SUM(CAST(rx AS DECIMAL(38,0)) * CAST(ry AS DECIMAL(38,0)))
                   AS sxy
          FROM ranked GROUP BY 1
        )
        SELECT event_type, CAST(n AS BIGINT) AS n_days,
               CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
                     AND CAST(n * syy - sy * sy AS DOUBLE) > 0
                 THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                       / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE)), 6)
                 ELSE NULL END
                 AS spearman_rho
        FROM agg ORDER BY 1
    """,
    "q_ks_twosample": f"""
        WITH binned AS (
          SELECT event_type,
                 CAST(FLOOR(value / {KS_BUCKET_DOLLARS}) AS BIGINT) AS b,
                 COUNT(*) AS c
          FROM events GROUP BY 1, 2
        ),
        lattice AS (
          SELECT t.event_type, u.b
          FROM (SELECT DISTINCT event_type FROM binned) t
          CROSS JOIN (SELECT DISTINCT b FROM binned) u
        ),
        grid AS (
          SELECT l.event_type, l.b, COALESCE(x.c, 0) AS c
          FROM lattice l LEFT JOIN binned x
            ON l.event_type = x.event_type AND l.b = x.b
        ),
        alltot AS (SELECT b, SUM(c) AS c_all FROM grid GROUP BY 1),
        cum AS (
          SELECT g.event_type, g.b,
                 SUM(g.c) OVER (PARTITION BY g.event_type ORDER BY g.b
                                ROWS UNBOUNDED PRECEDING) AS cum_t,
                 SUM(a.c_all) OVER (PARTITION BY g.event_type ORDER BY g.b
                                    ROWS UNBOUNDED PRECEDING)
                   - SUM(g.c) OVER (PARTITION BY g.event_type ORDER BY g.b
                                    ROWS UNBOUNDED PRECEDING) AS cum_r
          FROM grid g JOIN alltot a ON g.b = a.b
        ),
        tot AS (
          SELECT event_type, cum_t, cum_r,
                 MAX(cum_t) OVER (PARTITION BY event_type) AS n,
                 MAX(cum_r) OVER (PARTITION BY event_type) AS m
          FROM cum
        )
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n_type,
               CAST(MAX(m) AS BIGINT) AS n_rest,
               CAST(MAX(ABS(cum_t * m - cum_r * n)) AS BIGINT) AS d_num,
               ROUND(CAST(MAX(ABS(cum_t * m - cum_r * n)) AS DOUBLE)
                     / CAST(MAX(n) * MAX(m) AS DOUBLE), 6) AS ks_d
        FROM tot GROUP BY 1 ORDER BY 1
    """,
    "q_seasonal_dow_decompose": f"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                      AS BIGINT) AS cents
          FROM orders GROUP BY 1
        ),
        ma AS (
          SELECT d, cents,
                 COUNT(*) OVER w AS n_ma, SUM(cents) OVER w AS s_ma
          FROM daily
          WINDOW w AS (ORDER BY d
                       ROWS BETWEEN {TREND_HALF} PRECEDING
                                AND {TREND_HALF} FOLLOWING)
        ),
        t AS (
          SELECT d, cents,
                 CAST((2 * s_ma + n_ma) // (2 * n_ma) AS BIGINT)
                   AS trend_cents,
                 DAYOFWEEK(d) + 1 AS dow
          FROM ma
        ),
        dm AS (
          SELECT dow, SUM(cents - trend_cents) AS s_detr,
                 COUNT(*) AS n_dow
          FROM t GROUP BY 1
        )
        SELECT STRFTIME(t.d, '%Y-%m-%d') AS day,
               CAST(t.dow AS INT) AS dow,
               CAST(t.cents AS DOUBLE) / 100 AS rev,
               ROUND(CAST(t.trend_cents AS DOUBLE) / 100, 4) AS trend,
               ROUND(CAST(dm.s_detr AS DOUBLE)
                     / (CAST(dm.n_dow AS DOUBLE) * 100), 4) AS seasonal,
               ROUND(CAST(t.cents AS DOUBLE) / 100
                     - ROUND(CAST(t.trend_cents AS DOUBLE) / 100, 4)
                     - ROUND(CAST(dm.s_detr AS DOUBLE)
                             / (CAST(dm.n_dow AS DOUBLE) * 100), 4), 4)
                 AS remainder
        FROM t JOIN dm ON t.dow = dm.dow
        ORDER BY day
    """,
}


def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact isotonic (monotone nondecreasing) fit of daily revenue.

    The minimax characterization of isotonic regression — fit_i =
    max_{j<=i} min_{k>=i} avg(y[j..k]) — replaces the sequential
    pool-adjacent-violators scan with pure relational algebra: build
    all (j,k) intervals of the collapsed per-type daily grid from
    prefix sums, take the suffix-min over k per (type, j) with one
    window, then the max over j per (type, i) with one aggregation.
    Interval averages are integer-cents sums over one double divide
    (deterministic IEEE), so both engines materialize bit-identical
    fits; ROUND 4 at the edge. Cost is O(types x days^2) interval
    rows — bounded by the calendar window squared, never by corpus
    size (the fact stream collapses to the grid in ONE partial agg).
    """
    daily = _daily_type_cents(spark, sf_dir)
    w_rn = Window.partitionBy("event_type").orderBy("d")
    g = daily.select(
        "event_type",
        "d",
        "cents",
        F.row_number().over(w_rn).alias("rn"),
        (
            F.sum("cents").over(
                Window.partitionBy("event_type")
                .orderBy("d")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
        ).alias("ps"),
    )
    j = g.select(
        "event_type",
        F.col("rn").alias("jj"),
        (F.col("ps") - F.col("cents")).alias("ps_before"),
    )
    k = g.select(
        "event_type", F.col("rn").alias("kk"), F.col("ps").alias("ps_k")
    )
    intervals = j.join(k, "event_type").filter(F.col("jj") <= F.col("kk"))
    avg = (F.col("ps_k") - F.col("ps_before")).cast("double") / (
        F.col("kk") - F.col("jj") + 1
    ).cast("double")
    w_suf = (
        Window.partitionBy("event_type", "jj")
        .orderBy(F.col("kk").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sufmin = intervals.select(
        "event_type", "jj", "kk", F.min(avg.alias("a")).over(w_suf).alias("m")
    )
    fit = sufmin.groupBy("event_type", F.col("kk").alias("rn")).agg(
        F.max("m").alias("fit_cents")
    )
    return (
        g.join(fit, ["event_type", "rn"])
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            (F.col("cents").cast("double") / 100).alias("rev"),
            F.round(F.col("fit_cents") / 100, 4).alias("isotonic_fit"),
        )
        .orderBy("event_type", "day")
    )


QUERIES["q_isotonic_calibration"] = q_isotonic_calibration

ORACLES["q_isotonic_calibration"] = f"""
    WITH daily AS ({_DAILY_SQL}),
    g AS (
      SELECT event_type, d, cents,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
             SUM(cents) OVER (PARTITION BY event_type ORDER BY d
                              ROWS UNBOUNDED PRECEDING) AS ps
      FROM daily
    ),
    intervals AS (
      SELECT j.event_type, j.rn AS jj, k.rn AS kk,
             CAST(k.ps - (j.ps - j.cents) AS DOUBLE)
               / CAST(k.rn - j.rn + 1 AS DOUBLE) AS a
      FROM g j JOIN g k
        ON j.event_type = k.event_type AND j.rn <= k.rn
    ),
    sufmin AS (
      SELECT event_type, jj, kk,
             MIN(a) OVER (PARTITION BY event_type, jj ORDER BY kk DESC
                          ROWS UNBOUNDED PRECEDING) AS m
      FROM intervals
    ),
    fit AS (
      SELECT event_type, kk AS rn, MAX(m) AS fit_cents
      FROM sufmin GROUP BY 1, 2
    )
    SELECT g.event_type, STRFTIME(g.d, '%Y-%m-%d') AS day,
           CAST(g.cents AS DOUBLE) / 100 AS rev,
           ROUND(f.fit_cents / 100, 4) AS isotonic_fit
    FROM g JOIN fit f ON g.event_type = f.event_type AND g.rn = f.rn
    ORDER BY 1, 2
"""


WILCOXON_Z_CRIT = 1.959964  # two-sided 5% literal


def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test: did per-customer spend shift H1→H2?

    The paired nonparametric test (the distribution-free twin of a
    paired t-test): customers active in BOTH halves difference their
    exact-cent spend, zeros drop, |d| midranks assign in exact HALF-
    UNITS (mid2 = 2·rank_min + ties − 1 — integers, no fractional-rank
    doubles), and W⁺ = Σ midranks over positive differences. The
    normal approximation z = (W⁺ − n(n+1)/4)/√(n(n+1)(2n+1)/24) is
    one closed-form double (tie-variance correction omitted — noted,
    conservative here). One custkey collapse + one O(pairs) rank sort.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        F.to_date("o_orderdate").alias("od"),
    )
    split = orders.agg(
        F.date_add(
            F.min("od"), (F.datediff(F.max("od"), F.min("od")) / 2).cast("int")
        ).alias("mid")
    )
    per = (
        orders.crossJoin(F.broadcast(split))
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(
                    F.col("od") <= F.col("mid"),
                    (dec2("o_totalprice") * 100).cast("long"),
                ).otherwise(0)
            ).alias("h1"),
            F.sum(
                F.when(
                    F.col("od") > F.col("mid"),
                    (dec2("o_totalprice") * 100).cast("long"),
                ).otherwise(0)
            ).alias("h2"),
        )
        .filter((F.col("h1") > 0) & (F.col("h2") > 0))
        .select((F.col("h2") - F.col("h1")).alias("d"))
        .filter(F.col("d") != 0)
    )
    w_rank = Window.orderBy(F.abs(F.col("d")))
    ranked = per.select(
        "d",
        F.rank().over(w_rank).alias("rmin"),
        F.count(F.lit(1)).over(Window.partitionBy(F.abs(F.col("d")))).alias(
            "ties"
        ),
    )
    suff = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.col("d") > 0, 2 * F.col("rmin") + F.col("ties") - 1
            ).otherwise(0)
        ).alias("w2"),  # 2 * W+ in exact integers
    )
    z = (
        "((CAST(w2 AS DOUBLE) / 2) - CAST(n AS DOUBLE)"
        " * (CAST(n AS DOUBLE) + 1) / 4)"
        " / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)"
        " * (2 * CAST(n AS DOUBLE) + 1) / 24)"
    )
    return suff.selectExpr(
        "CAST(n AS BIGINT) AS n_pairs",
        "ROUND(CAST(w2 AS DOUBLE) / 2, 1) AS w_plus",
        f"ROUND({z}, 4) AS z_stat",
        f"(abs({z}) > {WILCOXON_Z_CRIT}) AS significant_5pct",
    )


QUERIES["q_wilcoxon_signed_rank"] = q_wilcoxon_signed_rank

ORACLES["q_wilcoxon_signed_rank"] = f"""
    WITH bounds AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
             MAX(CAST(o_orderdate AS DATE)) AS hi
      FROM orders
    ),
    per AS (
      SELECT o_custkey,
             SUM(CASE WHEN CAST(o.o_orderdate AS DATE) <=
                    (b.lo + CAST(date_diff('day', b.lo, b.hi) // 2 AS INT))
                  THEN CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                            AS BIGINT) ELSE 0 END) AS h1,
             SUM(CASE WHEN CAST(o.o_orderdate AS DATE) >
                    (b.lo + CAST(date_diff('day', b.lo, b.hi) // 2 AS INT))
                  THEN CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                            AS BIGINT) ELSE 0 END) AS h2
      FROM orders o, bounds b GROUP BY 1
    ),
    diffs AS (
      SELECT h2 - h1 AS d FROM per
      WHERE h1 > 0 AND h2 > 0 AND h2 <> h1
    ),
    ranked AS (
      SELECT d,
             RANK() OVER (ORDER BY abs(d)) AS rmin,
             COUNT(*) OVER (PARTITION BY abs(d)) AS ties
      FROM diffs
    ),
    suff AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN d > 0 THEN 2 * rmin + ties - 1 ELSE 0 END) AS w2
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           ROUND(CAST(w2 AS DOUBLE) / 2, 1) AS w_plus,
           ROUND(((CAST(w2 AS DOUBLE) / 2) - CAST(n AS DOUBLE)
                  * (CAST(n AS DOUBLE) + 1) / 4)
                 / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
                        * (2 * CAST(n AS DOUBLE) + 1) / 24), 4) AS z_stat,
           abs(((CAST(w2 AS DOUBLE) / 2) - CAST(n AS DOUBLE)
                * (CAST(n AS DOUBLE) + 1) / 4)
               / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
                      * (2 * CAST(n AS DOUBLE) + 1) / 24))
             > {WILCOXON_Z_CRIT} AS significant_5pct
    FROM suff
"""


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank ANOVA across market segments.

    The k-group nonparametric companion to q_anova_oneway: does
    customer spend RANK differently by segment? Runs on the
    per-customer collapse (the fact never enters the sort — same
    dimension-sized-rank discipline as RFM/Gini), with global
    midranks in exact half-units (2·rank_min + ties − 1). H =
    12/(N(N+1)) Σ R_j²/n_j − 3(N+1) evaluates with rank sums held as
    exact integers until the closed-form double chain. Tie-correction
    divisor 1 − Σ(t³−t)/(N³−N) folds in from the exact per-tie
    counts.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    spend = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum((dec2("o_totalprice") * 100).cast("long")).alias("cents")
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", "cents")
    )
    w = Window.orderBy("cents")
    ranked = spend.select(
        "c_mktsegment",
        F.rank().over(w).alias("rmin"),
        F.count(F.lit(1)).over(Window.partitionBy("cents")).alias("ties"),
    )
    per_seg = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("nj"),
        F.sum(2 * F.col("rmin") + F.col("ties") - 1).alias("r2j"),  # 2·Rj
    )
    tie_table = (
        spend.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                (F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t"))
                - F.col("t")
            ).alias("tie3")
        )
    )
    suff = per_seg.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("nj").alias("n"),
        F.sum(
            (
                (F.col("r2j").cast("double") / 2)
                * (F.col("r2j").cast("double") / 2)
                / F.col("nj").cast("double")
            ).cast("decimal(38,6)")
        ).alias("sum_r2_over_n"),
    ).crossJoin(F.broadcast(tie_table))
    h_raw = (
        "12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1))"
        " * CAST(sum_r2_over_n AS DOUBLE)"
        " - 3 * (CAST(n AS DOUBLE) + 1)"
    )
    tie_corr = (
        "1.0 - CAST(tie3 AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
        " - CAST(n AS DOUBLE))"
    )
    return suff.selectExpr(
        "CAST(k AS BIGINT) AS k_groups",
        "CAST(n AS BIGINT) AS n_customers",
        f"ROUND({h_raw}, 6) AS h_stat",
        f"ROUND(({h_raw}) / ({tie_corr}), 6) AS h_stat_tie_corrected",
        "CAST(k - 1 AS BIGINT) AS df",
    )


QUERIES["q_kruskal_wallis"] = q_kruskal_wallis

ORACLES["q_kruskal_wallis"] = """
    WITH spend AS (
      SELECT c.c_mktsegment,
             SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY o.o_custkey, c.c_mktsegment
    ),
    ranked AS (
      SELECT c_mktsegment,
             RANK() OVER (ORDER BY cents) AS rmin,
             COUNT(*) OVER (PARTITION BY cents) AS ties
      FROM spend
    ),
    per_seg AS (
      SELECT c_mktsegment, COUNT(*) AS nj,
             SUM(2 * rmin + ties - 1) AS r2j
      FROM ranked GROUP BY 1
    ),
    tie_table AS (
      SELECT SUM(t::HUGEINT * t * t - t) AS tie3 FROM (
        SELECT cents, COUNT(*) AS t FROM spend GROUP BY 1
      )
    ),
    suff AS (
      SELECT COUNT(*) AS k, SUM(nj) AS n,
             SUM(CAST((r2j::DOUBLE / 2) * (r2j::DOUBLE / 2) / nj::DOUBLE
                      AS DECIMAL(38,6))) AS sum_r2_over_n
      FROM per_seg
    )
    SELECT CAST(k AS BIGINT) AS k_groups,
           CAST(n AS BIGINT) AS n_customers,
           ROUND(12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1))
                 * CAST(sum_r2_over_n AS DOUBLE)
                 - 3 * (CAST(n AS DOUBLE) + 1), 6) AS h_stat,
           ROUND((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1))
                  * CAST(sum_r2_over_n AS DOUBLE)
                  - 3 * (CAST(n AS DOUBLE) + 1))
                 / (1.0 - CAST(tie3 AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                       * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 6)
             AS h_stat_tie_corrected,
           CAST(k - 1 AS BIGINT) AS df
    FROM suff, tie_table
"""


# --- r06: Theil–Sen robust slope --------------------------------------------


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend slope per event type: the median of all
    pairwise slopes (cents/day) over the daily revenue grid — the
    estimator that shrugs off the outlier days OLS chases.

    Slopes divide exact integer cents by exact integer day gaps (one
    correctly-rounded IEEE divide, ROUND 6); the median is selected
    positionally — order by (slope, day_a, day_b), take row
    ⌈m/2⌉ (the lower median, PERCENTILE_DISC semantics) — so both
    engines pick the identical pair instead of averaging two doubles.
    Pair fan-out is O(days² per type) on the collapsed grid, bounded
    by the calendar window exactly like q_mann_kendall.
    """
    daily = _daily_type_cents(spark, sf_dir).select(
        "event_type",
        F.datediff("d", F.lit("1995-01-01")).alias("x"),
        "cents",
    )
    a = daily.select(
        "event_type", F.col("x").alias("xa"), F.col("cents").alias("ca")
    )
    b = daily.select(
        "event_type", F.col("x").alias("xb"), F.col("cents").alias("cb")
    )
    pairs = a.join(b, "event_type").filter(F.col("xa") < F.col("xb"))
    sl = F.round(
        (F.col("cb") - F.col("ca")).cast("double")
        / (F.col("xb") - F.col("xa")).cast("double"),
        6,
    )
    ranked = pairs.select(
        "event_type", sl.alias("slope"), "xa", "xb"
    ).select(
        "event_type",
        "slope",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("slope", "xa", "xb"))
        .alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("m"),
    )
    return (
        ranked.filter(F.col("rn") == F.floor((F.col("m") + 1) / 2))
        .select(
            "event_type",
            F.col("m").cast("bigint").alias("n_pairs"),
            F.col("slope").alias("ts_slope_cents_per_day"),
        )
        .orderBy("event_type")
    )


QUERIES["q_theil_sen"] = q_theil_sen

ORACLES["q_theil_sen"] = f"""
    WITH daily AS ({_DAILY_SQL}),
    g AS (
      SELECT event_type,
             datediff('day', DATE '1995-01-01', d) AS x, cents
      FROM daily
    ),
    pairs AS (
      SELECT a.event_type,
             ROUND((b.cents - a.cents)::DOUBLE / (b.x - a.x)::DOUBLE, 6)
               AS slope,
             a.x AS xa, b.x AS xb
      FROM g a JOIN g b
        ON a.event_type = b.event_type AND a.x < b.x
    ),
    ranked AS (
      SELECT event_type, slope,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY slope, xa, xb) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS m
      FROM pairs
    )
    SELECT event_type,
           CAST(m AS BIGINT) AS n_pairs,
           slope AS ts_slope_cents_per_day
    FROM ranked
    WHERE rn = CAST(FLOOR((m + 1) / 2) AS BIGINT)
    ORDER BY event_type
"""


FRIEDMAN_CRIT_5PCT = "9.487729"  # chi2(4) 95% quantile (k=5 types)


def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test: blocks = days, treatments = event types —
    "do the types keep the same revenue ORDER day after day, or is
    the daily ranking noise?" The repeated-measures companion to
    q_kruskal_wallis (which ignores the day blocking).

    The fact collapses to the O(days×types) daily grid once
    (_daily_type_cents); only COMPLETE blocks (all k types present)
    rank, per the classical design. Within-block midranks use the
    exact half-unit trick (2·rank_min + ties − 1, an integer), rank
    sums stay integral until the closed-form Q chain — shared
    verbatim with the oracle. Q = 12/(b·k·(k+1))·ΣR_j² − 3·b·(k+1).
    """
    grid = _daily_type_cents(spark, sf_dir)
    k_all = grid.select(F.countDistinct("event_type").alias("k"))
    complete = (
        grid.groupBy("d")
        .agg(F.count(F.lit(1)).alias("nt"))
        .crossJoin(F.broadcast(k_all))
        .filter(F.col("nt") == F.col("k"))
        .select("d")
    )
    blocked = grid.join(complete, "d")
    w_rank = Window.partitionBy("d").orderBy("cents")
    w_tie = Window.partitionBy("d", "cents")
    ranked = blocked.select(
        "d",
        "event_type",
        (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1)
        .alias("r2"),  # 2·midrank, exact integer
    )
    per_type = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("b"),
        F.sum("r2").alias("r2j"),  # 2·R_j
    )
    suff = per_type.agg(
        F.count(F.lit(1)).alias("k"),
        F.max("b").alias("b"),
        F.sum(
            (F.col("r2j").cast("decimal(38,0)") * F.col("r2j"))
        ).alias("sum_4r2"),  # Σ (2R_j)² = 4·ΣR_j²
    )
    q_raw = (
        "12.0 / (CAST(b AS DOUBLE) * CAST(k AS DOUBLE)"
        " * (CAST(k AS DOUBLE) + 1))"
        " * (CAST(sum_4r2 AS DOUBLE) / 4.0)"
        " - 3.0 * CAST(b AS DOUBLE) * (CAST(k AS DOUBLE) + 1)"
    )
    return suff.selectExpr(
        "CAST(k AS BIGINT) AS k_treatments",
        "CAST(b AS BIGINT) AS b_blocks",
        f"ROUND({q_raw}, 6) AS q_stat",
        "CAST(k - 1 AS BIGINT) AS df",
        f"(({q_raw}) > {FRIEDMAN_CRIT_5PCT}) AS differs_5pct",
    )


QUERIES["q_friedman_test"] = q_friedman_test

ORACLES["q_friedman_test"] = f"""
    WITH grid AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    k_all AS (SELECT COUNT(DISTINCT event_type) AS k FROM grid),
    complete AS (
      SELECT d FROM grid, k_all GROUP BY d, k HAVING COUNT(*) = MAX(k)
    ),
    ranked AS (
      SELECT g.d, g.event_type,
             2 * RANK() OVER (PARTITION BY g.d ORDER BY g.cents)
             + COUNT(*) OVER (PARTITION BY g.d, g.cents) - 1 AS r2
      FROM grid g JOIN complete USING (d)
    ),
    per_type AS (
      SELECT event_type, COUNT(*) AS b, SUM(r2) AS r2j FROM ranked
      GROUP BY 1
    ),
    suff AS (
      SELECT COUNT(*) AS k, MAX(b) AS b,
             SUM(r2j::HUGEINT * r2j::HUGEINT) AS sum_4r2
      FROM per_type
    )
    SELECT CAST(k AS BIGINT) AS k_treatments,
           CAST(b AS BIGINT) AS b_blocks,
           ROUND(12.0 / (CAST(b AS DOUBLE) * CAST(k AS DOUBLE)
                 * (CAST(k AS DOUBLE) + 1))
                 * (CAST(sum_4r2 AS DOUBLE) / 4.0)
                 - 3.0 * CAST(b AS DOUBLE) * (CAST(k AS DOUBLE) + 1), 6)
             AS q_stat,
           CAST(k - 1 AS BIGINT) AS df,
           ((12.0 / (CAST(b AS DOUBLE) * CAST(k AS DOUBLE)
             * (CAST(k AS DOUBLE) + 1))
             * (CAST(sum_4r2 AS DOUBLE) / 4.0)
             - 3.0 * CAST(b AS DOUBLE) * (CAST(k AS DOUBLE) + 1))
            > {FRIEDMAN_CRIT_5PCT}) AS differs_5pct
    FROM suff
"""
