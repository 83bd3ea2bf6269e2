"""Forecast-evaluation and experimentation operators.

The reference ETL (nypl-spacetime/etl-city-directories
city-directories.js:338-451) emits yearly directory snapshots; a
warehouse user forecasting directory coverage — or any metric derived
from the event stream — needs the classical pre-forecast battery:
a unit-root gate (Dickey-Fuller), a causality screen (Granger), a
seasonal-naive backtest scoreboard (MAE/RMSE/sMAPE/MASE), and the
cross-correlation function between two series. The experimentation
half adds CUPED variance reduction and a Benjamini-Hochberg FDR panel
— the two workhorses of modern A/B analysis.

Cross-engine determinism policy (functions/numeric.py): every
sufficient statistic is an exact BIGINT/DECIMAL(38,0) sum over integer
cents; the closed-form double chains are built ONCE as expression
strings and evaluated verbatim by both Spark (selectExpr) and the
DuckDB oracle, so association order is pinned. Critical values are
6-dp literals (the same device as stats.py's BF/LB gates).

Scale notes: every operator collapses the event stream to the O(days)
daily grid (one map-side partial agg + one shuffle on day) or to an
O(users) rollup BEFORE any window or join; the single-partition lag
windows sort days (~30 rows), never events. At 100 TB the only full
pass over the facts is the first groupBy — the same shape as
stats.py's Ljung-Box / autocorr family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_city_directories_spark.functions.numeric import dec2
from etl_city_directories_spark.sources.tables import load_table

# Dickey-Fuller 5% critical value (constant, no trend, asymptotic —
# MacKinnon 2010 table 1; the n~30 value is -2.99, the flag direction
# is identical for this corpus either way).
DF_CRIT_5PCT = "-2.86"
# F(1, df2) upper 5% quantile ladder, df2 = n_obs - 3 keyed from the
# OBSERVED span (the BH z-ladder device) — the r8 advisor flagged the
# old fixed F(1,26) literal as wrong on any corpus whose event span
# differs from the 30-day calendar. Values are squares of the
# two-sided t(df2) 5% critical values (F(1,v) = t(v)^2), 6-dp
# literals, identical strings in both engines. Buckets past df2=30
# use the crit at the bucket's SMALLEST df2 (an upper bound on the
# true crit → conservative: never over-claims significance).
GRANGER_F_CRIT_LADDER = (
    "(CASE WHEN n - 3 < 1 THEN 1e9"
    " WHEN n - 3 = 1 THEN 161.447639"
    " WHEN n - 3 = 2 THEN 18.512821"
    " WHEN n - 3 = 3 THEN 10.127964"
    " WHEN n - 3 = 4 THEN 7.708647"
    " WHEN n - 3 = 5 THEN 6.607891"
    " WHEN n - 3 = 6 THEN 5.987378"
    " WHEN n - 3 = 7 THEN 5.591448"
    " WHEN n - 3 = 8 THEN 5.317655"
    " WHEN n - 3 = 9 THEN 5.117355"
    " WHEN n - 3 = 10 THEN 4.964603"
    " WHEN n - 3 = 11 THEN 4.844336"
    " WHEN n - 3 = 12 THEN 4.747225"
    " WHEN n - 3 = 13 THEN 4.667193"
    " WHEN n - 3 = 14 THEN 4.600110"
    " WHEN n - 3 = 15 THEN 4.543077"
    " WHEN n - 3 = 16 THEN 4.493998"
    " WHEN n - 3 = 17 THEN 4.451322"
    " WHEN n - 3 = 18 THEN 4.413873"
    " WHEN n - 3 = 19 THEN 4.380750"
    " WHEN n - 3 = 20 THEN 4.351244"
    " WHEN n - 3 = 21 THEN 4.324794"
    " WHEN n - 3 = 22 THEN 4.300950"
    " WHEN n - 3 = 23 THEN 4.279344"
    " WHEN n - 3 = 24 THEN 4.259677"
    " WHEN n - 3 = 25 THEN 4.241699"
    " WHEN n - 3 = 26 THEN 4.225201"
    " WHEN n - 3 = 27 THEN 4.210008"
    " WHEN n - 3 = 28 THEN 4.195972"
    " WHEN n - 3 = 29 THEN 4.182964"
    " WHEN n - 3 = 30 THEN 4.170877"
    " WHEN n - 3 <= 40 THEN 4.170877"
    " WHEN n - 3 <= 60 THEN 4.084746"
    " WHEN n - 3 <= 120 THEN 4.001191"
    " ELSE 3.920124 END)"
)
SEASONAL_PERIOD = 7  # weekly seasonality, same as q_seasonal_index_weekly
CCF_MAX_LAG = 3  # cross-correlation lags -3..+3
# BH step-up z-ladder for K=5 two-sided tests at alpha=0.05:
# rank i compares |z| against the two-sided z for p = alpha*i/K.
BH_Z_LADDER = ["2.575829", "2.326348", "2.170090", "2.053749", "1.959964"]
# ladder fallthrough for a rank beyond len(BH_Z_LADDER): effectively
# infinite (never significant) — an ELSE 0 would mark EVERY overflow
# rank significant and invert the step-up rule if the corpus ever
# grows a 6th event type (the ranks<=5 thresholds would also need a
# new K then; the fallthrough just keeps the failure safe, not silent)
BH_Z_OVERFLOW = "1e9"


def _d(col: str) -> str:
    return f"CAST({col} AS DOUBLE)"


def _rev_clicks_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily grid of (purchase revenue cents, click count).

    The event stream collapses to one conditional-sum groupBy on day
    (map-side partial agg, one shuffle on ~30 keys), then left-joins a
    generated [min, max] date spine so BOTH series are defined every
    calendar day (0-filled) — lag alignment needs contiguity, and a
    dark day IS a real 0 observation for revenue/clicks. The spine is
    a 1-row bounds aggregate exploded driver-free; the join is
    broadcast (spine ~ O(days)).
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.coalesce(
            (
                F.sum(
                    F.when(F.col("event_type") == "purchase", dec2("value"))
                ) * 100
            ).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("rev"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).cast("bigint").alias("clk"),
    )
    bounds = daily.groupBy().agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    return (
        spine.join(F.broadcast(daily), "d", "left")
        .select(
            "d",
            F.coalesce("rev", F.lit(0)).alias("rev"),
            F.coalesce("clk", F.lit(0)).alias("clk"),
        )
    )


_GRID_SQL = """
    daily AS (
      SELECT CAST(ts AS DATE) AS d,
             COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(value AS DECIMAL(18,2)) END) * 100
                     AS BIGINT), 0) AS rev,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS clk
      FROM events GROUP BY 1
    ),
    bounds AS (
      SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily
    ),
    spine AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
      FROM bounds
    ),
    grid AS (
      SELECT s.d, COALESCE(y.rev, 0) AS rev, COALESCE(y.clk, 0) AS clk
      FROM spine s LEFT JOIN daily y ON s.d = y.d
    )
"""


# --- Dickey-Fuller unit-root test ----------------------------------
# dy_t = a + rho * y_{t-1}: rho's t-statistic vs the DF distribution.
# Shared expression strings over the exact sums (n, sx, sy, sxx, sxy,
# syy) where x = y_{t-1} cents and y = the first difference.
_DF_RHO = (
    f"(({_d('n')} * {_d('sxy')} - {_d('sx')} * {_d('sy')})"
    f" / ({_d('n')} * {_d('sxx')} - {_d('sx')} * {_d('sx')}))"
)
_DF_SXX_C = f"({_d('sxx')} - {_d('sx')} * {_d('sx')} / {_d('n')})"
_DF_SXY_C = f"({_d('sxy')} - {_d('sx')} * {_d('sy')} / {_d('n')})"
_DF_SYY_C = f"({_d('syy')} - {_d('sy')} * {_d('sy')} / {_d('n')})"
_DF_SSE = f"({_DF_SYY_C} - {_DF_SXY_C} * {_DF_SXY_C} / {_DF_SXX_C})"
# Degenerate guards (identical strings in both engines): a constant
# level series (sxx_c = 0) or an exact linear law (SSE <= 0) has no
# sampling noise to test against — report rho/t = 0, i.e. "cannot
# reject the unit root", instead of an ANSI divide-by-zero.
_DF_DEGEN = f"({_DF_SXX_C} = 0 OR {_DF_SYY_C} = 0)"
_DF_RHO_G = f"(CASE WHEN {_DF_DEGEN} THEN 0.0 ELSE {_DF_RHO} END)"
_DF_T_RAW = (
    f"({_DF_RHO} / SQRT(({_DF_SSE} / ({_d('n')} - 2)) / {_DF_SXX_C}))"
)
_DF_T = (
    f"(CASE WHEN {_DF_DEGEN} THEN 0.0"
    f" WHEN {_DF_SSE} <= 0 THEN 0.0 ELSE {_DF_T_RAW} END)"
)
_DF_SELECT = [
    "CAST(n AS BIGINT) AS n_obs",
    f"ROUND({_DF_RHO_G}, 6) AS rho_hat",
    f"ROUND({_DF_T}, 6) AS t_stat",
    f"({_DF_T} > {DF_CRIT_5PCT}) AS nonstationary_5pct",
]


def q_dickey_fuller(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test on daily purchase revenue: does
    the level series mean-revert, or does a shock persist? — the gate
    every forecaster runs before trusting an ARMA fit on levels.

    Regress the first difference on the lagged level (with constant)
    and compare rho's t-statistic to the DF critical value. The lag
    pairing runs over the 0-filled O(days) grid; six DECIMAL(38,0)
    sums feed one closed-form double chain shared verbatim with the
    oracle. Failing to reject (t above the critical value) flags the
    series nonstationary — difference before modeling.
    """
    grid = _rev_clicks_grid(spark, sf_dir)
    w = Window.partitionBy().orderBy("d")
    pairs = grid.select(
        F.lag("rev", 1).over(w).alias("x"),
        (F.col("rev") - F.lag("rev", 1).over(w)).alias("y"),
    ).filter(F.col("x").isNotNull())
    d38 = "decimal(38,0)"
    suff = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x").cast(d38)).alias("sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y").cast(d38)).alias("sxy"),
        F.sum(F.col("y").cast(d38) * F.col("y").cast(d38)).alias("syy"),
    )
    return suff.selectExpr(*_DF_SELECT)


# --- Granger causality (1 lag) -------------------------------------
# Unrestricted: rev_t = b0 + b1*rev_{t-1} + b2*clk_{t-1} (Cramer's
# rule on the exact 3x3 normal equations, the q_ols_two_feature
# device); restricted drops clk. F = (SSE_r - SSE_u) / (SSE_u/(n-3)).
_G_DET = (
    f"({_d('n')} * ({_d('s11')} * {_d('s22')} - {_d('s12')} * {_d('s12')})"
    f" - {_d('sx1')} * ({_d('sx1')} * {_d('s22')} - {_d('s12')} * {_d('sx2')})"
    f" + {_d('sx2')} * ({_d('sx1')} * {_d('s12')} - {_d('s11')} * {_d('sx2')}))"
)
_G_DET0 = (
    f"({_d('sy')} * ({_d('s11')} * {_d('s22')} - {_d('s12')} * {_d('s12')})"
    f" - {_d('sx1')} * ({_d('s1y')} * {_d('s22')} - {_d('s12')} * {_d('s2y')})"
    f" + {_d('sx2')} * ({_d('s1y')} * {_d('s12')} - {_d('s11')} * {_d('s2y')}))"
)
_G_DET1 = (
    f"({_d('n')} * ({_d('s1y')} * {_d('s22')} - {_d('s12')} * {_d('s2y')})"
    f" - {_d('sy')} * ({_d('sx1')} * {_d('s22')} - {_d('s12')} * {_d('sx2')})"
    f" + {_d('sx2')} * ({_d('sx1')} * {_d('s2y')} - {_d('s1y')} * {_d('sx2')}))"
)
_G_DET2 = (
    f"({_d('n')} * ({_d('s11')} * {_d('s2y')} - {_d('s1y')} * {_d('s12')})"
    f" - {_d('sx1')} * ({_d('sx1')} * {_d('s2y')} - {_d('s1y')} * {_d('sx2')})"
    f" + {_d('sy')} * ({_d('sx1')} * {_d('s12')} - {_d('s11')} * {_d('sx2')}))"
)
_G_B0 = f"({_G_DET0} / {_G_DET})"
_G_B1 = f"({_G_DET1} / {_G_DET})"
_G_B2 = f"({_G_DET2} / {_G_DET})"
_G_SSE_U = (
    f"({_d('syy')} - ({_G_B0} * {_d('sy')} + {_G_B1} * {_d('s1y')}"
    f" + {_G_B2} * {_d('s2y')}))"
)
_G_S11_C = f"({_d('s11')} - {_d('sx1')} * {_d('sx1')} / {_d('n')})"
_G_S1Y_C = f"({_d('s1y')} - {_d('sx1')} * {_d('sy')} / {_d('n')})"
_G_SYY_C = f"({_d('syy')} - {_d('sy')} * {_d('sy')} / {_d('n')})"
_G_SSE_R = f"({_G_SYY_C} - {_G_S1Y_C} * {_G_S1Y_C} / {_G_S11_C})"
_G_F_RAW = (
    f"((({_G_SSE_R} - {_G_SSE_U}) * ({_d('n')} - 3)) / {_G_SSE_U})"
)
# Guards (same strings both engines): a singular design (constant
# clicks → DET = 0 exactly at test scale, and the restricted model IS
# the model) reports F = 0; a perfect unrestricted fit (SSE_u <= 0)
# reports the documented sentinel 999999 (infinitely significant).
_G_DEGEN = f"({_G_DET} = 0 OR {_G_S11_C} = 0)"
_G_B2_G = f"(CASE WHEN {_G_DEGEN} THEN 0.0 ELSE {_G_B2} END)"
_G_F = (
    f"(CASE WHEN {_G_DEGEN} THEN 0.0"
    f" WHEN {_G_SSE_U} <= 0 THEN 999999.0 ELSE {_G_F_RAW} END)"
)
_GRANGER_SELECT = [
    "CAST(n AS BIGINT) AS n_obs",
    f"ROUND({_G_B2_G}, 6) AS beta_clicks",
    f"ROUND({_G_F}, 6) AS f_stat",
    "CAST(n - 3 AS BIGINT) AS df2",
    f"({_G_F} > {GRANGER_F_CRIT_LADDER}) AS granger_5pct",
]


def q_granger_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger causality: do yesterday's clicks predict today's
    purchase revenue beyond what yesterday's revenue already does?

    Nested-model F test: the unrestricted SSE comes from the exact
    Cramer 3x3 normal-equation solve (the q_ols_two_feature device),
    the restricted SSE from the centered simple-regression identity —
    BOTH evaluated from the SAME ten DECIMAL(38,0) sufficient sums, so
    the whole test is one scalar aggregate over the O(days) grid. The
    two series align on the 0-filled spine (a dark day is a real 0).
    """
    grid = _rev_clicks_grid(spark, sf_dir)
    w = Window.partitionBy().orderBy("d")
    rows = grid.select(
        F.col("rev").alias("y"),
        F.lag("rev", 1).over(w).alias("x1"),
        F.lag("clk", 1).over(w).alias("x2"),
    ).filter(F.col("x1").isNotNull())
    d38 = "decimal(38,0)"

    def _s(expr, alias):
        return F.sum(expr).cast(d38).alias(alias)

    c = lambda name: F.col(name).cast(d38)  # noqa: E731
    suff = rows.agg(
        F.count(F.lit(1)).alias("n"),
        _s(c("x1"), "sx1"),
        _s(c("x2"), "sx2"),
        _s(c("y"), "sy"),
        _s(c("x1") * c("x1"), "s11"),
        _s(c("x2") * c("x2"), "s22"),
        _s(c("x1") * c("x2"), "s12"),
        _s(c("x1") * c("y"), "s1y"),
        _s(c("x2") * c("y"), "s2y"),
        _s(c("y") * c("y"), "syy"),
    )
    return suff.selectExpr(*_GRANGER_SELECT)


# --- Seasonal-naive backtest ---------------------------------------
_BT_SELECT = [
    "CAST(n AS BIGINT) AS n_forecasts",
    f"ROUND({_d('sae')} / {_d('n')} / 100, 4) AS mae_dollars",
    f"ROUND(SQRT({_d('sse')} / {_d('n')}) / 100, 4) AS rmse_dollars",
    f"ROUND({_d('ssm')} / {_d('n')} / 10000, 4) AS smape_pct",
    f"ROUND(({_d('sae')} / {_d('n')})"
    f" / ({_d('sn1')} / {_d('n1')}), 6) AS mase",
]


def q_backtest_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest on daily purchase revenue:
    predict each day with the value one week earlier, score MAE /
    RMSE / sMAPE / MASE — the baseline scoreboard any real forecast
    must beat (Hyndman & Koehler 2006 for MASE's scaling).

    Errors are exact integer cents; the one rational per-row term
    (the sMAPE ratio) is micro-quantized with the same floor(+0.5)
    expression in both engines BEFORE the order-independent sum.
    MASE scales by the in-sample naive-1 MAE over the whole series.
    All windows run on the O(days) grid.
    """
    grid = _rev_clicks_grid(spark, sf_dir)
    w = Window.partitionBy().orderBy("d")
    scored = grid.select(
        F.col("rev").alias("y"),
        F.lag("rev", SEASONAL_PERIOD).over(w).alias("yhat"),
        F.lag("rev", 1).over(w).alias("yprev"),
    )
    d38 = "decimal(38,0)"
    err = scored.selectExpr(
        "y",
        "yhat",
        "yprev",
        "ABS(y - yhat) AS ae",
        # sMAPE term in micro-percent-points-of-2: 2e6*|e|/(|y|+|yhat|),
        # 0 when both sides are 0 (a perfect forecast of a dark day).
        "CASE WHEN yhat IS NULL THEN NULL"
        " WHEN ABS(y) + ABS(yhat) = 0 THEN 0"
        " ELSE CAST(floor(2000000.0 * ABS(y - yhat)"
        " / (ABS(y) + ABS(yhat)) + 0.5) AS BIGINT) END AS sm",
    )
    suff = err.agg(
        F.count("yhat").alias("n"),
        F.sum(F.when(F.col("yhat").isNotNull(), F.col("ae"))).cast(d38).alias("sae"),
        F.sum(
            F.when(
                F.col("yhat").isNotNull(),
                F.col("ae").cast(d38) * F.col("ae").cast(d38),
            )
        ).alias("sse"),
        F.sum("sm").cast(d38).alias("ssm"),
        F.count("yprev").alias("n1"),
        F.sum(F.when(F.col("yprev").isNotNull(), F.abs(F.col("y") - F.col("yprev"))))
        .cast(d38)
        .alias("sn1"),
    )
    return suff.selectExpr(*_BT_SELECT)


def q_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between daily purchase revenue and
    daily click count at lags -3..+3: at what offset do the two
    series co-move? — the lead-lag screen run before any transfer-
    function or ad-effect model.

    One generator (stack) turns the 7 lag columns into (lag_k, pair)
    rows over the O(days) grid, then a 7-group exact-Pearson
    aggregate: every group's six sums are DECIMAL(38,0) integers, the
    correlation is one shared double chain. ccf(k) pairs today's
    revenue with clicks k days EARLIER (k<0 = clicks later).
    """
    grid = _rev_clicks_grid(spark, sf_dir)
    w = Window.partitionBy().orderBy("d")
    lag_cols = []
    stack_args = []
    for k in range(-CCF_MAX_LAG, CCF_MAX_LAG + 1):
        name = f"c_{'m' if k < 0 else 'p'}{abs(k)}"
        col = (
            F.lag("clk", k).over(w) if k >= 0 else F.lead("clk", -k).over(w)
        )
        lag_cols.append(col.alias(name))
        stack_args.append(f"{k}, {name}")
    lagged = grid.select(F.col("rev").alias("a"), *lag_cols)
    pairs = lagged.selectExpr(
        "a", f"stack(7, {', '.join(stack_args)}) AS (lag_k, b)"
    ).filter(F.col("b").isNotNull())
    d38 = "decimal(38,0)"
    agg = pairs.groupBy("lag_k").agg(
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
    # a constant series in either window has no correlation to report
    # (NULL, same CASE in the oracle) — not an ANSI divide-by-zero
    ccf = F.when(
        var_a * var_b > 0, F.round(num / F.sqrt(var_a * var_b), 6)
    )
    return agg.select(
        F.col("lag_k").cast("int").alias("lag_k"),
        F.col("n").cast("bigint").alias("n_pairs"),
        ccf.alias("ccf"),
    )


# --- CUPED ---------------------------------------------------------
_CUPED_SXX_C = f"({_d('sxx')} - {_d('sx')} * {_d('sx')} / {_d('n')})"
_CUPED_SXY_C = f"({_d('sxy')} - {_d('sx')} * {_d('sy')} / {_d('n')})"
_CUPED_SYY_C = f"({_d('syy')} - {_d('sy')} * {_d('sy')} / {_d('n')})"
_CUPED_DEGEN = f"({_CUPED_SXX_C} <= 0 OR {_CUPED_SYY_C} <= 0)"
_CUPED_THETA = (
    f"(CASE WHEN {_CUPED_DEGEN} THEN 0.0"
    f" ELSE {_CUPED_SXY_C} / {_CUPED_SXX_C} END)"
)
_CUPED_RHO2 = (
    f"(CASE WHEN {_CUPED_DEGEN} THEN 0.0"
    f" ELSE {_CUPED_SXY_C} * {_CUPED_SXY_C}"
    f" / ({_CUPED_SXX_C} * {_CUPED_SYY_C}) END)"
)
_CUPED_SELECT = [
    "CAST(n AS BIGINT) AS n_users",
    f"ROUND({_CUPED_THETA}, 6) AS theta",
    f"ROUND(CASE WHEN {_CUPED_SXY_C} < 0 THEN -SQRT({_CUPED_RHO2})"
    f" ELSE SQRT({_CUPED_RHO2}) END, 6) AS corr_pre_post",
    f"ROUND(100 * {_CUPED_RHO2}, 4) AS var_reduction_pct",
]


def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Deng et al. 2013): how much experiment variance does a
    pre-period covariate remove? theta = cov(X,Y)/var(X) and the
    variance-reduction ratio rho^2 — the number that decides whether
    an A/B program can halve its runtimes.

    X = each user's first-half purchase revenue, Y = second-half
    (split at the midpoint of the observed span, computed from a
    1-row bounds aggregate — no literals). The stream collapses to an
    O(users) conditional-sum rollup, then ONE scalar aggregate of six
    exact cents sums; theta and rho^2 are shared double chains.
    """
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    bounds = events.groupBy().agg(
        F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
    )
    with_split = events.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        (F.col("value")),
        (
            F.datediff(F.to_date("ts"), F.col("lo"))
            < (F.datediff("hi", "lo") + 1) / 2
        ).alias("is_pre"),
    )
    per_user = with_split.groupBy("user_id").agg(
        F.coalesce(
            (F.sum(F.when(F.col("is_pre"), dec2("value"))) * 100).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("x"),
        F.coalesce(
            (F.sum(F.when(~F.col("is_pre"), dec2("value"))) * 100).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("y"),
    )
    d38 = "decimal(38,0)"
    suff = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x").cast(d38)).alias("sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y").cast(d38)).alias("sxy"),
        F.sum(F.col("y").cast(d38) * F.col("y").cast(d38)).alias("syy"),
    )
    return suff.selectExpr(*_CUPED_SELECT)


# --- Benjamini-Hochberg FDR panel ----------------------------------
# Welch z for weekend-vs-weekday mean value per event type; |z| ranks
# feed the BH step-up rule against the literal z ladder.
_Z_VW = (
    f"(({_d('ssw')} - {_d('sw')} * {_d('sw')} / {_d('nw')})"
    f" / ({_d('nw')} - 1))"
)
_Z_VD = (
    f"(({_d('ssd')} - {_d('sd_')} * {_d('sd_')} / {_d('nd')})"
    f" / ({_d('nd')} - 1))"
)
_Z_RAW = (
    f"(({_d('sw')} / {_d('nw')} - {_d('sd_')} / {_d('nd')})"
    f" / SQRT({_Z_VW} / {_d('nw')} + {_Z_VD} / {_d('nd')}))"
)
# zero variance in both arms (a constant panel cell) → z = 0, no claim.
# The singleton guard (nw/nd <= 1) must come FIRST: _Z_VW/_Z_VD divide by
# (n-1), and on a 1-row arm Spark evaluates x/0 to NULL while DuckDB gives
# IEEE inf/NaN — the only cross-engine divergence channel in this panel.
_Z_STAT = (
    f"(CASE WHEN {_d('nw')} <= 1 OR {_d('nd')} <= 1 THEN 0.0"
    f" WHEN {_Z_VW} / {_d('nw')} + {_Z_VD} / {_d('nd')} <= 0"
    f" THEN 0.0 ELSE {_Z_RAW} END)"
)


def q_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR panel: test weekend-vs-weekday mean
    value for EVERY event type at once and control the false-
    discovery rate across the K=5 simultaneous tests — the multiple-
    testing discipline a metrics platform applies to every scorecard.

    Because K is the (fixed, small) number of event types, the BH
    p-value thresholds alpha*i/K translate to a LITERAL two-sided
    z ladder, so no CDF is needed: rank the |z| statistics, compare
    rank i against ladder[i], and the step-up rule is one window max.
    The per-type Welch z comes from six exact cents sums; the facts
    are touched by ONE conditional-sum groupBy.
    """
    events = load_table(spark, sf_dir, "events")
    is_we = F.dayofweek("ts").isin(1, 7)
    c = (dec2("value") * 100).cast("long")
    d38 = "decimal(38,0)"
    per_type = events.select(
        "event_type", is_we.alias("we"), c.alias("c")
    ).groupBy("event_type").agg(
        F.sum(F.when(F.col("we"), 1).otherwise(0)).alias("nw"),
        F.sum(F.when(F.col("we"), F.col("c"))).cast(d38).alias("sw"),
        F.sum(F.when(F.col("we"), F.col("c").cast(d38) * F.col("c"))).alias("ssw"),
        F.sum(F.when(~F.col("we"), 1).otherwise(0)).alias("nd"),
        F.sum(F.when(~F.col("we"), F.col("c"))).cast(d38).alias("sd_"),
        F.sum(F.when(~F.col("we"), F.col("c").cast(d38) * F.col("c"))).alias("ssd"),
    )
    scored = per_type.selectExpr(
        "event_type",
        "CAST(nw AS BIGINT) AS n_weekend",
        "CAST(nd AS BIGINT) AS n_weekday",
        f"ROUND({_Z_STAT}, 6) AS z_stat",
        f"ABS(ROUND({_Z_STAT}, 6)) AS abs_z",
    )
    w_rank = Window.partitionBy().orderBy(
        F.col("abs_z").desc(), F.col("event_type")
    )
    ladder = " ".join(
        f"WHEN {i + 1} THEN {z}" for i, z in enumerate(BH_Z_LADDER)
    )
    ranked = scored.withColumn(
        "bh_rank", F.row_number().over(w_rank)
    ).selectExpr(
        "event_type",
        "n_weekend",
        "n_weekday",
        "z_stat",
        "abs_z",
        "bh_rank",
        f"(abs_z >= CASE bh_rank {ladder} ELSE {BH_Z_OVERFLOW} END) AS sig_at_rank",
    )
    w_all = Window.partitionBy()
    return (
        ranked.withColumn(
            "max_sig_rank",
            F.max(F.when(F.col("sig_at_rank"), F.col("bh_rank"))).over(w_all),
        )
        .selectExpr(
            "event_type",
            "n_weekend",
            "n_weekday",
            "z_stat",
            "CAST(bh_rank AS BIGINT) AS bh_rank",
            "(bh_rank <= COALESCE(max_sig_rank, 0)) AS discovery",
        )
    )


# --- Sample-ratio mismatch -----------------------------------------
# chi2(1) with a 50/50 expected split collapses to (na-nb)^2/(na+nb).
CHI2_1_CRIT_5PCT = "3.841459"
_SRM_CHI2 = (
    f"(({_d('na')} - {_d('nb')}) * ({_d('na')} - {_d('nb')})"
    f" / ({_d('na')} + {_d('nb')}))"
)
_SRM_SELECT = [
    "CAST(na AS BIGINT) AS n_arm_a",
    "CAST(nb AS BIGINT) AS n_arm_b",
    f"ROUND({_SRM_CHI2}, 6) AS chi2_stat",
    f"({_SRM_CHI2} > {CHI2_1_CRIT_5PCT}) AS srm_detected",
]


def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check: hash-split the distinct users
    50/50 (md5 parity — the same deterministic assignment
    sample_train_test_split uses) and chi-square the observed arm
    sizes against the expected even split — the guardrail every
    experiment platform runs before reading any metric.

    One distinct-user rollup, two conditional counts, a closed-form
    chi2(1) that collapses to (na-nb)²/(na+nb) under H0 — exact
    integers until the single double divide.
    """
    events = load_table(spark, sf_dir, "events")
    users = events.select("user_id").distinct()
    arm_a = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 2
        == 0
    )
    suff = users.agg(
        F.sum(F.when(arm_a, 1).otherwise(0)).alias("na"),
        F.sum(F.when(arm_a, 0).otherwise(1)).alias("nb"),
    )
    return suff.selectExpr(*_SRM_SELECT)


# --- Hurst exponent (rescaled range) -------------------------------
HURST_BLOCKS = [7, 14, 28]  # dyadic block ladder over the 30-day span
# R/S per block from exact integers: R = (max-min of m·cum_t − t·S_m),
# S·m = sqrt(m·ΣX² − S_m²); the ratio is ONE double divide. Degenerate
# (constant) blocks report 0.
_RS_EXPR = (
    "(CASE WHEN CAST(m AS DOUBLE) * CAST(ssm AS DOUBLE)"
    " - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) <= 0 THEN 0.0"
    " ELSE (CAST(dmax AS DOUBLE) - CAST(dmin AS DOUBLE))"
    " / SQRT(CAST(m AS DOUBLE) * CAST(ssm AS DOUBLE)"
    " - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)) END)"
)


def q_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range analysis on daily purchase
    revenue: is the series trending (H>0.5), random (≈0.5), or
    mean-reverting (H<0.5)? — the long-memory diagnostic run beside
    the DF test.

    The classical R/S is made exact by scaling through the block
    length m: cumulative deviations m·cum_t − t·S_m are BIGINTs, and
    R/S = (max−min of those) / sqrt(m·ΣX² − S_m²) — integers under
    the sqrt, ONE double divide per block. Per-block ratios micro-
    quantize before the per-m average (order-independent), and H is
    the endpoint log2 slope over the dyadic ladder with each
    transcendental ROUND(…,6)-quantized (the house log discipline).
    All windows run on O(days × 3) stacked grid rows.
    """
    grid = _rev_clicks_grid(spark, sf_dir)
    w_rn = Window.partitionBy().orderBy("d")
    base = grid.select(
        F.col("rev").alias("x"), (F.row_number().over(w_rn) - 1).alias("t")
    )
    stack_args = ", ".join(f"{m}, {m}" for m in HURST_BLOCKS)
    tall = base.selectExpr("x", "t", f"stack(3, {stack_args}) AS (m, m2)").select(
        "x", "t", "m",
        F.floor(F.col("t") / F.col("m")).alias("blk"),
        (F.col("t") % F.col("m")).alias("pos"),
    )
    # drop ragged tail blocks (incomplete m-day windows)
    w_blk_n = Window.partitionBy("m", "blk")
    tall = tall.withColumn("bn", F.count(F.lit(1)).over(w_blk_n)).filter(
        F.col("bn") == F.col("m")
    )
    w_cum = (
        Window.partitionBy("m", "blk")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d38 = "decimal(38,0)"
    cum = tall.select(
        "m",
        "blk",
        "pos",
        "x",
        F.sum("x").over(w_cum).cast(d38).alias("cum"),
    )
    # R needs the block total BEFORE the max/min over cumdevs — do it
    # relationally: join the per-block total back onto the cum rows
    # (broadcast: O(days) rows), then one agg for max/min.
    totals = cum.groupBy("m", "blk").agg(
        F.sum("x").cast(d38).alias("sm"),
        F.sum(F.col("x").cast(d38) * F.col("x").cast(d38)).alias("ssm"),
    )
    devs = cum.join(F.broadcast(totals), ["m", "blk"]).select(
        "m",
        "blk",
        "sm",
        "ssm",
        (
            F.col("m").cast(d38) * F.col("cum")
            - (F.col("pos") + 1).cast(d38) * F.col("sm")
        ).alias("dev"),
    )
    blk_stats = devs.groupBy("m", "blk").agg(
        F.min("sm").alias("sm"),
        F.min("ssm").alias("ssm"),
        F.max("dev").alias("dmax"),
        F.min("dev").alias("dmin"),
    )
    per_m = blk_stats.selectExpr(
        "m",
        f"CAST(floor(1000000.0 * {_RS_EXPR} + 0.5) AS BIGINT) AS rs_micro",
    ).groupBy("m").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("rs_micro").alias("srs"),
    ).selectExpr(
        "m",
        "nb",
        "(CAST(srs AS DOUBLE) / CAST(nb AS DOUBLE) / 1000000.0) AS avg_rs",
    )
    lo, hi = HURST_BLOCKS[0], HURST_BLOCKS[-1]
    span = len(HURST_BLOCKS) - 1  # log2(hi/lo) for a dyadic ladder
    wide = per_m.groupBy().pivot("m", HURST_BLOCKS).agg(F.first("avg_rs"))
    # degenerate guard: an all-constant series has avg_rs = 0 at some
    # m and LOG2(0) is a hard error in DuckDB (NULL in Spark) — report
    # NULL H from BOTH engines instead of erroring the gate
    return wide.selectExpr(
        *[f"ROUND(`{m}`, 6) AS rs_{m}" for m in HURST_BLOCKS],
        f"(CASE WHEN `{hi}` <= 0 OR `{lo}` <= 0 THEN NULL"
        f" ELSE ROUND((ROUND(LOG2(`{hi}`), 6) - ROUND(LOG2(`{lo}`), 6))"
        f" / {span}, 6) END) AS hurst_exponent",
    )


# --- Return-series risk metrics ------------------------------------
# Daily simple return in micro-units: the one rational per-row term,
# quantized identically in both engines BEFORE any cross-row sum;
# NULL where the base day is 0 (no return is defined off a dark day).
_RET_MICRO = (
    "(CASE WHEN yprev IS NULL OR yprev = 0 THEN NULL"
    " ELSE CAST(floor(1000000.0 * (y - yprev) / yprev + 0.5) AS BIGINT)"
    " END)"
)
VAR_ALPHA_PCT = 5  # 95% historical VaR / CVaR

_SHARPE_MEAN = f"({_d('sr')} / {_d('n')})"
# sample variance from integer sums: (n·Σr² − (Σr)²) / (n·(n−1))
_SHARPE_SD = (
    f"SQRT(({_d('n')} * {_d('srr')} - {_d('sr')} * {_d('sr')})"
    f" / ({_d('n')} * ({_d('n')} - 1)))"
)
# downside deviation: sqrt(Σ min(r,0)² / n)
_SORTINO_DD = f"SQRT({_d('sdd')} / {_d('n')})"
_SHARPE_SELECT = [
    "CAST(n AS BIGINT) AS n_returns",
    f"ROUND({_SHARPE_MEAN} / 10000, 6) AS mean_return_pct",
    f"(CASE WHEN {_SHARPE_SD} <= 0 THEN NULL"
    f" ELSE ROUND({_SHARPE_MEAN} / {_SHARPE_SD}, 6) END) AS sharpe",
    f"(CASE WHEN {_SORTINO_DD} <= 0 THEN NULL"
    f" ELSE ROUND({_SHARPE_MEAN} / {_SORTINO_DD}, 6) END) AS sortino",
]


def q_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharpe and Sortino ratios of the daily revenue return series
    (risk-free rate 0, daily units): reward per unit of total
    vs downside-only volatility — the pair every portfolio / revenue
    health dashboard leads with.

    Returns quantize per-row to micro-units (the only rational term);
    mean, sample sd, and downside deviation then come from three
    exact integer sums and the closed-form chains are shared verbatim
    with the oracle. All windows on the O(days) grid.
    """
    grid = _rev_clicks_grid(spark, sf_dir)
    w = Window.partitionBy().orderBy("d")
    rets = grid.select(
        F.col("rev").alias("y"), F.lag("rev", 1).over(w).alias("yprev")
    ).selectExpr(f"{_RET_MICRO} AS r").filter(F.col("r").isNotNull())
    d38 = "decimal(38,0)"
    suff = rets.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").cast(d38).alias("sr"),
        F.sum(F.col("r").cast(d38) * F.col("r").cast(d38)).alias("srr"),
        F.sum(
            F.when(F.col("r") < 0, F.col("r").cast(d38) * F.col("r"))
            .otherwise(F.lit(0).cast(d38))
        ).alias("sdd"),
    )
    return suff.selectExpr(*_SHARPE_SELECT)


def q_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical 95% VaR and CVaR (expected shortfall) of the daily
    revenue return series: the loss threshold the worst 5% of days
    breach, and the average loss GIVEN a breach — the regulatory pair
    (Basel/FRTB) computed the way risk desks do it: by rank selection
    on the empirical distribution, no distributional assumption.

    Discrete quantile by explicit rank (the q_outlier_iqr device, not
    the engines' divergent percentile builtins): k = ceil(alpha·n)
    from a window count, VaR = −r_(k), CVaR = −mean of the k worst
    returns (exact integer sum / k). Returns are the same
    micro-quantized series as q_sharpe_sortino.
    """
    grid = _rev_clicks_grid(spark, sf_dir)
    w = Window.partitionBy().orderBy("d")
    rets = grid.select(
        F.col("rev").alias("y"), F.lag("rev", 1).over(w).alias("yprev")
    ).selectExpr(f"{_RET_MICRO} AS r").filter(F.col("r").isNotNull())
    w_rank = Window.partitionBy().orderBy("r")
    w_all = Window.partitionBy()
    ranked = rets.select(
        "r",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    ).withColumn(
        "k", F.ceil(F.col("n") * VAR_ALPHA_PCT / 100).cast("long")
    )
    d38 = "decimal(38,0)"
    suff = ranked.agg(
        F.min("n").alias("n"),
        F.min("k").alias("k"),
        F.min(F.when(F.col("rn") == F.col("k"), F.col("r"))).alias("rk"),
        F.sum(F.when(F.col("rn") <= F.col("k"), F.col("r")))
        .cast(d38)
        .alias("stail"),
    )
    return suff.selectExpr(
        "CAST(n AS BIGINT) AS n_returns",
        "CAST(k AS BIGINT) AS k_tail",
        f"ROUND(-{_d('rk')} / 10000, 6) AS var_95_pct",
        f"ROUND(-{_d('stail')} / {_d('k')} / 10000, 6) AS cvar_95_pct",
    )


# --- Seasonal strength ---------------------------------------------
# F_s = max(0, 1 − SSE_within / SST): how much of the daily variance
# the day-of-week profile explains (Hyndman's seasonal-strength
# statistic with the weekly profile as the seasonal component).
_SS_SST = f"({_d('syy')} - {_d('sy')} * {_d('sy')} / {_d('n')})"
_SS_STRENGTH = (
    f"(CASE WHEN {_SS_SST} <= 0 THEN 0.0"
    f" ELSE GREATEST(0.0, 1.0 - {_d('sse_w')} / {_SS_SST}) END)"
)
_SS_SELECT = [
    "CAST(n AS BIGINT) AS n_days",
    f"ROUND({_SS_STRENGTH}, 6) AS seasonal_strength",
    f"({_SS_STRENGTH} > 0.5) AS strongly_seasonal",
]


def q_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-strength statistic of daily purchase revenue: the
    share of day-to-day variance the weekly profile explains —
    the one number that decides whether a forecast needs a seasonal
    term (and whether q_backtest_seasonal_naive's t−7 baseline is
    even the right naive).

    SST comes from two exact global sums; the within-day-of-week SSE
    is Σ_g (Σy² − (Σy)²/n_g) whose per-group rational term unit-
    quantizes (floor + 0.5 on the cents² scale — relative error
    ≤ 1e-9 at any SF) before the order-independent cross-group sum,
    the Brown-Forsythe device. One groupBy over the O(days) grid.
    """
    grid = _rev_clicks_grid(spark, sf_dir)
    d38 = "decimal(38,0)"
    per_dow = grid.groupBy(F.dayofweek("d").alias("dow")).agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("rev").cast(d38).alias("sg"),
        F.sum(F.col("rev").cast(d38) * F.col("rev").cast(d38)).alias("ssg"),
    )
    scored = per_dow.selectExpr(
        "ng",
        "sg",
        "ssg",
        "CAST(floor(CAST(ssg AS DOUBLE)"
        " - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)"
        " / CAST(ng AS DOUBLE) + 0.5) AS DECIMAL(38,0)) AS sse_g",
    )
    suff = scored.agg(
        F.sum("ng").alias("n"),
        F.sum("sg").cast(d38).alias("sy"),
        F.sum("ssg").cast(d38).alias("syy"),
        F.sum("sse_g").cast(d38).alias("sse_w"),
    )
    return suff.selectExpr(*_SS_SELECT)


QUERIES = {
    "q_dickey_fuller": q_dickey_fuller,
    "q_granger_lag1": q_granger_lag1,
    "q_backtest_seasonal_naive": q_backtest_seasonal_naive,
    "q_cross_correlation": q_cross_correlation,
    "q_cuped_adjustment": q_cuped_adjustment,
    "q_fdr_bh": q_fdr_bh,
    "q_srm_check": q_srm_check,
    "q_hurst_rs": q_hurst_rs,
    "q_sharpe_sortino": q_sharpe_sortino,
    "q_var_cvar": q_var_cvar,
    "q_seasonality_strength": q_seasonality_strength,
}

_RETS_SQL = f"""
    rets AS (
      SELECT r FROM (
        SELECT {_RET_MICRO} AS r FROM (
          SELECT rev AS y, LAG(rev, 1) OVER (ORDER BY d) AS yprev FROM grid
        )
      ) WHERE r IS NOT NULL
    )
"""


def _hurst_oracle() -> str:
    lo, hi = HURST_BLOCKS[0], HURST_BLOCKS[-1]
    span = len(HURST_BLOCKS) - 1
    ms = ", ".join(str(m) for m in HURST_BLOCKS)
    rs_cols = ", ".join(
        f"ROUND(MAX(CASE WHEN m = {m} THEN avg_rs END), 6) AS rs_{m}"
        for m in HURST_BLOCKS
    )
    return f"""
    WITH {_GRID_SQL},
    base AS (
      SELECT rev AS x, ROW_NUMBER() OVER (ORDER BY d) - 1 AS t FROM grid
    ),
    tall AS (
      SELECT x, t, m,
             CAST(FLOOR(CAST(t AS DOUBLE) / m) AS BIGINT) AS blk,
             t % m AS pos
      FROM base, (SELECT unnest([{ms}]) AS m) ms
    ),
    sized AS (
      SELECT * FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY m, blk) AS bn FROM tall
      ) WHERE bn = m
    ),
    cum AS (
      SELECT m, blk, pos, x,
             CAST(SUM(x) OVER (PARTITION BY m, blk ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cum
      FROM sized
    ),
    totals AS (
      SELECT m, blk, CAST(SUM(x) AS HUGEINT) AS sm,
             SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS ssm
      FROM cum GROUP BY 1, 2
    ),
    devs AS (
      SELECT c.m, c.blk, t.sm, t.ssm,
             CAST(c.m AS HUGEINT) * c.cum
               - CAST(c.pos + 1 AS HUGEINT) * t.sm AS dev
      FROM cum c JOIN totals t USING (m, blk)
    ),
    blk_stats AS (
      SELECT m, blk, MIN(sm) AS sm, MIN(ssm) AS ssm,
             MAX(dev) AS dmax, MIN(dev) AS dmin
      FROM devs GROUP BY 1, 2
    ),
    per_m AS (
      SELECT m, COUNT(*) AS nb,
             SUM(CAST(floor(1000000.0 * {_RS_EXPR} + 0.5) AS BIGINT)) AS srs
      FROM blk_stats GROUP BY 1
    ),
    avgd AS (
      SELECT m, CAST(srs AS DOUBLE) / CAST(nb AS DOUBLE) / 1000000.0
               AS avg_rs
      FROM per_m
    ),
    wide AS (
      SELECT {rs_cols},
             MAX(CASE WHEN m = {hi} THEN avg_rs END) AS r_hi,
             MAX(CASE WHEN m = {lo} THEN avg_rs END) AS r_lo
      FROM avgd
    )
    SELECT {", ".join(f"rs_{m}" for m in HURST_BLOCKS)},
           (CASE WHEN r_hi <= 0 OR r_lo <= 0 THEN NULL
            ELSE ROUND((ROUND(LOG2(r_hi), 6) - ROUND(LOG2(r_lo), 6))
                 / {span}, 6) END) AS hurst_exponent
    FROM wide
    """


def _ccf_oracle() -> str:
    branches = []
    for k in range(-CCF_MAX_LAG, CCF_MAX_LAG + 1):
        if k > 0:
            expr = f"LAG(clk, {k}) OVER (ORDER BY d)"
        elif k < 0:
            expr = f"LEAD(clk, {-k}) OVER (ORDER BY d)"
        else:
            expr = "clk"
        branches.append(f"SELECT {k} AS lag_k, rev AS a, {expr} AS b FROM grid")
    union = "\n      UNION ALL\n      ".join(branches)
    return f"""
    WITH {_GRID_SQL},
    pairs AS (
      SELECT * FROM (
      {union}
      ) WHERE b IS NOT NULL
    ),
    agg AS (
      SELECT lag_k,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(a) AS HUGEINT) AS sa,
             CAST(SUM(b) AS HUGEINT) AS sb,
             SUM(CAST(a AS HUGEINT) * CAST(a AS HUGEINT)) AS saa,
             SUM(CAST(b AS HUGEINT) * CAST(b AS HUGEINT)) AS sbb,
             SUM(CAST(a AS HUGEINT) * CAST(b AS HUGEINT)) AS sab
      FROM pairs GROUP BY 1
    )
    SELECT CAST(lag_k AS INT) AS lag_k,
           CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN CAST(n * saa - sa * sa AS DOUBLE)
                     * CAST(n * sbb - sb * sb AS DOUBLE) > 0
                THEN ROUND(CAST(n * sab - sa * sb AS DOUBLE)
                     / SQRT(CAST(n * saa - sa * sa AS DOUBLE)
                            * CAST(n * sbb - sb * sb AS DOUBLE)), 6)
           END AS ccf
    FROM agg
    """


def _fdr_oracle() -> str:
    ladder = " ".join(
        f"WHEN {i + 1} THEN {z}" for i, z in enumerate(BH_Z_LADDER)
    )
    return f"""
    WITH per_type AS (
      SELECT event_type,
             SUM(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END) AS nw,
             CAST(SUM(CASE WHEN dayofweek(ts) IN (0, 6)
                      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      END) AS HUGEINT) AS sw,
             SUM(CASE WHEN dayofweek(ts) IN (0, 6)
                 THEN CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      AS HUGEINT)
                      * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                 END) AS ssw,
             SUM(CASE WHEN dayofweek(ts) NOT IN (0, 6) THEN 1 ELSE 0 END)
               AS nd,
             CAST(SUM(CASE WHEN dayofweek(ts) NOT IN (0, 6)
                      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      END) AS HUGEINT) AS sd_,
             SUM(CASE WHEN dayofweek(ts) NOT IN (0, 6)
                 THEN CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      AS HUGEINT)
                      * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                 END) AS ssd
      FROM events GROUP BY 1
    ),
    scored AS (
      SELECT event_type,
             CAST(nw AS BIGINT) AS n_weekend,
             CAST(nd AS BIGINT) AS n_weekday,
             ROUND({_Z_STAT}, 6) AS z_stat,
             ABS(ROUND({_Z_STAT}, 6)) AS abs_z
      FROM per_type
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY abs_z DESC, event_type) AS bh_rank
      FROM scored
    ),
    sig AS (
      SELECT *,
             (abs_z >= CASE bh_rank {ladder} ELSE {BH_Z_OVERFLOW} END) AS sig_at_rank
      FROM ranked
    )
    SELECT event_type, n_weekend, n_weekday, z_stat,
           CAST(bh_rank AS BIGINT) AS bh_rank,
           (bh_rank <= COALESCE(MAX(CASE WHEN sig_at_rank THEN bh_rank END)
                                OVER (), 0)) AS discovery
    FROM sig
    """


ORACLES = {
    "q_dickey_fuller": f"""
    WITH {_GRID_SQL},
    pairs AS (
      SELECT LAG(rev, 1) OVER (ORDER BY d) AS x,
             rev - LAG(rev, 1) OVER (ORDER BY d) AS y
      FROM grid
    ),
    suff AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
             SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
      FROM pairs WHERE x IS NOT NULL
    )
    SELECT {", ".join(_DF_SELECT)} FROM suff
    """,
    "q_granger_lag1": f"""
    WITH {_GRID_SQL},
    rows_ AS (
      SELECT rev AS y,
             LAG(rev, 1) OVER (ORDER BY d) AS x1,
             LAG(clk, 1) OVER (ORDER BY d) AS x2
      FROM grid
    ),
    suff AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x1) AS HUGEINT) AS sx1,
             CAST(SUM(x2) AS HUGEINT) AS sx2,
             CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x1 AS HUGEINT) * CAST(x1 AS HUGEINT)) AS s11,
             SUM(CAST(x2 AS HUGEINT) * CAST(x2 AS HUGEINT)) AS s22,
             SUM(CAST(x1 AS HUGEINT) * CAST(x2 AS HUGEINT)) AS s12,
             SUM(CAST(x1 AS HUGEINT) * CAST(y AS HUGEINT)) AS s1y,
             SUM(CAST(x2 AS HUGEINT) * CAST(y AS HUGEINT)) AS s2y,
             SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
      FROM rows_ WHERE x1 IS NOT NULL
    )
    SELECT {", ".join(_GRANGER_SELECT)} FROM suff
    """,
    "q_backtest_seasonal_naive": f"""
    WITH {_GRID_SQL},
    scored AS (
      SELECT rev AS y,
             LAG(rev, {SEASONAL_PERIOD}) OVER (ORDER BY d) AS yhat,
             LAG(rev, 1) OVER (ORDER BY d) AS yprev
      FROM grid
    ),
    err AS (
      SELECT y, yhat, yprev,
             ABS(y - yhat) AS ae,
             CASE WHEN yhat IS NULL THEN NULL
                  WHEN ABS(y) + ABS(yhat) = 0 THEN 0
                  ELSE CAST(floor(2000000.0 * ABS(y - yhat)
                       / (ABS(y) + ABS(yhat)) + 0.5) AS BIGINT) END AS sm
      FROM scored
    ),
    suff AS (
      SELECT COUNT(yhat) AS n,
             CAST(SUM(CASE WHEN yhat IS NOT NULL THEN ae END) AS HUGEINT)
               AS sae,
             SUM(CASE WHEN yhat IS NOT NULL
                 THEN CAST(ae AS HUGEINT) * CAST(ae AS HUGEINT) END) AS sse,
             CAST(SUM(sm) AS HUGEINT) AS ssm,
             COUNT(yprev) AS n1,
             CAST(SUM(CASE WHEN yprev IS NOT NULL THEN ABS(y - yprev) END)
                  AS HUGEINT) AS sn1
      FROM err
    )
    SELECT {", ".join(_BT_SELECT)} FROM suff
    """,
    "q_cross_correlation": _ccf_oracle(),
    "q_srm_check": f"""
    WITH users AS (SELECT DISTINCT user_id FROM events),
    suff AS (
      SELECT SUM(CASE WHEN CAST('0x' ||
                   substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
                   % 2 = 0 THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN CAST('0x' ||
                   substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
                   % 2 = 0 THEN 0 ELSE 1 END) AS nb
      FROM users
    )
    SELECT {", ".join(_SRM_SELECT)} FROM suff
    """,
    "q_hurst_rs": _hurst_oracle(),
    "q_seasonality_strength": f"""
    WITH {_GRID_SQL},
    per_dow AS (
      SELECT dayofweek(d) + 1 AS dow,
             COUNT(*) AS ng,
             CAST(SUM(rev) AS HUGEINT) AS sg,
             SUM(CAST(rev AS HUGEINT) * CAST(rev AS HUGEINT)) AS ssg
      FROM grid GROUP BY 1
    ),
    scored AS (
      SELECT ng, sg, ssg,
             CAST(floor(CAST(ssg AS DOUBLE)
                  - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                  / CAST(ng AS DOUBLE) + 0.5) AS HUGEINT) AS sse_g
      FROM per_dow
    ),
    suff AS (
      SELECT SUM(ng) AS n,
             CAST(SUM(sg) AS HUGEINT) AS sy,
             CAST(SUM(ssg) AS HUGEINT) AS syy,
             CAST(SUM(sse_g) AS HUGEINT) AS sse_w
      FROM scored
    )
    SELECT {", ".join(_SS_SELECT)} FROM suff
    """,
    "q_sharpe_sortino": f"""
    WITH {_GRID_SQL},
    {_RETS_SQL},
    suff AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(r) AS HUGEINT) AS sr,
             SUM(CAST(r AS HUGEINT) * CAST(r AS HUGEINT)) AS srr,
             SUM(CASE WHEN r < 0 THEN CAST(r AS HUGEINT) * CAST(r AS HUGEINT)
                 ELSE 0 END) AS sdd
      FROM rets
    )
    SELECT {", ".join(_SHARPE_SELECT)} FROM suff
    """,
    "q_var_cvar": f"""
    WITH {_GRID_SQL},
    {_RETS_SQL},
    ranked AS (
      SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn,
             COUNT(*) OVER () AS n,
             CAST(CEIL(COUNT(*) OVER () * {VAR_ALPHA_PCT} / 100.0) AS BIGINT)
               AS k
      FROM rets
    ),
    suff AS (
      SELECT MIN(n) AS n, MIN(k) AS k,
             MIN(CASE WHEN rn = k THEN r END) AS rk,
             CAST(SUM(CASE WHEN rn <= k THEN r END) AS HUGEINT) AS stail
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_returns,
           CAST(k AS BIGINT) AS k_tail,
           ROUND(-CAST(rk AS DOUBLE) / 10000, 6) AS var_95_pct,
           ROUND(-CAST(stail AS DOUBLE) / CAST(k AS DOUBLE) / 10000, 6)
             AS cvar_95_pct
    FROM suff
    """,
    "q_cuped_adjustment": f"""
    WITH bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
      FROM events WHERE event_type = 'purchase'
    ),
    per_user AS (
      SELECT user_id,
             COALESCE(CAST(SUM(CASE WHEN date_diff('day', b.lo,
                                         CAST(ts AS DATE))
                               < (date_diff('day', b.lo, b.hi) + 1) / 2.0
                          THEN CAST(value AS DECIMAL(18,2)) END) * 100
                     AS BIGINT), 0) AS x,
             COALESCE(CAST(SUM(CASE WHEN NOT (date_diff('day', b.lo,
                                                   CAST(ts AS DATE))
                               < (date_diff('day', b.lo, b.hi) + 1) / 2.0)
                          THEN CAST(value AS DECIMAL(18,2)) END) * 100
                     AS BIGINT), 0) AS y
      FROM events, bounds b WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    suff AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
             SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
      FROM per_user
    )
    SELECT {", ".join(_CUPED_SELECT)} FROM suff
    """,
    "q_fdr_bh": _fdr_oracle(),
}
