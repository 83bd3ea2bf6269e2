"""Property tests for the forecast/experimentation family
(operators/forecast.py), on ADVERSARIAL synthetic corpora written as
contract-shaped events parquet into tmp_path (the same policy as
tests/test_r08_properties.py): planted signals the random driver
corpus never produces — a perfectly periodic series, an exact one-day
lead, a proportional pre/post covariate, a single lifted panel cell —
plus pure-python sufficient-statistic replays on seeded random data.
"""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F

from etl_city_directories_spark.operators.forecast import (
    SEASONAL_PERIOD,
    q_backtest_seasonal_naive,
    q_cross_correlation,
    q_cuped_adjustment,
    q_dickey_fuller,
    q_fdr_bh,
    q_granger_lag1,
)

_COLS = ["event_id", "ts_s", "user_id", "event_type", "value", "props"]


def _write(spark, tmpdir, rows) -> str:
    df = spark.createDataFrame(rows, _COLS).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/events.parquet")
    return str(tmpdir)


def _series_rows(days):
    """days: list of (rev_cents, n_clicks) per calendar day of Jan 2024.
    One purchase event carries the day's revenue; clicks are unit rows."""
    rows, eid = [], 0
    for i, (cents, clicks) in enumerate(days):
        ts = f"2024-01-{i + 1:02d} 12:00:00"
        rows.append((eid, ts, 1, "purchase", cents / 100.0, "{}"))
        eid += 1
        for _ in range(clicks):
            rows.append((eid, ts, 2, "click", 0.0, "{}"))
            eid += 1
    return rows


def test_dickey_fuller_replay_and_flag_on_mean_reverting_series(
    spark, tmp_path
):
    """An alternating (strongly mean-reverting) series must reject the
    unit root, and rho/t must equal the pure-python OLS replay."""
    rng = random.Random(7)
    cents = [
        (10000 if i % 2 == 0 else 30000) + rng.randrange(100)
        for i in range(28)
    ]
    sf = _write(spark, tmp_path, _series_rows([(c, 0) for c in cents]))
    row = q_dickey_fuller(spark, sf).collect()[0]
    x = cents[:-1]
    y = [b - a for a, b in zip(cents, cents[1:])]
    n = len(x)
    sx, sy = sum(x), sum(y)
    sxx = sum(v * v for v in x)
    sxy = sum(a * b for a, b in zip(x, y))
    syy = sum(v * v for v in y)
    rho = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    sxx_c = sxx - sx * sx / n
    sse = (syy - sy * sy / n) - (sxy - sx * sy / n) ** 2 / sxx_c
    t = rho / math.sqrt((sse / (n - 2)) / sxx_c)
    assert row.n_obs == n
    assert abs(row.rho_hat - rho) < 1e-5
    assert abs(row.t_stat - t) < 1e-5
    assert t < -2.86 and not row.nonstationary_5pct


def test_dickey_fuller_keeps_unit_root_on_random_walk(spark, tmp_path):
    """A driftless random walk (cumulative seeded steps) must FAIL to
    reject: t is far from the rejection region."""
    rng = random.Random(11)
    cents, level = [], 500000
    for _ in range(30):
        level += rng.randrange(-500, 501)
        cents.append(level)
    sf = _write(spark, tmp_path, _series_rows([(c, 0) for c in cents]))
    row = q_dickey_fuller(spark, sf).collect()[0]
    assert row.nonstationary_5pct


def test_granger_detects_planted_one_day_lead(spark, tmp_path):
    """rev_t built EXACTLY from yesterday's clicks (plus a seeded
    residual orthogonal to yesterday's revenue) must flag causality;
    beta_clicks recovers the planted coefficient."""
    rng = random.Random(3)
    clicks = [rng.randrange(1, 40) for _ in range(30)]
    cents = [10000]
    for t in range(1, 30):
        cents.append(1000 * clicks[t - 1] + rng.randrange(200))
    sf = _write(
        spark, tmp_path, _series_rows(list(zip(cents, clicks)))
    )
    row = q_granger_lag1(spark, sf).collect()[0]
    assert row.granger_5pct
    assert abs(row.beta_clicks - 1000) < 50


def test_granger_ignores_constant_clicks(spark, tmp_path):
    """With clicks constant every day, the unrestricted model gains
    nothing: the x2 column is collinear with the intercept, SSE_r ==
    SSE_u up to float noise, so F ~ 0 and no flag."""
    rng = random.Random(5)
    cents = [20000 + rng.randrange(5000) for _ in range(30)]
    sf = _write(spark, tmp_path, _series_rows([(c, 7) for c in cents]))
    row = q_granger_lag1(spark, sf).collect()[0]
    assert not row.granger_5pct


def test_seasonal_naive_is_perfect_on_periodic_series(spark, tmp_path):
    """A series with exact period SEASONAL_PERIOD has zero error on
    every scored day: MAE = RMSE = sMAPE = MASE = 0 (the naive-1
    scaling denominator is nonzero because the pattern moves)."""
    pattern = [11000, 5000, 8000, 20000, 3000, 15000, 9000]
    assert len(pattern) == SEASONAL_PERIOD
    cents = [pattern[i % SEASONAL_PERIOD] for i in range(28)]
    sf = _write(spark, tmp_path, _series_rows([(c, 0) for c in cents]))
    row = q_backtest_seasonal_naive(spark, sf).collect()[0]
    assert row.n_forecasts == 28 - SEASONAL_PERIOD
    assert row.mae_dollars == 0.0
    assert row.rmse_dollars == 0.0
    assert row.smape_pct == 0.0
    assert row.mase == 0.0


def test_seasonal_naive_replay_on_random_series(spark, tmp_path):
    """MAE/RMSE/MASE replayed in pure python on a seeded series."""
    rng = random.Random(13)
    cents = [rng.randrange(1000, 50000) for _ in range(30)]
    sf = _write(spark, tmp_path, _series_rows([(c, 0) for c in cents]))
    row = q_backtest_seasonal_naive(spark, sf).collect()[0]
    errs = [
        abs(cents[i] - cents[i - SEASONAL_PERIOD])
        for i in range(SEASONAL_PERIOD, 30)
    ]
    n = len(errs)
    mae = sum(errs) / n
    rmse = math.sqrt(sum(e * e for e in errs) / n)
    d1 = [abs(b - a) for a, b in zip(cents, cents[1:])]
    mase = mae / (sum(d1) / len(d1))
    assert row.n_forecasts == n
    assert abs(row.mae_dollars - mae / 100) < 1e-3
    assert abs(row.rmse_dollars - rmse / 100) < 1e-3
    assert abs(row.mase - mase) < 1e-5


def test_ccf_peaks_at_planted_lag(spark, tmp_path):
    """rev_t = affine(clk_{t-2}) exactly → ccf(+2) = 1.0 and every
    other lag stays strictly below it."""
    rng = random.Random(17)
    clicks = [rng.randrange(1, 50) for _ in range(30)]
    cents = [
        500 * clicks[t - 2] + 7000 if t >= 2 else 9000 for t in range(30)
    ]
    sf = _write(
        spark, tmp_path, _series_rows(list(zip(cents, clicks)))
    )
    rows = {r.lag_k: r for r in q_cross_correlation(spark, sf).collect()}
    assert set(rows) == {-3, -2, -1, 0, 1, 2, 3}
    # pairs at lag 2 include the two boundary days where rev was the
    # constant 9000 — drop nothing: the affine link still dominates.
    assert rows[2].ccf == max(r.ccf for r in rows.values())
    assert rows[2].ccf > 0.9


def test_cuped_full_reduction_on_proportional_covariate(spark, tmp_path):
    """Y exactly proportional to X per user → corr 1, 100% variance
    reduction, theta equal to the planted slope."""
    rows, eid = [], 0
    for u in range(40):
        x_cents = 1000 + 137 * u
        # pre-period day 3, post-period day 27 (span 1..30 splits at 15)
        rows.append((eid, "2024-01-03 10:00:00", u, "purchase",
                     x_cents / 100.0, "{}"))
        eid += 1
        rows.append((eid, "2024-01-27 10:00:00", u, "purchase",
                     3 * x_cents / 100.0, "{}"))
        eid += 1
    # pin the observed span to the full month
    rows.append((eid, "2024-01-01 00:30:00", 999, "purchase", 1.0, "{}"))
    rows.append((eid + 1, "2024-01-30 23:30:00", 998, "purchase", 1.0, "{}"))
    sf = _write(spark, tmp_path, rows)
    row = q_cuped_adjustment(spark, sf).collect()[0]
    assert row.n_users == 42
    # the two span-pinning users perturb exact proportionality only
    # slightly at the panel edges
    assert row.corr_pre_post > 0.99
    assert row.var_reduction_pct > 98.0


def test_fdr_bh_flags_only_the_lifted_type(spark, tmp_path):
    """Four null panels plus ONE type with a big weekend lift: BH must
    discover exactly that type, at rank 1."""
    rng = random.Random(23)
    rows, eid = [], 0
    for day in range(1, 29):
        ts = f"2024-01-{day:02d} 09:00:00"
        weekend = day % 7 in (6, 0)  # Jan 2024: 6,7,13,14,... are Sat/Sun
        for etype in ["alpha", "beta", "gamma", "delta"]:
            for _ in range(6):
                rows.append((eid, ts, 1, etype,
                             5.0 + rng.random(), "{}"))
                eid += 1
        lifted = 50.0 if weekend else 5.0
        for _ in range(6):
            rows.append((eid, ts, 1, "lifted",
                         lifted + rng.random(), "{}"))
            eid += 1
    sf = _write(spark, tmp_path, rows)
    out = {r.event_type: r for r in q_fdr_bh(spark, sf).collect()}
    assert out["lifted"].discovery and out["lifted"].bh_rank == 1
    assert not any(
        out[t].discovery for t in ["alpha", "beta", "gamma", "delta"]
    )


def test_fdr_bh_discoveries_form_rank_prefix(spark, sf_dir):
    """On the driver corpus, whatever BH decides, the discovery set is
    a prefix of the |z| ranking — the step-up rule's invariant."""
    rows = sorted(q_fdr_bh(spark, sf_dir).collect(), key=lambda r: r.bh_rank)
    flags = [r.discovery for r in rows]
    assert flags == sorted(flags, reverse=True)
