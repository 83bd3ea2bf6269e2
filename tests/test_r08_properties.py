"""Property tests for the r08 operator batch, on ADVERSARIAL synthetic
corpora (not the driver testdata): each test writes a tiny events
parquet shaped like the contract tables into tmp_path and drives the
real operator through load_table — monotone / alternating / constant
series exercise the closed-form edges the random corpus never hits.

Same batching policy as the other property files: one seeded frame,
whole-batch evaluation, pure-python reference replays.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from etl_city_directories_spark.operators.stats import q_runs_test
from etl_city_directories_spark.operators.windows import (
    DONCHIAN_DAYS,
    RSI_DAYS,
    WMA_DAYS,
    q_donchian_channel,
    q_drawdown,
    q_rsi_sma,
    q_weighted_moving_avg,
)


def _write_daily_events(spark, tmpdir: str, cents: list[int]) -> str:
    """One purchase event per day with the given cent values — the
    minimal corpus every daily-grid operator reads."""
    rows = [
        (
            i,
            f"2024-01-{i + 1:02d} 12:00:00",
            1,
            "purchase",
            c / 100.0,
            '{"k": 1}',
        )
        for i, c in enumerate(cents)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts_s", "user_id", "event_type", "value", "props"]
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/events.parquet")
    return str(tmpdir)


def test_rsi_pegs_at_extremes_on_monotone_series(spark, tmp_path):
    """A strictly rising series has zero losses → RSI 100 everywhere;
    strictly falling → RSI 0."""
    up = [1000 + 10 * i for i in range(RSI_DAYS + 6)]
    sf = _write_daily_events(spark, tmp_path / "up", up)
    for r in q_rsi_sma(spark, sf).collect():
        assert r.rsi_14 == 100.0
    down = [5000 - 10 * i for i in range(RSI_DAYS + 6)]
    sf = _write_daily_events(spark, tmp_path / "down", down)
    for r in q_rsi_sma(spark, sf).collect():
        assert r.rsi_14 == 0.0


def test_rsi_is_50_on_flat_series(spark, tmp_path):
    """A constant series has gains = losses = 0 → the defined 50.0."""
    sf = _write_daily_events(spark, tmp_path, [1234] * (RSI_DAYS + 4))
    rows = q_rsi_sma(spark, sf).collect()
    assert rows
    for r in rows:
        assert r.rsi_14 == 50.0


def test_wma_replay_on_random_series(spark, tmp_path):
    """WMA equals the explicit weighted mean on a seeded random
    series, for every emitted day."""
    rng = random.Random(42)
    cents = [rng.randrange(100, 100_000) for _ in range(WMA_DAYS + 15)]
    sf = _write_daily_events(spark, tmp_path, cents)
    rows = q_rsi_sma(spark, sf)  # noqa: F841  (warm unrelated path)
    out = q_weighted_moving_avg(spark, sf).orderBy("day").collect()
    assert len(out) == len(cents) - WMA_DAYS + 1
    for i, r in enumerate(out):
        window = cents[i : i + WMA_DAYS]
        want = sum((j + 1) * v for j, v in enumerate(window)) / (
            WMA_DAYS * (WMA_DAYS + 1) / 2
        )
        assert abs(r[f"wma_{WMA_DAYS}d"] - round(want / 100, 4)) < 1e-9


def test_drawdown_zero_iff_at_peak_on_random_walk(spark, tmp_path):
    """Python replay of the peak/drawdown recursion on a seeded
    random walk (values may dip; cumulative revenue of positive
    purchases is still monotone — so force variation via mixed
    magnitudes and assert the algebra, not monotonicity)."""
    rng = random.Random(7)
    cents = [rng.randrange(1, 50_000) for _ in range(25)]
    sf = _write_daily_events(spark, tmp_path, cents)
    rows = q_drawdown(spark, sf).orderBy("day").collect()
    cum = peak = 0
    for r, c in zip(rows, cents):
        cum += c
        peak = max(peak, cum)
        assert abs(r.cum_revenue - cum / 100) < 1e-9
        assert abs(r.peak_revenue - peak / 100) < 1e-9
        assert abs(r.drawdown_pct - round((peak - cum) / peak, 6)) < 1e-9


def test_donchian_breakouts_replay(spark, tmp_path):
    """Breakout flags equal a python replay of the trailing-window
    channel on a seeded series with planted spikes."""
    rng = random.Random(3)
    cents = [rng.randrange(1_000, 2_000) for _ in range(30)]
    cents[15] = 50_000  # planted breakout_up
    cents[22] = 10  # planted breakout_down
    sf = _write_daily_events(spark, tmp_path, cents)
    rows = q_donchian_channel(spark, sf).orderBy("day").collect()
    assert len(rows) == len(cents) - DONCHIAN_DAYS
    for i, r in enumerate(rows):
        t = i + DONCHIAN_DAYS
        window = cents[t - DONCHIAN_DAYS : t]
        assert r.breakout_up == (cents[t] > max(window))
        assert r.breakout_down == (cents[t] < min(window))
    assert any(r.breakout_up for r in rows)
    assert any(r.breakout_down for r in rows)


def test_runs_test_extremes(spark, tmp_path):
    """An alternating series lands in the too-many-runs tail (z > 0,
    non-random); a sorted series clusters into 2 runs (z < 0). The
    exact-median day is excluded, so values are DISTINCT by
    construction here and exactly one day drops."""
    n = 24
    alt = [
        (1000 + i) if i % 2 == 0 else (9000 + i) for i in range(n)
    ]
    sf = _write_daily_events(spark, tmp_path / "alt", alt)
    r = q_runs_test(spark, sf).collect()[0]
    assert r.n_days == n - 1  # the attained median day is excluded
    assert r.n_runs >= r.n_days - 2  # alternation survives one drop
    assert r.z_stat > 0
    assert not r.random_5pct
    srt = [1000 + 100 * i for i in range(n)]
    sf = _write_daily_events(spark, tmp_path / "srt", srt)
    r = q_runs_test(spark, sf).collect()[0]
    assert r.n_runs == 2
    assert r.z_stat < 0
    assert not r.random_5pct


def test_runs_test_degenerate_one_sided_is_null(spark, tmp_path):
    """If every non-median day sits on ONE side, run variance is 0
    and z must be NULL, not a divide-by-zero (the edge this property
    file caught on first run)."""
    two = [1000 if i % 2 == 0 else 9000 for i in range(24)]
    sf = _write_daily_events(spark, tmp_path, two)
    r = q_runs_test(spark, sf).collect()[0]
    assert r.n_below == 0 and r.n_above == 12
    assert r.z_stat is None and r.random_5pct is None
