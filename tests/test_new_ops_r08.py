"""Semantic properties for the r08 operator batch. The exact-value
cross-engine check is tests/test_correctness.py's mirror; these pin
the ALGORITHMIC contracts the hash can't see: drawdown monotonicity
invariants, Donchian band ordering and breakout exclusivity, RSI
boundedness, WMA-vs-SMA lag response, VWAP weighted-mean bounds, and
the streaming VWAP's equality with a batch replay.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_city_directories_spark.operators.temporal import q_vwap_daily
from etl_city_directories_spark.operators.windows import (
    DONCHIAN_DAYS,
    RSI_DAYS,
    WMA_DAYS,
    q_donchian_channel,
    q_drawdown,
    q_moving_avg,
    q_rsi_sma,
    q_weighted_moving_avg,
)
from etl_city_directories_spark.streaming.stream_ops import stream_vwap

SF = "/root/testdata/sf0.01"


def test_drawdown_invariants(spark):
    """Peak is the running max of cum (non-decreasing, >= cum),
    drawdown is in [0, 1), and a day at its peak has drawdown 0."""
    rows = q_drawdown(spark, SF).orderBy("day").collect()
    assert rows
    prev_peak = float("-inf")
    for r in rows:
        assert r.peak_revenue >= r.cum_revenue
        assert r.peak_revenue >= prev_peak
        prev_peak = r.peak_revenue
        assert 0.0 <= r.drawdown_pct < 1.0
        if r.cum_revenue == r.peak_revenue:
            assert r.drawdown_pct == 0.0


def test_donchian_band_ordering_and_flag_exclusivity(spark):
    """low <= mid <= high on every row; a day can't break out both
    ways; and the first DONCHIAN_DAYS days are dropped (full frames
    only)."""
    df = q_donchian_channel(spark, SF)
    rows = df.collect()
    assert rows
    n_days = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select(F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .distinct()
        .count()
    )
    assert len(rows) == n_days - DONCHIAN_DAYS
    for r in rows:
        assert r.channel_low <= r.channel_mid <= r.channel_high
        assert not (r.breakout_up and r.breakout_down)


def test_rsi_bounded_and_full_lookback(spark):
    """RSI lies in [0, 100]; emitted rows all have RSI_DAYS full
    deltas (series length = days - RSI_DAYS)."""
    rows = q_rsi_sma(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.rsi_14 <= 100.0


def test_wma_tracks_recent_days_harder_than_sma(spark):
    """On each shared day, |WMA - today| <= |SMA - today| on average:
    the linear weights put more mass on the recent side, so the WMA
    hugs the current value at least as closely as the plain MA."""
    wma = {r.day: (r.day_revenue, r[f"wma_{WMA_DAYS}d"])
           for r in q_weighted_moving_avg(spark, SF).collect()}
    sma = {r.day: r.moving_avg_7d for r in q_moving_avg(spark, SF).collect()}
    shared = sorted(set(wma) & set(sma))
    assert len(shared) >= 10
    wma_err = sum(abs(wma[d][1] - wma[d][0]) for d in shared)
    sma_err = sum(abs(sma[d] - wma[d][0]) for d in shared)
    assert wma_err <= sma_err


def test_vwap_between_min_and_max_unit_price(spark):
    """Each day's VWAP is a weighted mean of that day's unit prices,
    so it lies within [min, max] of extendedprice/quantity."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit"),
    )
    bounds = {
        r.day: (r.lo, r.hi)
        for r in li.groupBy("day")
        .agg(F.min("unit").alias("lo"), F.max("unit").alias("hi"))
        .collect()
    }
    rows = q_vwap_daily(spark, SF).collect()
    assert rows
    for r in rows:
        lo, hi = bounds[r.day]
        assert lo - 0.01 <= r.vwap_day <= hi + 0.01
        assert r.units > 0


def test_stream_vwap_equals_batch_replay(spark):
    """The streaming hourly VWAP over the availableNow replay equals
    the same weighted mean computed in batch — microbatch splits
    can't change an exact integer-sufficient-statistics aggregate."""
    got = {
        r.bar_start_us: (r.n_trades, r.units, r.vwap)
        for r in stream_vwap(spark, SF).collect()
    }
    k = F.get_json_object("props", "$.k").cast("long")
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("bar"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).cast("bigint").alias("units"),
            ((F.sum(F.col("value").cast("decimal(18,2)") * k)) * 100)
            .cast("bigint")
            .alias("wcents"),
        )
        .collect()
    )
    assert len(batch) == len(got)
    for b in batch:
        us = int(b.bar.timestamp() * 1_000_000)
        n, units, vwap = got[us]
        assert n == b.n and units == b.units
        if b.units > 0:
            # vwap is emitted at 4 dp; allow the half-ulp of that round
            assert abs(vwap - b.wcents / b.units / 100) <= 5e-5
        else:
            assert vwap is None


# ---- r08 statistics batch ----

import math

import numpy as np

from etl_city_directories_spark.operators.nonparam import q_friedman_test
from etl_city_directories_spark.operators.stats import (
    q_cramers_v,
    q_entropy_by_group,
    q_grubbs_outlier,
    q_jarque_bera,
    q_mood_median_test,
    q_mutual_information,
    q_runs_test,
)


def _event_values(spark, typ=None):
    df = spark.read.parquet(f"{SF}/events.parquet")
    if typ is not None:
        df = df.filter(F.col("event_type") == typ)
    return np.array([r.value for r in df.select("value").collect()])


def test_jarque_bera_matches_numpy_moments(spark):
    """Skewness/kurtosis/JB agree with a numpy replay on raw values
    (cent rounding first, like the operator)."""
    rows = {r.event_type: r for r in q_jarque_bera(spark, SF).collect()}
    assert len(rows) == 5
    for typ in ("purchase", "error"):
        v = np.round(_event_values(spark, typ) * 100) / 100
        n = len(v)
        m = v.mean()
        m2 = ((v - m) ** 2).mean()
        skew = ((v - m) ** 3).mean() / m2**1.5
        kurt = ((v - m) ** 4).mean() / m2**2
        jb = n / 6 * (skew**2 + (kurt - 3) ** 2 / 4)
        r = rows[typ]
        assert abs(r.skewness - skew) < 1e-3
        assert abs(r.kurtosis - kurt) < 1e-3
        assert abs(r.jb_stat - jb) < max(0.01, jb * 1e-3)


def test_grubbs_suspect_is_an_extreme(spark):
    rows = q_grubbs_outlier(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        v = _event_values(spark, r.event_type)
        assert r.g_stat > 0
        assert (
            abs(r.suspect_value - v.max()) < 0.01
            or abs(r.suspect_value - v.min()) < 0.01
        )
        # G is bounded by (n-1)/sqrt(n)
        assert r.g_stat <= (r.n - 1) / math.sqrt(r.n)


def test_mood_median_counts_consistent(spark):
    r = q_mood_median_test(spark, SF).collect()[0]
    v = np.round(_event_values(spark) * 100)
    assert r.n == len(v)
    assert r.chi2_stat >= 0
    # the rank-selected grand median is the ceil(n/2)-th order statistic
    med = np.sort(v)[int(np.ceil(len(v) / 2)) - 1]
    assert abs(r.grand_median - med / 100) < 1e-9


def test_runs_test_replay(spark):
    """Replay the run count in pure python from the daily series."""
    r = q_runs_test(spark, SF).collect()[0]
    daily = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.round(F.sum(F.col("value").cast("decimal(18,2)")) * 100)
             .cast("long").alias("cents"))
        .orderBy("day")
        .collect()
    )
    cents = [x.cents for x in daily]
    med = sorted(cents)[int(np.ceil(len(cents) / 2)) - 1]
    signs = [c > med for c in cents if c != med]
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    assert r.n_runs == runs
    assert r.n_above == sum(signs)
    assert r.n_below == len(signs) - sum(signs)


def test_cramers_v_in_unit_interval(spark):
    rows = q_cramers_v(spark, SF).collect()
    assert len(rows) == 2
    for r in rows:
        assert 0.0 <= r.cramers_v <= 1.0
        assert r.chi2_stat >= 0
        assert r.df == (r.levels_x - 1) * (r.levels_y - 1)


def test_mutual_information_bounds(spark):
    r = q_mutual_information(spark, SF).collect()[0]
    assert r.mi_nats >= -1e-6
    assert r.mi_nats <= min(r.h_type, r.h_dow) + 1e-6
    assert 0.0 <= r.normalized_mi <= 1.0 + 1e-6
    # 5 uniform-ish types: H close to ln 5
    assert 0 < r.h_type <= math.log(5) + 1e-6


def test_entropy_by_group_bounded_by_log_k(spark):
    rows = q_entropy_by_group(spark, SF).collect()
    assert rows
    for r in rows:
        assert -1e-6 <= r.entropy_nats <= math.log(r.k_types) + 1e-6


def test_friedman_replay(spark):
    """Pure-python Friedman replay on the daily (day, type) grid."""
    r = q_friedman_test(spark, SF).collect()[0]
    grid = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(F.to_date("ts").alias("d"), "event_type")
        .agg(F.round(F.sum(F.col("value").cast("decimal(18,2)")) * 100)
             .cast("long").alias("cents"))
        .collect()
    )
    by_day: dict = {}
    for g in grid:
        by_day.setdefault(g.d, []).append((g.event_type, g.cents))
    k = len({g.event_type for g in grid})
    rank_sums: dict = {}
    b = 0
    for day, items in by_day.items():
        if len(items) != k:
            continue
        b += 1
        svals = sorted(c for _, c in items)
        for typ, c in items:
            lo = svals.index(c) + 1
            ties = svals.count(c)
            rank_sums[typ] = rank_sums.get(typ, 0.0) + lo + (ties - 1) / 2
    q = 12.0 / (b * k * (k + 1)) * sum(
        rj * rj for rj in rank_sums.values()
    ) - 3.0 * b * (k + 1)
    assert r.k_treatments == k and r.b_blocks == b
    assert abs(r.q_stat - q) < 1e-4
