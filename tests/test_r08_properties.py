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


# ---- synthetic star-schema corpora for the BI/stats family ----

from etl_city_directories_spark.operators.analytics import (
    PVM_Y1,
    PVM_Y2,
    q_price_volume_mix,
)
from etl_city_directories_spark.operators.nonparam import q_friedman_test
from etl_city_directories_spark.operators.stats import q_mood_median_test
from etl_city_directories_spark.operators.temporal import q_vwap_daily


def _write_lineitem_part(spark, tmpdir, items):
    """items: (partkey, brand, shipdate, qty, extprice[, disc])."""
    li = spark.createDataFrame(
        [
            (
                i,
                it[0],
                1,
                1,
                float(it[3]),
                float(it[4]),
                float(it[5]) if len(it) > 5 else 0.0,
                0.0,
                "N",
                "O",
                it[2],
            )
            for i, it in enumerate(items)
        ],
        [
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate_s",
        ],
    ).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus",
        F.col("l_shipdate_s").cast("timestamp").alias("l_shipdate"),
    )
    li.coalesce(1).write.mode("overwrite").parquet(
        f"{tmpdir}/lineitem.parquet"
    )
    parts = sorted({(it[0], it[1]) for it in items})
    spark.createDataFrame(
        [(pk, f"part{pk}", br, "TYPE", 1, 100.0) for pk, br in parts],
        ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
         "p_retailprice"],
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/part.parquet")
    return str(tmpdir)


def test_pvm_classes_and_exact_reconciliation(spark, tmp_path):
    """Carried brands reconcile price+volume == delta EXACTLY; a
    brand present only in the base year is 'discontinued' with delta
    = -base revenue; only in the next year → 'new'."""
    sf = _write_lineitem_part(
        spark,
        tmp_path,
        [
            (1, "BA", f"{PVM_Y1}-03-01 00:00:00", 10, 1000.00),
            (1, "BA", f"{PVM_Y2}-03-01 00:00:00", 14, 1700.13),
            (2, "BB", f"{PVM_Y1}-06-01 00:00:00", 5, 333.33),
            (3, "BC", f"{PVM_Y2}-06-01 00:00:00", 7, 777.77),
        ],
    )
    rows = {r.p_brand: r for r in q_price_volume_mix(spark, sf).collect()}
    a, b, c = rows["BA"], rows["BB"], rows["BC"]
    assert a.bridge_class == "carried"
    assert abs((a.price_effect + a.volume_effect) - a.delta_revenue) < 1e-12
    # volume effect = old unit price (100.00) x (14 - 10) = +400
    assert abs(a.volume_effect - 400.0) < 1e-9
    assert b.bridge_class == "discontinued"
    assert abs(b.delta_revenue + 333.33) < 1e-9
    assert b.price_effect is None and b.volume_effect is None
    assert c.bridge_class == "new"
    assert abs(c.delta_revenue - 777.77) < 1e-9


def test_vwap_half_boundary_rounds_up_exactly(spark, tmp_path):
    """A day whose VWAP's 5th decimal is an exact half (4100 cents /
    8 units = 512.5 e-4 dollars) must round half-UP via the integer
    path — the boundary that flipped between engines under float."""
    sf = _write_lineitem_part(
        spark,
        tmp_path,
        [(1, "BA", "1997-01-01 00:00:00", 8, 0.41)],
    )
    r = q_vwap_daily(spark, sf).collect()[0]
    assert r.units == 8
    assert r.vwap_day == 0.0513  # 4100/8 = 512.5 -> 513 e-4 dollars
    assert r.vwap_mtd == 0.0513


def _write_typed_events(spark, tmpdir, rows):
    """rows: (day_index, event_type, cents)."""
    df = spark.createDataFrame(
        [
            (
                i,
                f"2024-01-{d + 1:02d} 12:00:0{i % 10}",
                1,
                t,
                c / 100.0,
                '{"k": 1}',
            )
            for i, (d, t, c) in enumerate(rows)
        ],
        ["event_id", "ts_s", "user_id", "event_type", "value", "props"],
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


def test_friedman_all_ties_is_zero(spark, tmp_path):
    """If every treatment posts the SAME revenue in every block, all
    midranks coincide and Q must be exactly 0."""
    rows = [
        (d, t, 5000)
        for d in range(6)
        for t in ("alpha", "beta", "gamma")
    ]
    sf = _write_typed_events(spark, tmp_path, rows)
    r = q_friedman_test(spark, sf).collect()[0]
    assert r.k_treatments == 3 and r.b_blocks == 6
    assert r.q_stat == 0.0
    assert not r.differs_5pct


def test_friedman_perfect_ordering_hits_max(spark, tmp_path):
    """A treatment order repeated identically in every block attains
    Friedman's maximum Q = b·(k−1) (here 6·2 = 12)."""
    rows = []
    for d in range(6):
        rows += [(d, "alpha", 1000), (d, "beta", 2000), (d, "gamma", 3000)]
    sf = _write_typed_events(spark, tmp_path, rows)
    r = q_friedman_test(spark, sf).collect()[0]
    assert r.q_stat == 12.0
    assert r.differs_5pct


def test_mood_identical_groups_chi2_zero(spark, tmp_path):
    """Groups with IDENTICAL value multisets split around the grand
    median in exactly the expected proportions → chi2 == 0."""
    rows = []
    for t in ("alpha", "beta"):
        for d, c in enumerate([100, 200, 300, 400]):
            rows.append((d, t, c))
    sf = _write_typed_events(spark, tmp_path, rows)
    r = q_mood_median_test(spark, sf).collect()[0]
    assert r.k_groups == 2 and r.n == 8
    assert r.chi2_stat == 0.0
    assert not r.differs_5pct


# ---- schema evolution ----

from etl_city_directories_spark.operators.scale_ops import (
    source_schema_evolution,
)


def test_schema_evolution_null_backfill(spark):
    """Legacy-generation rows surface the evolved columns as NULL and
    the split accounts for every document exactly once."""
    sf = "/root/testdata/sf0.01"
    rows = source_schema_evolution(spark, sf).collect()
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    want = {
        (r.lang): (r.n, r.odd)
        for r in docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("doc_id") % 2).cast("int")).alias("odd"),
        )
        .collect()
    }
    assert len(rows) == len(want)
    for r in rows:
        n, odd = want[r.lang]
        assert r.n_docs == n
        assert r.n_evolved == odd
        assert r.n_legacy == n - odd


# ---- Poisson bootstrap ----

from etl_city_directories_spark.operators.stats import (
    BOOT_B,
    q_bootstrap_ci_mean,
)


def test_bootstrap_ci_brackets_point_and_se_positive(spark):
    """On the driver corpus: the percentile CI brackets the point
    mean, the bootstrap SE is positive and in the same ballpark as
    the analytic SE of the mean (sd/sqrt(n)) — Poisson(1) weights
    reproduce multinomial resampling to first order."""
    sf = "/root/testdata/sf0.01"
    r = q_bootstrap_ci_mean(spark, sf).collect()[0]
    assert r.n_replicates == BOOT_B
    assert r.ci_lo <= r.point_mean <= r.ci_hi
    assert r.boot_se > 0
    import numpy as np  # noqa: PLC0415

    vals = np.array(
        [
            x.o_totalprice
            for x in spark.read.parquet(f"{sf}/orders.parquet")
            .select("o_totalprice")
            .collect()
        ]
    )
    analytic_se = vals.std(ddof=1) / (len(vals) ** 0.5)
    assert analytic_se / 3 < r.boot_se < analytic_se * 3
