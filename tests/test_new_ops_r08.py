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


# ---- r08 BI / corpus-science batch ----

from etl_city_directories_spark.operators.analytics import (
    graph_clustering_coeff,
    graph_triangle_count,
    q_customer_concentration,
    q_price_volume_mix,
    q_share_nested,
)
from etl_city_directories_spark.operators.dedup import (
    dedup_band_collision_stats,
    dedup_minhash_lsh,
)
from etl_city_directories_spark.operators.partsupp import q_inventory_turns
from etl_city_directories_spark.operators.similarity import (
    ann_topk_bruteforce,
    emb_topk_margin,
)
from etl_city_directories_spark.operators.textstats import (
    text_burstiness,
    text_collocations_pmi,
    text_word_length_hist,
)


def test_pvm_bridge_reconciles_exactly(spark):
    """On every carried brand price + volume == delta EXACTLY (the
    integer-rounding construction guarantees it, not approximately)."""
    rows = q_price_volume_mix(spark, SF).collect()
    assert rows
    carried = [r for r in rows if r.bridge_class == "carried"]
    assert carried
    for r in carried:
        assert abs((r.price_effect + r.volume_effect) - r.delta_revenue) < 1e-9
    for r in rows:
        if r.bridge_class == "new":
            assert r.revenue_base == 0.0
        if r.bridge_class == "discontinued":
            assert r.revenue_next == 0.0


def test_concentration_share_bounds(spark):
    rows = q_customer_concentration(spark, SF).collect()
    assert len(rows) == 25
    for r in rows:
        lo = min(1.0, 5 / r.n_customers)
        assert lo - 1e-9 <= r[f"top5_share"] <= 1.0


def test_share_nested_sums_to_one(spark):
    rows = q_share_nested(spark, SF).collect()
    by_region: dict = {}
    regions: dict = {}
    for r in rows:
        by_region.setdefault(r.r_name, 0.0)
        by_region[r.r_name] += r.share_in_region
        regions[r.r_name] = r.region_share_global
    for tot in by_region.values():
        assert abs(tot - 1.0) < 1e-4
    assert abs(sum(regions.values()) - 1.0) < 1e-4


def test_inventory_turns_ratio(spark):
    rows = q_inventory_turns(spark, SF).collect()
    assert len(rows) == 25
    for r in rows:
        assert r.stock_units > 0
        assert abs(r.turns - r.demand_units / r.stock_units) < 1e-4
        assert r.slow_mover == (r.turns < 1.0)


def test_clustering_coeff_consistent_with_global(spark):
    """Bucket histogram covers exactly the deg>=2 nodes and every
    bucket is in [0, 10]; avg_local_cc lies in [0, 1]."""
    cc = graph_clustering_coeff(spark, SF).collect()
    assert cc
    for r in cc:
        assert 0 <= r.cc_bucket_x10 <= 10
        assert 0.0 <= r.avg_local_cc <= 1.0
    tri = graph_triangle_count(spark, SF).collect()[0]
    deg2_nodes = sum(r.n_nodes for r in cc)
    assert deg2_nodes <= tri.n_nodes


def test_collocations_pmi_ranked_and_supported(spark):
    rows = text_collocations_pmi(spark, SF).collect()
    assert len(rows) == 50
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    for r in rows:
        assert r.c_ab >= 5


def test_burstiness_positive_and_ranked_by_freq(spark):
    rows = text_burstiness(spark, SF).collect()
    assert len(rows) == 20
    totals = [r.total_count for r in rows]
    assert totals == sorted(totals, reverse=True)
    for r in rows:
        assert r.vmr >= 0.0
        assert r.doc_freq <= r.total_count


def test_word_length_hist_shares(spark):
    rows = text_word_length_hist(spark, SF).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r.n_distinct_words <= r.n_occurrences


def test_band_collisions_account_for_lsh_candidates(spark):
    """Every LSH candidate pair collides in >= 1 band, so the summed
    per-band candidate_pairs bounds the distinct verified-pair count
    from above."""
    bands = dedup_band_collision_stats(spark, SF).collect()
    assert len(bands) == 4
    total_cand = sum(r.candidate_pairs for r in bands)
    verified = dedup_minhash_lsh(spark, SF).count()
    assert verified <= total_cand
    for r in bands:
        assert r.n_colliding_buckets <= r.n_buckets
        assert r.max_bucket >= 1


def test_topk_margin_matches_bruteforce(spark):
    margins = {r.probe_id: r for r in emb_topk_margin(spark, SF).collect()}
    topk = ann_topk_bruteforce(spark, SF).filter(F.col("rank") <= 2).collect()
    by_probe: dict = {}
    for t in topk:
        by_probe.setdefault(t.probe_id, {})[t.rank] = t
    assert set(margins) == set(by_probe)
    for pid, d in by_probe.items():
        m = margins[pid]
        assert m.top1_neighbor == d[1].neighbor_id
        assert abs(m.margin - (d[1].cos_sim - d[2].cos_sim)) < 1e-9
        assert m.margin >= -1e-9


# ---- r08 second wave: streaming twins, supply chain, corpus info ----

from etl_city_directories_spark.operators.linkage import (
    MAX_EDIT,
    er_blocked_pairs,
    er_pair_score_distribution,
)
from etl_city_directories_spark.operators.partsupp import q_stockout_risk
from etl_city_directories_spark.operators.scale_ops import (
    q_duplicate_invoice_detect,
)
from etl_city_directories_spark.operators.similarity import (
    emb_twonn_intrinsic_dim,
)
from etl_city_directories_spark.operators.stats import (
    q_jarque_bera as _batch_jb,
)
from etl_city_directories_spark.operators.textstats import (
    text_bigram_cond_entropy,
    text_vocab_coverage_curve,
    text_vocab_gini,
)
from etl_city_directories_spark.streaming.stream_ops import (
    stream_entropy_hourly,
    stream_moments_jb,
)


def test_stream_moments_equal_batch_jb(spark):
    """The streaming moment accumulation must reproduce the batch
    Jarque-Bera rows EXACTLY — integer sufficient statistics are
    microbatch-split-invariant."""
    got = sorted(map(tuple, stream_moments_jb(spark, SF).collect()))
    want = sorted(map(tuple, _batch_jb(spark, SF).collect()))
    assert got == want


def test_stream_entropy_hourly_bounds(spark):
    rows = stream_entropy_hourly(spark, SF).collect()
    assert len(rows) == 720  # 30 days x 24 hours
    for r in rows:
        assert -1e-6 <= r.entropy_nats <= math.log(r.k_types) + 1e-6


def test_stockout_risk_consistency(spark):
    rows = q_stockout_risk(spark, SF).collect()
    assert len(rows) == 25
    for r in rows:
        assert r.sd_weekly_demand >= 0
        # coverage vs a mean that is itself rounded to 2dp: the
        # relative error of the rounded mean bounds the gap
        approx = r.stock_units / r.mean_weekly_demand
        assert abs(r.coverage_weeks - approx) <= approx * 1e-4 + 0.01
        assert r.at_risk_95 == (r.safety_z < 1.644854)


def test_duplicate_invoice_groups_have_multiple_orders(spark):
    rows = q_duplicate_invoice_detect(spark, SF).collect()
    assert rows  # the synthetic corpus has same-day repeat customers
    for r in rows:
        assert r.n_orders >= 2
        assert r.min_amount <= r.max_amount
        assert r.day_total >= r.max_amount


def test_cond_entropy_below_unigram(spark):
    """Conditioning can't add entropy: H(W2|W1) <= H(W) (+ micro-
    quantization slack), and the context gain is in [0, 1]."""
    r = text_bigram_cond_entropy(spark, SF).collect()[0]
    assert r.h_cond_nats <= r.h_unigram_nats + 1e-4
    assert -1e-6 <= r.context_gain <= 1.0


def test_coverage_curve_monotone(spark):
    rows = text_vocab_coverage_curve(spark, SF).collect()
    shares = [r.covered_share for r in rows]
    assert shares == sorted(shares)
    assert all(0 < s <= 1.0 for s in shares)
    ks = [r.k for r in rows]
    assert ks == sorted(ks)
    for r in rows:
        assert r.vocab_used <= r.k


def test_vocab_gini_in_unit_interval(spark):
    r = text_vocab_gini(spark, SF).collect()[0]
    assert 0.0 <= r.vocab_gini < 1.0
    assert r.vocab_size <= r.n_tokens


def test_twonn_dim_plausible(spark):
    """The synthetic 64-d embeddings should report an intrinsic dim
    in (0, 64]; the estimator uses all probes with distinct NNs."""
    r = emb_twonn_intrinsic_dim(spark, SF).collect()[0]
    assert 0 < r.intrinsic_dim <= 64.5
    assert 1 <= r.n_probes_used <= 32
    assert r.sum_log_ratio > 0


def test_pair_score_distribution_accounts_for_matches(spark):
    rows = er_pair_score_distribution(spark, SF).collect()
    assert rows
    total_within = sum(
        r.n_pairs for r in rows if r.within_match_threshold
    )
    assert total_within == er_blocked_pairs(spark, SF).count()
    cums = [r.cum_share for r in rows]
    assert cums == sorted(cums)
    assert abs(cums[-1] - 1.0) < 1e-6
    for r in rows:
        assert r.within_match_threshold == (r.edit_dist <= MAX_EDIT)


# ---- r08 third wave: robust variance, portmanteau, dedup curve ----

from etl_city_directories_spark.operators.dedup import (
    SWEEP_PCTS,
    dedup_threshold_sweep,
)
from etl_city_directories_spark.operators.stats import (
    q_autocorr_lag,
    q_brown_forsythe,
    q_ljung_box,
)


def test_brown_forsythe_matches_numpy(spark):
    """F statistic agrees with a numpy replay of Levene-with-median
    on the cent-rounded values."""
    r = q_brown_forsythe(spark, SF).collect()[0]
    df = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", F.round(F.col("value").cast("decimal(18,2)") * 100)
        .cast("long").alias("c")
    ).collect()
    groups: dict = {}
    for row in df:
        groups.setdefault(row.event_type, []).append(row.c)
    zs = {}
    for t, vals in groups.items():
        v = np.sort(np.array(vals))
        med = v[int(np.ceil(len(v) / 2)) - 1]
        zs[t] = np.abs(np.array(vals) - med)
    all_z = np.concatenate(list(zs.values()))
    k, n = len(zs), len(all_z)
    gbar = all_z.mean()
    between = sum(len(z) * (z.mean() - gbar) ** 2 for z in zs.values())
    within = sum(((z - z.mean()) ** 2).sum() for z in zs.values())
    f = (between / (k - 1)) / (within / (n - k))
    assert r.k_groups == k and r.n == n
    assert abs(r.f_stat - f) < max(1e-3, f * 1e-4)


def test_ljung_box_matches_numpy(spark):
    """Q agrees with a numpy replay of the sample-ACF portmanteau."""
    r = q_ljung_box(spark, SF).collect()[0]
    daily = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.round(F.sum(F.col("value").cast("decimal(18,2)")) * 100)
             .cast("long").alias("cents"))
        .orderBy("day")
        .collect()
    )
    x = np.array([d.cents for d in daily], dtype=float)
    n = len(x)
    xb = x.mean()
    c0 = ((x - xb) ** 2).sum()
    q = 0.0
    for k in range(1, 8):
        rho = ((x[:-k] - xb) * (x[k:] - xb)).sum() / c0
        q += rho * rho / (n - k)
    q *= n * (n + 2)
    assert r.n_days == n and r.m_lags == 7
    assert abs(r.q_stat - q) < max(1e-3, q * 1e-4)


def test_threshold_sweep_monotone_and_consistent(spark):
    rows = dedup_threshold_sweep(spark, SF).collect()
    assert [r.cut_pct for r in rows] == sorted(SWEEP_PCTS)
    pairs = [r.n_pairs for r in rows]
    docs = [r.n_docs_affected for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    verified = dedup_minhash_lsh(spark, SF).count()
    assert rows[0].n_pairs == verified  # the 20% cut IS the verify floor
    for r in rows:
        if r.n_pairs:
            assert r.n_docs_affected >= 2
            assert r.n_docs_affected <= 2 * r.n_pairs


# ---- r08 fourth wave: rolling correlation + streaming drawdown ----

from etl_city_directories_spark.operators.windows import (
    ROLLCORR_DAYS,
    q_rolling_corr,
)
from etl_city_directories_spark.streaming.stream_ops import (
    stream_daily_drawdown,
)


def test_rolling_corr_matches_numpy(spark):
    """Each emitted window's correlation equals numpy's Pearson on
    the same 14-day slice."""
    daily = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type").isin("purchase", "click"))
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.coalesce(
                F.round(F.sum(F.when(F.col("event_type") == "purchase",
                                     F.col("value").cast("decimal(18,2)")))
                        * 100).cast("long"), F.lit(0)).alias("x"),
            F.coalesce(
                F.round(F.sum(F.when(F.col("event_type") == "click",
                                     F.col("value").cast("decimal(18,2)")))
                        * 100).cast("long"), F.lit(0)).alias("y"),
        )
        .orderBy("day")
        .collect()
    )
    xs = np.array([d.x for d in daily], dtype=float)
    ys = np.array([d.y for d in daily], dtype=float)
    rows = q_rolling_corr(spark, SF).collect()
    assert len(rows) == len(daily) - ROLLCORR_DAYS + 1
    for i, r in enumerate(rows):
        xw = xs[i : i + ROLLCORR_DAYS]
        yw = ys[i : i + ROLLCORR_DAYS]
        want = np.corrcoef(xw, yw)[0, 1]
        assert abs(r[f"rolling_corr_{ROLLCORR_DAYS}d"] - want) < 1e-4
        assert -1.0 - 1e-9 <= r[f"rolling_corr_{ROLLCORR_DAYS}d"] <= 1.0 + 1e-9


def test_stream_drawdown_equals_batch(spark):
    """The streaming sink replay reproduces the batch drawdown series
    exactly (integer counters are split-invariant)."""
    got = sorted(map(tuple, stream_daily_drawdown(spark, SF).collect()))
    want = sorted(map(tuple, q_drawdown(spark, SF).collect()))
    assert got == want
