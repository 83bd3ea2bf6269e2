"""Plan-shape assertions (SURVEY §5): the physical plans Catalyst picks
must be the plans we'd want on a 1000-executor cluster.

These tests never execute a job — they inspect ``explain("formatted")``
output — so regressions in pushdown/pruning/broadcast/codegen are
caught even when results stay correct.
"""

from __future__ import annotations

import contextlib
import io

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

QUERIES = entry_mod.queries()


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_filters_pushed_to_scan(spark):
    """Tight-range filter must reach the parquet scan as PushedFilters."""
    plan = plan_of(QUERIES["q6_forecast_revenue"](spark, SF))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "GreaterThan" in pushed or "GreaterThanOrEqual" in pushed, pushed


def test_scan_prunes_columns(spark):
    """A 2-column text op must not read the other document columns."""
    plan = plan_of(QUERIES["text_token_count"](spark, SF))
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "text" in read
    for unused in ("lang", "source", "n_chars"):
        assert unused not in read, f"{unused} not pruned: {read}"


def test_q5_broadcasts_dimensions(spark):
    """6-way join: small dims (region/nation/supplier) broadcast, never
    shuffle the fact table on a dim key."""
    plan = plan_of(QUERIES["q5_local_supplier"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_ann_broadcasts_probe_side(spark):
    plan = plan_of(QUERIES["ann_topk_bruteforce"](spark, SF))
    assert "Broadcast" in plan


def test_jvm_operators_have_no_python_eval(spark):
    """Everything JVM-expressible must stay out of Python workers.
    (Only mm_* decode and streaming state ops legitimately use Python;
    dedup_simhash joined the JVM-only set in r05.)"""
    for name in (
        "q1_pricing_summary",
        "dedup_simhash",
        "q_sessionize",
        "q_asof_join",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_embedding",
        "text_lang_id",
        "text_fingerprint",
        "cd_parse_entries",
        "cd_geocode",
    ):
        plan = plan_of(QUERIES[name](spark, SF))
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan, f"{name} plan contains {marker}"


def test_q1_uses_wholestage_codegen(spark):
    df = QUERIES["q1_pricing_summary"](spark, SF)
    df.collect()  # AQE finalizes the plan only after execution
    plan = plan_of(df)
    # formatted mode marks codegen'd operators with "[codegen id : N]"
    assert "[codegen id :" in plan
    # scan→filter→project→partial-agg must share one codegen span
    assert "Filter [codegen id : 1]" in plan
    assert "HashAggregate [codegen id : 1]" in plan


def test_exact_dedup_partial_aggregates(spark):
    """hash-groupBy dedup must partial-aggregate map-side (two
    HashAggregate levels around one exchange)."""
    plan = plan_of(QUERIES["dedup_exact"](spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") >= 1


def test_q14_month_filter_pushed_to_scan(spark):
    """Q14's ship-month range must prune the lineitem scan."""
    plan = plan_of(QUERIES["q14_promo_revenue"](spark, SF))
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed, pushed


def test_q18_joins_back_broadcast(spark):
    """The HAVING-filtered orderkeys (tiny) must broadcast back onto
    orders, not shuffle the fact side."""
    plan = plan_of(QUERIES["q18_large_orders"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_funnel_single_window_exchange(spark):
    """The chained-window funnel must plan exactly one shuffle for all
    three window stages plus the per-user fold (no staged re-joins)."""
    plan = plan_of(QUERIES["q_funnel"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange") <= 4, plan


def test_salted_agg_two_phase(spark):
    """Salted aggregation: two HashAggregate pairs (partial+final per
    phase), and the salt column must not survive into the output."""
    df = QUERIES["q_skew_salted_agg"](spark, SF)
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 4, plan
    assert "salt" not in df.columns


def test_partsupp_queries_broadcast_dims(spark):
    """Q2/Q9: part/supplier/nation/region are dims — they must reach
    the fact joins as broadcasts, never shuffle the fact on a dim key."""
    for name, min_bcast in (("q2_min_cost_supplier", 2), ("q9_product_profit", 3)):
        plan = plan_of(QUERIES[name](spark, SF))
        assert plan.count("BroadcastHashJoin") >= min_bcast, f"{name}: {plan}"


def test_partsupp_composite_rejoin_eliminated(spark):
    """q9/q20/q16 probe the derived partsupp fact on the FULL composite
    key, whose attributes are pure key arithmetic — so the rejoin (a
    second lineitem scan + pair distinct + pair-keyed join, corpus-sized
    at 100 TB) is eliminated and the attributes compute inline (r10
    optimization; the oracle still derives partsupp and proves
    value-identity). The derivation subtree's ps_* columns must not
    appear, and q9/q20 must read lineitem exactly once."""
    for name in ("q9_product_profit", "q20_promotable_suppliers",
                 "q16_supplier_cnt"):
        plan = plan_of(QUERIES[name](spark, SF))
        assert "ps_partkey" not in plan, f"{name}: derivation subtree back"
    # q16's pair-distinct drop makes it single-scan too (judge ADVICE r10)
    for name in ("q9_product_profit", "q20_promotable_suppliers",
                 "q16_supplier_cnt"):
        plan = plan_of(QUERIES[name](spark, SF))
        assert plan.count("lineitem") == 1, f"{name}: extra lineitem scan"


def test_q7_q8_dims_filter_before_fact_join(spark):
    """q7/q8 attach their selective broadcast dims per fact side BEFORE
    the orderkey join (r10 §G): the nation/region predicate must reach
    the dim SCAN as a pushed filter (i.e. sit below everything), and
    each fact is read exactly once. Pins the 100 TB shape — shuffle
    ~2/25 (q7) / ~1/5 (q8) of each fact side, never the raw facts —
    against a Catalyst/AQE version bump silently reverting it."""
    plan = plan_of(QUERIES["q7_nation_volume"](spark, SF))
    assert "In(n_name, [NATION_1,NATION_2" in plan, plan
    assert plan.count("lineitem") == 1, "q7: extra lineitem scan"
    plan = plan_of(QUERIES["q8_market_share"](spark, SF))
    assert "EqualTo(r_name,ASIA)" in plan, plan
    assert plan.count("lineitem") == 1, "q8: extra lineitem scan"


def test_q2_q11_dims_filter_before_pair_distinct(spark):
    """q2/q11 broadcast their selective dims into the raw lineitem scan
    BEFORE the pair distinct (r10 §G): the dim predicates must be
    pushed scan filters, so the distinct exchange carries only the
    filtered pairs at any scale."""
    plan = plan_of(QUERIES["q2_min_cost_supplier"](spark, SF))
    assert "EqualTo(p_type,ECONOMY)" in plan, plan
    assert "EqualTo(r_name,EUROPE)" in plan, plan
    assert plan.count("lineitem") == 1, "q2: extra lineitem scan"
    plan = plan_of(QUERIES["q11_important_stock"](spark, SF))
    assert "EqualTo(n_name,NATION_3)" in plan, plan
    # two fact reads by design (per-supplier values + the total-value
    # threshold scalar); both must be nation-filtered pre-distinct
    assert plan.count("EqualTo(n_name,NATION_3)") >= 2, plan


def test_q21_single_window_exchange(spark):
    """The decorrelated Q21 must compute all three per-order window
    aggregates (and the distinct) over ONE shuffle on l_orderkey — the
    point of decorrelating the double EXISTS — with no fact self-join.
    Remaining shuffles: the s_name groupBy and the output sort."""
    import re

    plan = plan_of(QUERIES["q21_waiting_suppliers"](spark, SF))
    # detail-section lines '(N) Exchange' count each shuffle once
    # (BroadcastExchange lines don't match)
    shuffles = len(re.findall(r"\(\d+\) Exchange", plan))
    assert shuffles <= 3, f"{shuffles} shuffles: {plan}"
    assert "SortMergeJoin" not in plan  # no lineitem self-join
    assert plan.count("BroadcastHashJoin") >= 1  # supplier dim


def test_kmeans_assignment_broadcasts_centroids(spark):
    """IVF training: the K-row centroid table must broadcast into the
    assignment (a map-side nested-loop over K rows), never shuffle the
    vector corpus. Asserted on the training build itself —
    kmeans_cells memoizes the trained assignment (functions.memo), so
    its plan is a checkpoint scan, not the Lloyd loop."""
    from etl_city_directories_spark.operators.similarity import _kmeans_assign

    plan = plan_of(_kmeans_assign(spark, SF, 1))
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Both sides bucketed+sorted on the join key: the SortMergeJoin
    must read the buckets directly — zero Exchange (and zero extra
    Sort) on the join inputs."""
    import re

    from etl_city_directories_spark.operators.scale_ops import q_bucketed_join

    # disable auto-broadcast: at tiny SF Catalyst would (correctly)
    # broadcast the small side, which proves nothing about bucketing
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q_bucketed_join(spark, SF, path=str(tmp_path / "bkt"))
        plan = plan_of(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    # only the groupBy and orderBy above the join may shuffle — an
    # unbucketed plan would add one exchange per join input (4 total)
    shuffles = len(re.findall(r"\(\d+\) Exchange", plan))
    assert shuffles <= 2, f"{shuffles} shuffles: {plan}"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_profile_categorical_single_scan(spark):
    """The stack-unpivot profiler must read the fact table ONCE —
    a per-column loop would show one scan per profiled column."""
    import re

    plan = plan_of(QUERIES["profile_categorical"](spark, SF))
    scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert scans == 1, f"{scans} scans: {plan}"


def test_interval_overlap_no_self_join(spark):
    """The sweep line must be union + window — no interval self-join
    (which would be O(n x overlap))."""
    plan = plan_of(QUERIES["q_interval_overlap"](spark, SF))
    assert "Join" not in plan, plan
    assert "Union" in plan and "Window" in plan


def test_pq_adc_scoring_broadcasts_lut(spark):
    """PQ query path: the probe LUT and probe vectors must broadcast
    into the code scan — the corpus must never shuffle on the
    (sub, code) key."""
    plan = plan_of(QUERIES["ann_pq_adc"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_range_frame_single_shuffle(spark):
    """The RANGE-frame trailing total is one shuffle on the customer
    key, then a single window pass."""
    import re

    plan = plan_of(QUERIES["q_range_frame_total"](spark, SF))
    shuffles = len(re.findall(r"\(\d+\) Exchange", plan))
    assert shuffles == 1, f"{shuffles} shuffles: {plan}"
    assert "Window" in plan


def test_bloom_semi_reduction_inserts_runtime_filter(spark):
    """The urgent-orders bloom filter must be pushed into the lineitem
    probe side (might_contain in the plan) under the operator's confs."""
    from etl_city_directories_spark.operators.scale_ops import (
        _BLOOM_CONFS,
        load_table,
    )
    from pyspark.sql import functions as F

    prev = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        o = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        l = load_table(spark, SF, "lineitem")
        plan = plan_of(
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_items"))
        )
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "might_contain" in plan, plan
    assert "bloom_filter_agg" in plan, plan


def test_dpp_prunes_fact_partitions(spark, tmp_path):
    """Joining the partitioned fact to a filtered dim must plan a
    dynamicpruningexpression PartitionFilter on the fact scan."""
    from pyspark.sql import functions as F

    from etl_city_directories_spark.operators.scale_ops import load_table

    out = str(tmp_path / "dpp")
    (
        load_table(spark, SF, "events")
        .select("event_id", F.unix_micros("ts").alias("ts_us"), "event_type")
        .write.partitionBy("event_type")
        .mode("overwrite")
        .parquet(out)
    )
    fact = spark.read.parquet(out)
    dim = (
        load_table(spark, SF, "events")
        .select("event_type")
        .distinct()
        .filter(F.col("event_type").startswith("p"))
    )
    plan = plan_of(
        fact.join(dim, "event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert "dynamicpruningexpression" in plan, plan


def test_mojibake_is_pure_map_side(spark):
    """Encoding audit must ride the scan: no exchange, pruned read."""
    plan = plan_of(QUERIES["text_mojibake_stats"](spark, SF))
    assert "Exchange" not in plan, plan
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "text" in read and "lang" not in read


def test_dedup_prefix_single_shuffle(spark):
    """Prefix dedup is one hash-keyed aggregation with map-side
    combine: exactly one exchange node, partial agg before it.
    (formatted explain lists each node twice — tree + detail — so
    count the detail headers.)"""
    plan = plan_of(QUERIES["dedup_prefix"](spark, SF))
    assert plan.count(") Exchange") == 1, plan
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_pack_sequences_partitions_by_source(spark):
    """The prefix-sum window must shuffle on the source key (never a
    global single-partition ordering)."""
    plan = plan_of(QUERIES["pack_sequences"](spark, SF))
    assert "hashpartitioning(source" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_geocode_normalization_keeps_broadcast(spark):
    """The normalized lookup must still broadcast both dims — the
    corpus side stays map-side."""
    plan = plan_of(QUERIES["cd_geocode"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_validate_schema_single_agg_pass(spark):
    """All contract rules ride ONE aggregation over the transform
    output — the validator adds NO extra corpus scans beyond what
    cd_transform_objects itself performs."""
    v = plan_of(QUERIES["cd_validate_schema"](spark, SF))
    t = plan_of(QUERIES["cd_transform_objects"](spark, SF))
    assert v.count(") Scan parquet") == t.count(") Scan parquet"), v


def test_gopher_filter_is_pure_map_side(spark):
    """The structural quality gate must be a zero-exchange scan —
    the cheapest stage of the corpus funnel stays embarrassingly
    parallel."""
    plan = plan_of(QUERIES["text_gopher_filter"](spark, SF))
    assert ") Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_reservoir_uses_partial_top_k(spark):
    """Bottom-K-by-hash must compile to TakeOrderedAndProject (each
    partition keeps a local K-heap; the driver merges heaps) — never a
    global sort of the corpus."""
    plan = plan_of(QUERIES["sample_reservoir"](spark, SF))
    assert "TakeOrderedAndProject" in plan, plan


def test_zorder_layout_single_shuffle_no_python(spark):
    """The bit-interleave chain is pure JVM codegen; the only wide op
    is the partial-aggregated bucket rollup (+ its result ordering)."""
    plan = plan_of(QUERIES["q_zorder_layout"](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan or "partial_min" in plan, plan


def test_hll_rollup_ships_sketches_not_values(spark):
    """The day→type re-aggregation must merge sketch partials: the
    second shuffle carries hll_union_agg partial state, not raw
    user_ids."""
    plan = plan_of(QUERIES["q_hll_partial_rollup"](spark, SF))
    assert "hll_union_agg" in plan, plan
    assert "partial_hll_sketch_agg" in plan or "hll_sketch_agg" in plan


def test_cdc_apply_shares_the_key_exchange(spark):
    """The latest-op window and the per-key rollup must ride ONE
    user_id hash exchange (the second exchange is the presentation
    ordering) — the same single-shuffle contract as a MERGE INTO."""
    plan = plan_of(QUERIES["q_cdc_apply"](spark, SF))
    assert plan.count(") Exchange") == 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_snapshot_diff_is_join_not_cartesian(spark):
    """Reconciliation must be a keyed full-outer join — never a
    cartesian compare."""
    plan = plan_of(QUERIES["q_snapshot_diff"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "FullOuter" in plan, plan


def test_rrf_fused_topk_uses_window_group_limit(spark):
    """The fused top-K must benefit from WindowGroupLimit (map-side
    rank pruning before the final filter)."""
    plan = plan_of(QUERIES["ann_rrf_hybrid"](spark, SF))
    assert "WindowGroupLimit" in plan, plan


def test_bitmap_algebra_shuffles_bitmaps_not_ids(spark):
    """Every aggregation in the overlap plan is a partial-aggregated
    bitmap fold — the shuffle carries bitmap_construct_agg /
    bitmap_or_agg state, never raw user ids."""
    plan = plan_of(QUERIES["q_bitmap_set_algebra"](spark, SF))
    assert "bitmap_construct_agg" in plan
    assert "bitmap_or_agg" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_attribution_joins_on_user_key(spark):
    """The lookback join must be keyed on the user equi-part (SMJ or
    shuffled hash on user), with the time window as a join filter —
    never a cartesian or pure-BNL plan."""
    plan = plan_of(QUERIES["q_attribution_linear"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "c_user" in plan and "t_user" in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_new_analytics_plans_are_scale_shaped(spark):
    """r05 analytics additions: pruned scans, broadcast side tables,
    no Python eval anywhere."""
    # regression reads only its three order columns
    plan = plan_of(QUERIES["q_regr_trend"](spark, SF))
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "o_orderstatus" not in read and "o_orderpriority" not in read
    assert "BroadcastHashJoin" in plan  # customer dim broadcasts
    # market basket: support joins broadcast; no cartesian anywhere
    plan = plan_of(QUERIES["q_market_basket"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # checksum: single shuffle on the group key, no sort before agg
    plan = plan_of(QUERIES["q_table_checksum"](spark, SF))
    assert "CartesianProduct" not in plan
    for name in (
        "q_market_basket",
        "q_regr_trend",
        "q_pareto_abc",
        "q_rfm_segmentation",
        "q_skew_salted_join",
        "q_k_anonymity",
        "graph_triangle_count",
        "q_table_checksum",
        "text_char_entropy",
        "corpus_mix_epochs",
        "q_unpivot",
    ):
        p = plan_of(QUERIES[name](spark, SF))
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in p, f"{name} plan contains {marker}"


# ---- r08 batch plan shapes ----


def test_pvm_year_filter_pushed(spark):
    """The two-year window must reach the lineitem scan as
    PushedFilters — at 100 TB the bridge reads 2 years, not 7."""
    plan = plan_of(QUERIES["q_price_volume_mix"](spark, SF))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "GreaterThanOrEqual" in pushed and "LessThan" in pushed, pushed


def test_inventory_and_stockout_push_year_and_broadcast_part(spark):
    for key in ("q_inventory_turns", "q_stockout_risk"):
        plan = plan_of(QUERIES[key](spark, SF))
        # several scans (partsupp derivation + demand); the YEAR
        # filter must be pushed on at least one of them
        pushed_blocks = [
            seg.split("]", 1)[0]
            for seg in plan.split("PushedFilters: [")[1:]
        ]
        assert pushed_blocks, key
        assert any(
            "GreaterThanOrEqual" in b for b in pushed_blocks
        ), (key, pushed_blocks)
        assert "BroadcastHashJoin" in plan, key


def test_daily_grid_windows_are_single_exchange_family(spark):
    """The drawdown/channel/RSI/WMA family pre-aggregates to the day
    grid then windows: exactly one fact aggregation exchange plus the
    single-partition window exchange — a third exchange would mean
    the window leaked onto raw events."""
    for key in (
        "q_drawdown",
        "q_donchian_channel",
        "q_rsi_sma",
        "q_weighted_moving_avg",
    ):
        plan = plan_of(QUERIES[key](spark, SF))
        n_exchange = plan.count("Exchange")
        assert n_exchange <= 4, (key, n_exchange)  # formatted repeats refs
        for marker in ("BatchEvalPython", "ArrowEvalPython"):
            assert marker not in plan, key


def test_stats_suite_scans_events_once(spark):
    """Sufficient-statistics tests must be one scan + one tiny agg:
    no join back to the fact, no Python eval."""
    for key in ("q_jarque_bera", "q_grubbs_outlier", "q_cramers_v"):
        plan = plan_of(QUERIES[key](spark, SF))
        assert "SortMergeJoin" not in plan, key
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan, key


def test_duplicate_invoice_prunes_columns(spark):
    """The audit reads 3 order columns; priority/status must prune."""
    plan = plan_of(QUERIES["q_duplicate_invoice_detect"](spark, SF))
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    for used in ("o_custkey", "o_orderdate", "o_totalprice"):
        assert used in read, read
    for unused in ("o_orderpriority", "o_orderstatus"):
        assert unused not in read, read


def test_concentration_broadcasts_dims(spark):
    for key in ("q_customer_concentration", "q_share_nested"):
        plan = plan_of(QUERIES[key](spark, SF))
        assert "BroadcastHashJoin" in plan, key
        assert "CartesianProduct" not in plan, key


def test_forecast_family_is_grid_shaped(spark):
    """The forecast/experimentation family touches the fact stream
    with ONE conditional-sum groupBy, densifies on a broadcast spine,
    and runs every window on the O(days) grid: no sort-merge join, no
    cartesian, no Python eval anywhere in the family."""
    for key in (
        "q_dickey_fuller",
        "q_granger_lag1",
        "q_backtest_seasonal_naive",
        "q_cross_correlation",
        "q_fdr_bh",
    ):
        plan = plan_of(QUERIES[key](spark, SF))
        assert "SortMergeJoin" not in plan, key
        assert "CartesianProduct" not in plan, key
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan, key


def test_cuped_is_rollup_plus_scalar_bounds(spark):
    """CUPED's only join is the 1-row span-bounds broadcast (the
    scalar-subquery idiom); the per-user rollup must not sort-merge."""
    plan = plan_of(QUERIES["q_cuped_adjustment"](spark, SF))
    assert "SortMergeJoin" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_geo_pair_joins_are_cell_keyed_not_cartesian(spark):
    """The geo pair generators must join on grid-cell keys (SMJ/BHJ)
    — a CartesianProduct would mean the 9-cell blocking leaked. The
    only nested-loop allowed is the 1-row radius scalar."""
    for key in ("geo_knn_join", "geo_dbscan_grid"):
        plan = plan_of(QUERIES[key](spark, SF))
        assert "CartesianProduct" not in plan, key
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan, key
