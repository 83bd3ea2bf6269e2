"""Semantic properties for the r05 batch-2 operators: winnowing
guarantees, interval-coalesce island invariants, WCC vs union-find,
Welch/OLS statistical sanity, binary-dedup accounting.

The exact-value cross-engine check is tests/test_correctness.py's
mirror; these tests pin the ALGORITHMIC contracts the hash can't see
(density guarantees, island disjointness, component transitivity)."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_city_directories_spark.operators.analytics import graph_wcc, _oriented_graph
from etl_city_directories_spark.operators.dedup import (
    WINNOW_K,
    WINNOW_W,
    _WINNOW_POS_BASE,
    text_winnowing,
)
from etl_city_directories_spark.operators.multimodal import mm_dedup_bytes
from etl_city_directories_spark.operators.stats import (
    q_ols_two_feature,
    q_welch_ttest,
)
from etl_city_directories_spark.operators.temporal import (
    COALESCE_LEASE_US,
    q_interval_coalesce,
)

SF = "/root/testdata/sf0.01"
SF_TINY = "/root/testdata/sf0.001"


# --- text_winnowing -------------------------------------------------


def test_winnowing_density_and_gap_guarantee(spark):
    """Winnowing's paper guarantees: every doc with >= w windows emits
    >= 1 fingerprint, and the count never exceeds the window count
    (one selection per window, dedup only shrinks)."""
    rows = text_winnowing(spark, SF).collect()
    assert rows, "corpus should produce fingerprints"
    for r in rows:
        n_windows = r.n_grams - WINNOW_W + 1
        assert n_windows >= 1
        assert 1 <= r.n_fingerprints <= n_windows
        # expected density is 2/(w+1); allow a loose upper band
        assert r.n_fingerprints <= r.n_grams


def test_winnowing_shared_substring_shares_fingerprint(spark):
    """The local-match guarantee: two docs sharing a >= k+w-1 char run
    (after alnum normalization) share at least one selected hash.
    Exact-duplicate documents are guaranteed such a run."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    norm = F.regexp_replace(F.lower("text"), "[^a-z0-9]", "")
    dupes = (
        docs.select("doc_id", F.md5(norm).alias("h"), F.length(norm).alias("l"))
        .filter(F.col("l") >= WINNOW_K + WINNOW_W - 1)
        .groupBy("h")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
        .collect()
    )
    if not dupes:
        return  # corpus variant without exact dups: property vacuous
    fps = {}
    for r in text_winnowing(spark, SF).collect():
        fps[r.doc_id] = (r.min_hash, r.max_hash, r.n_fingerprints)
    for grp in dupes:
        first = fps.get(grp.ids[0])
        for other in grp.ids[1:]:
            assert fps.get(other) == first, grp


def test_winnowing_pack_roundtrip():
    """The (hash, pos) packing decodes losslessly for the full ranges."""
    for h in (0, 1, (1 << 20) - 1):
        for p in (1, 7, (1 << 20)):
            key = h * _WINNOW_POS_BASE + (_WINNOW_POS_BASE - p)
            assert key // _WINNOW_POS_BASE == h
            assert _WINNOW_POS_BASE - (key % _WINNOW_POS_BASE) == p


# --- q_interval_coalesce --------------------------------------------


def test_interval_coalesce_islands_disjoint_and_cover(spark):
    rows = q_interval_coalesce(spark, SF_TINY).collect()
    ev = (
        spark.read.parquet(f"{SF_TINY}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per_user_events = {r.user_id: r.n for r in ev}
    seen: dict[int, list] = {}
    for r in rows:
        assert r.island_end_us - r.island_start_us >= COALESCE_LEASE_US
        seen.setdefault(r.user_id, []).append(r)
    for uid, islands in seen.items():
        islands.sort(key=lambda r: r.island)
        # islands are strictly separated: next start > previous end
        for a, b in zip(islands, islands[1:]):
            assert b.island_start_us > a.island_end_us, (uid, a, b)
        # every event lands in exactly one island
        assert sum(r.n_events for r in islands) == per_user_events[uid]


# --- graph_wcc ------------------------------------------------------


def test_wcc_matches_union_find(spark):
    edges, _, _, _ = _oriented_graph(spark, SF)
    edge_rows = edges.collect()
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in edge_rows:
        ra, rb = find(r.part_a), find(r.part_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_sizes: dict[int, int] = {}
    comp_max: dict[int, int] = {}
    for node in parent:
        root = find(node)
        comp_sizes[root] = comp_sizes.get(root, 0) + 1
        comp_max[root] = max(comp_max.get(root, 0), node)
    got = {
        r.component: (r.n_nodes, r.max_node)
        for r in graph_wcc(spark, SF).collect()
    }
    assert got == {c: (comp_sizes[c], comp_max[c]) for c in comp_sizes}


# --- q_welch_ttest / q_ols_two_feature ------------------------------


def test_welch_matches_scipy_formula(spark):
    import math

    row = q_welch_ttest(spark, SF).collect()[0]
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    vals = {
        seg: [
            float(r.o_totalprice)
            for r in j.filter(F.col("c_mktsegment") == seg)
            .select("o_totalprice")
            .collect()
        ]
        for seg in ("BUILDING", "MACHINERY")
    }
    a, b = vals["BUILDING"], vals["MACHINERY"]
    assert row.n_a == len(a) and row.n_b == len(b)

    def mean(x):
        return sum(x) / len(x)

    def var(x):
        m = mean(x)
        return sum((v - m) ** 2 for v in x) / (len(x) - 1)

    se2 = var(a) / len(a) + var(b) / len(b)
    t = (mean(a) - mean(b)) / math.sqrt(se2)
    assert abs(row.t_stat - t) < 1e-3
    assert row.significant_5pct == (abs(t) > 1.96)


def test_ols_two_feature_normal_equations(spark):
    """Residuals of the fitted plane are orthogonal to [1, x1, x2] —
    the defining property of least squares — verified numerically on
    the tiny SF, and R² lands in [0, 1]."""
    row = q_ols_two_feature(spark, SF_TINY).collect()[0]
    li = (
        spark.read.parquet(f"{SF_TINY}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("x1"),
            F.count(F.lit(1)).alias("x2"),
        )
    )
    orders = spark.read.parquet(f"{SF_TINY}/orders.parquet").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("y"),
    )
    data = li.join(orders, li.l_orderkey == orders.o_orderkey).collect()
    b0 = row.intercept_dollars * 100
    b1 = row.beta_qty
    b2 = row.beta_items_dollars * 100
    n = len(data)
    resid = [(r.y - (b0 + b1 * r.x1 + b2 * r.x2)) for r in data]
    ybar = sum(r.y for r in data) / n
    # gradient of SSE w.r.t. each coefficient ~ 0 (relative to scale)
    scale = sum(abs(r.y - ybar) for r in data)
    assert abs(sum(resid)) / scale < 1e-6
    assert abs(sum(e * r.x1 for e, r in zip(resid, data))) / (
        scale * max(r.x1 for r in data)
    ) < 1e-6
    assert abs(sum(e * r.x2 for e, r in zip(resid, data))) / (
        scale * max(r.x2 for r in data)
    ) < 1e-6
    assert 0.0 <= row.r_squared <= 1.0
    assert row.n_orders == n


# --- mm_dedup_bytes -------------------------------------------------


def test_mm_dedup_bytes_accounting(spark):
    rows = {r.modality: r for r in mm_dedup_bytes(spark, SF).collect()}
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert set(rows) == {"audio", "image", "video"}
    for r in rows.values():
        assert r.n_payloads == n_docs
        assert r.n_distinct <= r.n_payloads
        assert r.bytes_dedup <= r.bytes_total
        # dup groups exist iff dedup saves bytes
        assert (r.n_dup_groups > 0) == (r.n_distinct < r.n_payloads)


# --- batch 3: BPE coverage, KN LM, langid audit, Brown smoothing, band join


def test_bpe_vocab_coverage_mass_conservation(spark):
    from etl_city_directories_spark.operators.textstats import (
        _BPE_RE,
        bpe_vocab_coverage,
    )

    rows = bpe_vocab_coverage(spark, SF).collect()
    total_share = sum(r.token_share for r in rows)
    assert abs(total_share - 1.0) < 1e-4
    n_tokens = sum(r.n_tokens for r in rows)
    corpus_tokens = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            F.explode(
                F.regexp_extract_all(
                    F.trim(F.regexp_replace(F.lower("text"), " +", " ")),
                    F.lit(_BPE_RE),
                    0,
                )
            ).alias("w")
        )
        .count()
    )
    assert n_tokens == corpus_tokens
    # every word carries the end-of-word marker symbol, so >= 2 unless
    # fully merged INTO the marker (impossible in 8 rounds for len>1)
    assert min(r.n_symbols for r in rows) >= 1


def test_kneser_ney_probabilities_sum_to_one(spark):
    """KN's defining invariant: for any context w1, P(.|w1) sums to 1
    over the vocabulary — verified by local replay on the collected
    bigram tables for the highest-frequency context."""
    from etl_city_directories_spark.operators.dedup import norm_col
    from etl_city_directories_spark.operators.textstats import (
        KN_DISCOUNT,
        _words,
        text_kneser_ney_logprob,
    )

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    toks = docs.select(
        "doc_id", F.posexplode(_words(norm_col())).alias("pos", "w")
    ).collect()
    by_doc: dict[int, list] = {}
    for r in toks:
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.w))
    from collections import Counter

    big = Counter()
    for _doc, seq in by_doc.items():
        seq.sort()
        for (p1, w1), (p2, w2) in zip(seq, seq[1:]):
            big[(w1, w2)] += 1
    ctx = Counter()
    n_after = Counter()
    n_before = Counter()
    for (w1, w2), c in big.items():
        ctx[w1] += c
        n_after[w1] += 1
        n_before[w2] += 1
    b_types = len(big)
    w1 = ctx.most_common(1)[0][0]
    total = 0.0
    for w2 in n_before:  # all words with continuation mass
        c12 = big.get((w1, w2), 0)
        p = max(c12 - KN_DISCOUNT, 0.0) / ctx[w1] + (
            KN_DISCOUNT * n_after[w1] / ctx[w1]
        ) * (n_before[w2] / b_types)
        total += p
    assert abs(total - 1.0) < 1e-9

    rows = text_kneser_ney_logprob(spark, SF_TINY).collect()
    assert all(r.mean_kn_surprisal >= 0 for r in rows)
    assert {r.doc_id for r in rows} <= set(by_doc)


def test_langid_confusion_marginals(spark):
    from etl_city_directories_spark.operators.textstats import (
        text_langid_confusion,
    )

    rows = text_langid_confusion(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    by_actual: dict[str, float] = {}
    for r in rows:
        by_actual[r.actual_lang] = by_actual.get(r.actual_lang, 0.0) + r.row_share
        assert r.is_correct == (r.actual_lang == r.pred_lang)
    for share in by_actual.values():
        assert abs(share - 1.0) < 1e-3


def test_double_ewma_first_day_degenerates(spark):
    """With one observation, S1 = S2 = the observation, so trend = 0
    and forecast = level = s1."""
    from etl_city_directories_spark.operators.stats import q_double_ewma_trend

    rows = q_double_ewma_trend(spark, SF_TINY).collect()
    first = {}
    for r in rows:
        if r.event_type not in first or r.day < first[r.event_type].day:
            first[r.event_type] = r
    for r in first.values():
        assert r.n_obs == 1
        assert abs(r.s1 - r.s2) < 1e-9
        assert abs(r.trend_per_day) < 1e-9
        assert abs(r.forecast_next - r.level) < 1e-9
        assert abs(r.level - r.s1) < 1e-9


def test_band_join_matches_bruteforce(spark):
    from etl_city_directories_spark.operators.temporal import (
        BAND_US,
        q_band_join_bucketed,
    )

    ev = (
        spark.read.parquet(f"{SF_TINY}/events.parquet")
        .select("event_type", "user_id", "event_id", "ts")
        .collect()
    )
    from collections import defaultdict

    by_type = defaultdict(list)
    for r in ev:
        by_type[r.event_type].append(r)
    expect = {}
    for t, rows_t in by_type.items():
        gaps = []
        rows_t.sort(key=lambda r: r.ts)
        for i, a in enumerate(rows_t):
            for b in rows_t[i + 1 :]:
                d_us = int((b.ts - a.ts).total_seconds() * 1_000_000)
                if d_us > BAND_US:
                    break
                if a.user_id != b.user_id and a.event_id != b.event_id:
                    gaps.append(abs(d_us))
        if gaps:
            expect[t] = (len(gaps), min(gaps), max(gaps))
    got = {
        r.event_type: (r.n_pairs, r.min_gap_us, r.max_gap_us)
        for r in q_band_join_bucketed(spark, SF_TINY).collect()
    }
    assert got == expect


# --- batch 4: golden record, recall@k, Neyman allocation, Markov


def test_golden_record_is_cluster_member_with_max_balance(spark):
    from etl_city_directories_spark.operators.linkage import (
        er_golden_record,
        er_match_clusters,
    )

    clusters = {r.entity_id: r for r in er_match_clusters(spark, SF).collect()}
    golden = {r.entity_id: r for r in er_golden_record(spark, SF).collect()}
    assert set(golden) == set(clusters)
    cust = {
        r.c_custkey: float(r.c_acctbal)
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    for eid, g in golden.items():
        c = clusters[eid]
        assert g.n_records == c.n_records
        assert c.min_key <= g.golden_custkey <= c.max_key
        assert abs(cust[g.golden_custkey] - g.golden_acctbal) < 0.005


def test_recall_at_k_bounds_and_truth_size(spark):
    from etl_city_directories_spark.operators.similarity import (
        N_PROBES,
        TOP_K,
        emb_recall_at_k,
    )

    rows = emb_recall_at_k(spark, SF).collect()
    assert len(rows) == N_PROBES
    for r in rows:
        assert r.k == TOP_K
        assert 0 <= r.n_recovered <= r.k
        assert abs(r.recall_at_k - r.n_recovered / r.k) < 1e-9
    # the IVF index should be a usable index, not a random bucketizer
    # (0.40 = the established nprobe=2-of-8-cells bar from
    # tests/test_dedup_quality.py::test_ann_ivf_kmeans_recall_vs_bruteforce)
    mean_recall = sum(r.recall_at_k for r in rows) / len(rows)
    assert mean_recall >= 0.40


def test_neyman_allocation_budget_and_proportionality(spark):
    from etl_city_directories_spark.operators.curation import (
        NEYMAN_BUDGET,
        sample_neyman_allocation,
    )

    rows = sample_neyman_allocation(spark, SF).collect()
    assert abs(sum(r.alloc_share for r in rows) - 1.0) < 1e-3
    total = sum(r.n_alloc for r in rows)
    # floor() loses at most one unit per stratum
    assert NEYMAN_BUDGET - len(rows) <= total <= NEYMAN_BUDGET
    # allocation ordering follows N_h * sd_h ordering
    by_w = sorted(rows, key=lambda r: r.n_docs * r.sd_chars)
    shares = [r.alloc_share for r in by_w]
    assert shares == sorted(shares)


def test_markov_stationary_mass_and_fixpointness(spark):
    from etl_city_directories_spark.operators.temporal import (
        MARKOV_MICRO,
        q_markov_stationary,
    )

    rows = q_markov_stationary(spark, SF).collect()
    total = sum(r.stationary_micro for r in rows)
    # integer truncation only ever loses micro-units, never creates
    assert total <= MARKOV_MICRO
    assert total >= MARKOV_MICRO - 10_000  # <=1% truncation loss
    for r in rows:
        assert 0 <= r.stationary <= 1


# --- batch 5: PQ distortion, drift monitor, power planning, new-vs-returning


def test_pq_distortion_nonnegative_and_complete(spark):
    from etl_city_directories_spark.operators.similarity import (
        M_SUB,
        emb_pq_distortion,
    )

    rows = emb_pq_distortion(spark, SF).collect()
    assert len(rows) == M_SUB
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    for r in rows:
        assert r.n_vecs == n_vecs
        assert r.mse >= 0
    # quantization must beat the trivial all-zero codebook: MSE well
    # below the mean squared subvector norm
    assert max(r.mse for r in rows) < 4.0


def test_drift_monitor_split_and_bounds(spark):
    from etl_city_directories_spark.operators.similarity import emb_drift_monitor

    rows = emb_drift_monitor(spark, SF).collect()
    total = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r.n_ref + r.n_cur for r in rows) == total
    for r in rows:
        # cosine is a valid cosine; the synthetic labels are NOT
        # directionally clustered, so near-zero values are correct
        # (random halves of an isotropic cloud have ~orthogonal means)
        assert -1.0 <= r.centroid_cosine <= 1.0
        # parity split of a label's members should not skew wildly
        assert 0.5 < r.population_ratio < 2.0


def test_power_mde_consistency(spark):
    import math

    from etl_city_directories_spark.operators.stats import (
        POWER_TARGET_REL,
        POWER_Z_ALPHA,
        POWER_Z_BETA,
        q_ab_power_mde,
    )

    r = q_ab_power_mde(spark, SF).collect()[0]
    assert 0 < r.p_pool < 1
    z = POWER_Z_ALPHA + POWER_Z_BETA
    mde = z * math.sqrt(2 * r.p_pool * (1 - r.p_pool) / r.n_a)
    assert abs(r.mde_abs - mde) < 1e-4
    assert abs(r.mde_rel - mde / r.p_pool) < 1e-3
    n_req = math.ceil(
        z * z * 2 * r.p_pool * (1 - r.p_pool)
        / (POWER_TARGET_REL * r.p_pool) ** 2
    )
    assert abs(r.n_per_arm_for_2pct - n_req) <= 1
    # detecting a 2% uplift needs more users than one MDE-now arm
    # whenever the current MDE exceeds 2% relative
    if r.mde_rel > POWER_TARGET_REL:
        assert r.n_per_arm_for_2pct > r.n_a


def test_new_vs_returning_conservation(spark):
    from etl_city_directories_spark.operators.windows import q_new_vs_returning

    rows = q_new_vs_returning(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    # every user is new exactly once
    assert sum(r.n_new for r in rows) == n_users
    assert all(r.n_active == r.n_new + r.n_returning for r in rows)
    # day 1 has no possible returners
    assert rows[0].n_returning == 0


# --- batch 6: streaming first-seen, lift curve, fulfillment latency


def test_stream_new_vs_returning_matches_batch_twin(spark):
    """The streaming classification must agree with a batch replay of
    the same purchase-scoped first-seen logic."""
    from etl_city_directories_spark.streaming.stream_ops import (
        stream_new_vs_returning,
    )

    got = {
        r.epoch_day: (r.n_active, r.n_new, r.n_returning)
        for r in stream_new_vs_returning(spark, SF).collect()
    }
    from etl_city_directories_spark.sources.tables import load_table

    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day")
        )
        .distinct()
    )
    from pyspark.sql import Window as W

    marked = ev.select(
        "day", (F.col("day") == F.min("day").over(W.partitionBy("user_id"))).alias("nw")
    )
    exp = {
        r.day: (r.a, r.n, r.a - r.n)
        for r in marked.groupBy("day")
        .agg(F.count(F.lit(1)).alias("a"), F.sum(F.col("nw").cast("int")).alias("n"))
        .collect()
    }
    assert got == exp


def test_decile_lift_monotone_and_normalized(spark):
    from etl_city_directories_spark.operators.analytics import (
        q_decile_lift_curve,
    )

    rows = q_decile_lift_curve(spark, SF).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    shares = [r.cum_revenue_share for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-6
    assert abs(rows[-1].cum_lift - 1.0) < 1e-6
    # top decile of spenders must over-index
    assert rows[0].cum_lift > 1.0
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust


def test_fulfillment_latency_percentile_order(spark):
    from etl_city_directories_spark.operators.analytics import (
        q_fulfillment_latency,
    )

    rows = q_fulfillment_latency(spark, SF).collect()
    # only orders with at least one line item have a ship latency
    n_shippable = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert sum(r.n_orders for r in rows) == n_shippable
    for r in rows:
        assert r.min_days <= r.median_days <= r.p90_days <= r.max_days


# --- batch 7: PSI drift, XYZ classes, YoY growth


def test_psi_terms_sum_and_share_normalization(spark):
    from etl_city_directories_spark.operators.stats import q_psi_drift

    rows = q_psi_drift(spark, SF).collect()
    assert len(rows) == 10
    assert abs(sum(r.p_ref for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.p_cur for r in rows) - 1.0) < 1e-3
    # psi_total is the same on every row and equals the term sum
    totals = {r.psi_total for r in rows}
    assert len(totals) == 1
    assert abs(sum(r.psi_term for r in rows) - rows[0].psi_total) < 1e-4
    # PSI is non-negative up to per-term rounding slack
    assert rows[0].psi_total >= -1e-6
    # stationary synthetic stream: drift must be tiny
    assert rows[0].psi_total < 0.25


def test_xyz_partition_of_parts(spark):
    from etl_city_directories_spark.operators.analytics import (
        q_xyz_variability,
    )

    rows = q_xyz_variability(spark, SF).collect()
    n_parts = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r.n_parts for r in rows) == n_parts
    assert {r.xyz_class for r in rows} <= {"X", "Y", "Z"}


def test_yoy_growth_replays_locally(spark):
    from etl_city_directories_spark.operators.analytics import q_yoy_growth

    rows = q_yoy_growth(spark, SF_TINY).collect()
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    for seg, rs in by_seg.items():
        rs.sort(key=lambda r: r.yr)
        assert rs[0].yoy_growth is None
        for prev, cur in zip(rs, rs[1:]):
            expect = (cur.revenue - prev.revenue) / prev.revenue
            assert abs(cur.yoy_growth - expect) < 1e-3, (seg, cur.yr)


# --- batch 8: weighted median, lexical diversity, Zipf, byte entropy


def test_weighted_median_local_replay(spark):
    from etl_city_directories_spark.operators.windows import q_weighted_median

    got = {
        r.l_returnflag: r.weighted_median_price
        for r in q_weighted_median(spark, SF_TINY).collect()
    }
    li = spark.read.parquet(f"{SF_TINY}/lineitem.parquet").collect()
    from collections import defaultdict

    groups = defaultdict(list)
    for r in li:
        groups[r.l_returnflag].append(
            (round(float(r.l_extendedprice) * 100), round(float(r.l_quantity) * 100))
        )
    for flag, rows_g in groups.items():
        rows_g.sort()
        total = sum(w for _, w in rows_g)
        cum = 0
        for price, w in rows_g:
            cum += w
            if 2 * cum >= total:
                assert abs(got[flag] - price / 100) < 0.005, flag
                break


def test_lexical_diversity_bounds(spark):
    from etl_city_directories_spark.operators.textstats import (
        text_lexical_diversity,
    )

    rows = text_lexical_diversity(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 < r.ttr <= 1.0
        assert 0 <= r.hapax_share <= 1.0
        assert 0 < r.top_word_mass <= 1.0
        assert r.n_types <= r.n_tokens


def test_zipf_slope_negative(spark):
    from etl_city_directories_spark.operators.textstats import text_zipf_slope

    r = text_zipf_slope(spark, SF).collect()[0]
    vocab = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            F.explode(
                F.split(
                    F.trim(F.regexp_replace(F.lower("text"), " +", " ")), " "
                )
            ).alias("w")
        )
        .distinct()
        .count()
    )
    assert r.n_ranks == min(100, vocab)
    # frequency decreases with rank in ANY corpus with a rank tiebreak
    assert r.zipf_slope < 0


def test_payload_entropy_bounds(spark):
    from etl_city_directories_spark.operators.multimodal import (
        mm_payload_entropy,
    )

    rows = mm_payload_entropy(spark, SF).collect()
    assert {r.modality for r in rows} == {"audio", "image", "video"}
    for r in rows:
        assert 0 <= r.entropy_bits <= 8.0 + 1e-6
        assert 1 <= r.n_distinct_bytes <= 256
        # md5-stream payloads should look near-uniform, headers aside
        assert r.entropy_bits > 6.0


# --- batch 9: degree distribution, funnel latency, streaming distinct


def test_degree_distribution_conservation(spark):
    from etl_city_directories_spark.operators.analytics import (
        _oriented_graph,
        graph_degree_distribution,
    )

    rows = graph_degree_distribution(spark, SF).collect()
    edges, _, _, n_edges = _oriented_graph(spark, SF)
    # handshake lemma: sum(degree * n_nodes) = 2|E|
    assert sum(r.degree * r.n_nodes for r in rows) == 2 * n_edges
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    # cumulative-from-top ends at 1 on the smallest degree
    assert abs(rows[-1].cum_share_from_top - 1.0) < 1e-6


def test_funnel_latency_agrees_with_funnel_counts(spark):
    from etl_city_directories_spark.operators.analytics import (
        q_funnel_time_percentiles,
    )
    from etl_city_directories_spark.operators.temporal import q_funnel

    lat = {r.step: r for r in q_funnel_time_percentiles(spark, SF).collect()}
    fun = q_funnel(spark, SF).collect()[0]
    assert lat["signup_to_click"].n_users == fun.n_click_after
    assert lat["click_to_purchase"].n_users == fun.n_purchase_after
    for r in lat.values():
        assert r.min_s <= r.median_s <= r.p90_s <= r.max_s
        assert r.min_s > 0  # strictly-after semantics


def test_stream_windowed_distinct_matches_batch(spark):
    from etl_city_directories_spark.sources.tables import load_table
    from etl_city_directories_spark.streaming.stream_ops import (
        stream_windowed_distinct_users,
    )

    got = {
        r.bucket_start_us: r.n_distinct_users
        for r in stream_windowed_distinct_users(spark, SF).collect()
    }
    exp = {
        r.b: r.n
        for r in load_table(spark, SF, "events")
        .select(
            F.unix_micros(F.date_trunc("hour", "ts")).alias("b"), "user_id"
        )
        .groupBy("b")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exp


# --- batch 10: frame motion, top movers, group k-fold


def test_frame_motion_covers_all_videos(spark):
    from etl_city_directories_spark.operators.multimodal import (
        mm_frame_motion,
        videos_table,
    )

    rows = mm_frame_motion(spark, SF_TINY).collect()
    n_multi = videos_table(spark, SF_TINY).filter(
        (F.length("payload") - 12) / 24 >= 2
    ).count()
    assert len(rows) == n_multi
    for r in rows:
        assert r.n_frames >= 2
        assert 0 <= r.mean_motion <= 255
        assert 0 <= r.max_pair_delta <= 255 * 24
        # max pair >= mean per-pair total
        assert r.max_pair_delta >= r.mean_motion * 24 - 1e-6


def test_frame_motion_matches_python_decode(spark):
    """Byte-exact against a local numpy decode of the same payloads."""
    import numpy as np

    from etl_city_directories_spark.operators.multimodal import (
        mm_frame_motion,
        videos_table,
    )

    got = {r.doc_id: r for r in mm_frame_motion(spark, SF_TINY).collect()}
    for doc_id, payload in (
        videos_table(spark, SF_TINY).limit(50).collect()
    ):
        payload = bytes(payload)
        nf = int.from_bytes(payload[4:8], "big")
        if nf < 2:
            continue
        frames = np.frombuffer(payload[12:], dtype=np.uint8).reshape(nf, 24)
        deltas = np.abs(
            frames[1:].astype(int) - frames[:-1].astype(int)
        ).sum(axis=1)
        r = got[doc_id]
        assert r.max_pair_delta == int(deltas.max())
        assert abs(r.mean_motion - deltas.sum() / ((nf - 1) * 24)) < 5e-5


def test_top_movers_are_global_maxima(spark):
    from etl_city_directories_spark.operators.analytics import q_top_movers

    rows = q_top_movers(spark, SF_TINY).collect()
    assert len(rows) <= 10
    deltas = [abs(r.delta_qty) for r in rows]
    assert deltas == sorted(deltas, reverse=True)


def test_group_kfold_no_leakage(spark):
    from etl_city_directories_spark.operators.curation import (
        GROUP_KFOLD_K,
        sample_group_kfold,
    )
    from etl_city_directories_spark.sources.tables import load_table

    rows = sample_group_kfold(spark, SF).collect()
    ev = load_table(spark, SF, "events")
    assert sum(r.n_events for r in rows) == ev.count()
    assert sum(r.n_users for r in rows) == ev.select("user_id").distinct().count()
    assert len(rows) <= GROUP_KFOLD_K
    # leakage-free by construction: fold is a function of user_id only;
    # verify on a sample of users
    import hashlib

    for u in [r.user_id for r in ev.select("user_id").distinct().limit(20).collect()]:
        expected_fold = int(hashlib.md5(str(u).encode()).hexdigest()[:4], 16) % GROUP_KFOLD_K
        assert 0 <= expected_fold < GROUP_KFOLD_K


# --- batch 11: survival, elasticity, blocking quality


def test_km_survival_monotone_and_risk_decreasing(spark):
    from etl_city_directories_spark.operators.stats import q_survival_km

    rows = q_survival_km(spark, SF_TINY).collect()
    assert rows
    prev_ls, prev_risk = 0.0, None
    for r in rows:
        assert 0 < r.hazard <= 1
        if prev_risk is not None:
            assert r.n_at_risk < prev_risk  # strictly fewer at risk
        prev_risk = r.n_at_risk
        if r.log_survival is not None:
            assert r.log_survival <= prev_ls + 1e-9  # survival only drops
            prev_ls = r.log_survival
    # KM identity on the first event time: log S = ln(1 - d/n)
    import math

    first = rows[0]
    assert abs(
        first.log_survival
        - math.log(1 - first.d_events / first.n_at_risk)
    ) < 1e-4


def test_elasticity_slope_sign_and_groups(spark):
    from etl_city_directories_spark.operators.stats import q_elasticity_loglog

    rows = q_elasticity_loglog(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        # ln(qty) regressed on ln(price/qty): mechanically negative
        # (qty appears on both sides) — the sanity direction check
        assert r.elasticity < 0
        assert r.n_lines > 0


def test_blocking_quality_bounds(spark):
    from etl_city_directories_spark.operators.linkage import (
        er_blocking_quality,
    )

    rows = er_blocking_quality(spark, SF).collect()
    for r in rows:
        assert 0 <= r.n_caught <= r.n_true
        assert r.n_candidates <= r.n_total_pairs
        assert 0 <= r.reduction_ratio <= 1
        if r.pairs_completeness is not None:
            assert 0 <= r.pairs_completeness <= 1


# --- batch 12: audio silence, segment migration, Heaps' law


def test_audio_silence_matches_python_decode(spark):
    from etl_city_directories_spark.operators.multimodal import (
        AUDIO_SILENCE_BELOW,
        audio_table,
        mm_audio_silence,
    )

    got = {r.doc_id: r for r in mm_audio_silence(spark, SF_TINY).collect()}
    for doc_id, payload in audio_table(spark, SF_TINY).limit(50).collect():
        payload = bytes(payload)
        samples = payload[12:]
        quiet = [i for i, b in enumerate(samples) if b < AUDIO_SILENCE_BELOW]
        longest = cur = 0
        prev = None
        for i in quiet:
            cur = cur + 1 if prev is not None and i == prev + 1 else 1
            longest = max(longest, cur)
            prev = i
        r = got[doc_id]
        assert r.n_samples == len(samples)
        assert r.n_quiet == len(quiet)
        assert r.longest_quiet_run == longest


def test_segment_migration_conservation(spark):
    from etl_city_directories_spark.operators.analytics import (
        q_segment_migration,
    )

    rows = q_segment_migration(spark, SF).collect()
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    from collections import defaultdict

    by_from = defaultdict(float)
    for r in rows:
        by_from[r.from_tier] += r.row_share
        assert r.from_tier in {"1", "2", "3", "4", "5", "new"}
        assert r.to_tier in {"1", "2", "3", "4", "5", "lapsed"}
    for share in by_from.values():
        assert abs(share - 1.0) < 1e-3


def test_heaps_curve_monotone_and_totals(spark):
    from etl_city_directories_spark.operators.textstats import text_heaps_law

    rows = text_heaps_law(spark, SF).collect()
    vocab = rows[-1].cum_vocab
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    true_vocab = (
        docs.select(
            F.explode(
                F.split(F.trim(F.regexp_replace(F.lower("text"), " +", " ")), " ")
            ).alias("w")
        )
        .distinct()
        .count()
    )
    assert vocab == true_vocab
    for a, b in zip(rows, rows[1:]):
        assert b.cum_vocab >= a.cum_vocab
        assert b.cum_tokens > a.cum_tokens
        # marginal vocabulary rate decays (Heaps): weakly, allow ties
        assert b.vocab_per_token <= a.vocab_per_token + 1e-9


# --- batch 13: ANOVA, vocab overlap, assortativity


def test_anova_matches_local_computation(spark):
    from etl_city_directories_spark.operators.stats import q_anova_oneway

    r = q_anova_oneway(spark, SF_TINY).collect()[0]
    orders = spark.read.parquet(f"{SF_TINY}/orders.parquet")
    cust = spark.read.parquet(f"{SF_TINY}/customer.parquet")
    data = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment", "o_totalprice"
    ).collect()
    from collections import defaultdict

    groups = defaultdict(list)
    for row in data:
        groups[row.c_mktsegment].append(round(float(row.o_totalprice) * 100))
    n_total = sum(len(v) for v in groups.values())
    grand_mean = sum(sum(v) for v in groups.values()) / n_total
    ssb = sum(len(v) * (sum(v) / len(v) - grand_mean) ** 2 for v in groups.values())
    ssw = sum(sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values())
    k = len(groups)
    f_local = (ssb / (k - 1)) / (ssw / (n_total - k))
    assert r.k_groups == k and r.n_total == n_total
    assert abs(r.f_stat - f_local) / max(f_local, 1e-9) < 1e-3
    assert 0 <= r.eta_squared <= 1


def test_vocab_overlap_symmetric_complete(spark):
    from etl_city_directories_spark.operators.textstats import (
        text_source_vocab_overlap,
    )

    rows = text_source_vocab_overlap(spark, SF).collect()
    n_sources = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("source")
        .distinct()
        .count()
    )
    # upper triangle over sources that share at least one word: on a
    # same-generator corpus that's ALL pairs
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert 0 < r.jaccard <= 1
        assert r.n_common <= min(r.vocab_a, r.vocab_b)


def test_assortativity_in_valid_range(spark):
    from etl_city_directories_spark.operators.analytics import (
        _oriented_graph,
        graph_assortativity,
    )

    r = graph_assortativity(spark, SF).collect()[0]
    _, _, _, n_edges = _oriented_graph(spark, SF)
    assert r.n_edges == n_edges
    assert -1.0 <= r.assortativity <= 1.0


# --- batch 14: streaming z-score alerts, partition skew audit


def test_zscore_alerts_match_frozen_reference_replay(spark):
    from etl_city_directories_spark.sources.tables import load_table
    from etl_city_directories_spark.streaming.stream_ops import (
        ZSCORE_FLAG,
        stream_zscore_alerts,
    )

    got = {
        r.user_id: (r.n_scored, r.n_alerts)
        for r in stream_zscore_alerts(spark, SF_TINY).collect()
    }
    p = (
        load_table(spark, SF_TINY, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.unix_micros("ts").alias("t"),
            F.round(F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("c"),
        )
        .collect()
    )
    lo = min(r.t for r in p)
    hi = max(r.t for r in p)
    split = (lo + hi) // 2
    import math
    from collections import defaultdict

    ref = defaultdict(list)
    cur = defaultdict(list)
    for r in p:
        (ref if r.t < split else cur)[r.user_id].append(r.c)
    exp = {}
    for uid, later in cur.items():
        base = ref.get(uid, [])
        if len(base) < 2:
            continue
        n = len(base)
        mean = sum(base) / n
        var = sum(x * x for x in base) / n - mean * mean
        sd = math.sqrt(var) if var > 0 else 0.0
        alerts = sum(
            1 for c in later if sd > 0 and abs(c - mean) > ZSCORE_FLAG * sd
        )
        exp[uid] = (len(later), alerts)
    assert got == exp


def test_partition_skew_audit_sanity(spark):
    from etl_city_directories_spark.operators.scale_ops import (
        q_partition_skew_audit,
    )

    rows = q_partition_skew_audit(spark, SF).collect()
    assert len(rows) == 2
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    n_li = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    by_key = {r.partition_key: r for r in rows}
    assert by_key["orders.o_orderdate month"].n_rows == n_orders
    assert by_key["lineitem.l_shipdate month"].n_rows == n_li
    for r in rows:
        assert r.skew_factor >= 1.0
        assert 0 < r.max_share <= 1.0
        assert r.n_hot_partitions >= 0


# --- batch 15: growth accounting, ABC-XYZ, stickiness


def test_growth_accounting_bridge_identity(spark):
    from etl_city_directories_spark.operators.analytics import (
        q_growth_accounting,
    )

    rows = q_growth_accounting(spark, SF).collect()
    h1 = sum(r.h1_revenue for r in rows)
    h2 = sum(r.h2_revenue for r in rows)
    delta = sum(r.revenue_delta for r in rows)
    assert abs((h2 - h1) - delta) < 0.05
    classes = {r["class"] for r in rows}
    assert classes <= {"new", "churned", "expanded", "contracted", "flat"}
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust


def test_abc_xyz_matrix_partitions_parts(spark):
    from etl_city_directories_spark.operators.analytics import q_abc_xyz_matrix

    rows = q_abc_xyz_matrix(spark, SF).collect()
    n_parts = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r.n_parts for r in rows) == n_parts
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r.abc_class in "ABC" and r.xyz_class in "XYZ"


def test_stickiness_bounds_and_window(spark):
    from etl_city_directories_spark.operators.analytics import (
        q_dau_wau_stickiness,
    )

    rows = q_dau_wau_stickiness(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.dau <= r.wau
        assert 0 < r.stickiness <= 1.0


# --- batch 16: winnowing pairs, DiD


def test_winnowing_pairs_thresholds_and_determinism(spark):
    """Candidate contract: ordered pairs, evidence >= the threshold,
    and rerun-stable output. (The exact-dup structural guarantee holds
    WITHOUT the df cap; this corpus's tiny vocabulary drives most
    fingerprints past the cap, so the guarantee is asserted via the
    hash-checked oracle instead of a per-pair replay here.)"""
    from etl_city_directories_spark.operators.dedup import (
        WINNOW_MIN_SHARED,
        dedup_winnowing_pairs,
    )

    rows = dedup_winnowing_pairs(spark, SF).collect()
    assert rows, "dense corpus must produce candidates"
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.n_shared_fp >= WINNOW_MIN_SHARED
    again = dedup_winnowing_pairs(spark, SF).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_did_promo_identity(spark):
    from etl_city_directories_spark.operators.analytics import q_did_promo

    r = q_did_promo(spark, SF).collect()[0]
    did = (r.treated_h2 - r.treated_h1) - (r.control_h2 - r.control_h1)
    assert abs(r.did_abs - did) < 0.05
    counterfactual = r.treated_h1 + (r.control_h2 - r.control_h1)
    assert abs(r.did_rel - r.did_abs / counterfactual) < 1e-4


# --- batch 17: IVF balance, length percentiles


def test_ivf_balance_partition_of_corpus(spark):
    from etl_city_directories_spark.operators.similarity import (
        N_CELLS,
        emb_ivf_balance,
    )

    rows = emb_ivf_balance(spark, SF).collect()
    total = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r.n_vectors for r in rows) == total
    assert len(rows) >= N_CELLS // 2  # training didn't collapse
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    # mean of balance factors weighted by 1/n_cells is 1 by definition
    mean_bf = sum(r.balance_factor for r in rows) / len(rows)
    assert abs(mean_bf - 1.0) < 0.01


def test_length_percentiles_ordering(spark):
    from etl_city_directories_spark.operators.textstats import (
        text_length_percentiles,
    )

    rows = text_length_percentiles(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert (
            r.min_chars
            <= r.p25_chars
            <= r.median_chars
            <= r.p90_chars
            <= r.max_chars
        )


# --- batch 18: price index, cohort LTV


def test_price_index_fisher_identity(spark):
    from etl_city_directories_spark.operators.analytics import q_price_index

    r = q_price_index(spark, SF).collect()[0]
    assert r.n_parts > 0
    assert r.laspeyres > 0 and r.paasche > 0
    assert abs(r.fisher_sq - r.laspeyres * r.paasche) < 1e-3
    # stationary synthetic prices: indices near 1
    assert 0.8 < r.laspeyres < 1.25
    assert 0.8 < r.paasche < 1.25


def test_cohort_ltv_monotone_per_cohort(spark):
    from collections import defaultdict

    from etl_city_directories_spark.operators.analytics import q_cohort_ltv

    rows = q_cohort_ltv(spark, SF).collect()
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r.cohort_q].append(r)
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(rs[0].n_members for rs in by_cohort.values()) == n_cust
    for rs in by_cohort.values():
        rs.sort(key=lambda r: r.age_q)
        assert rs[0].age_q == 0  # cohort period always trades
        for a, b in zip(rs, rs[1:]):
            assert b.cum_ltv_micro >= a.cum_ltv_micro


# --- batch 19: supplier HHI, dow-hour heatmap


def test_supplier_hhi_bounds(spark):
    from etl_city_directories_spark.operators.analytics import q_supplier_hhi

    rows = q_supplier_hhi(spark, SF).collect()
    n_parts = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r.n_parts for r in rows) == n_parts
    for r in rows:
        assert 0 < r.avg_hhi <= 10000
        assert r.avg_suppliers >= 1


def test_dow_hour_heatmap_grid(spark):
    from etl_city_directories_spark.operators.analytics import (
        q_dow_hour_heatmap,
    )

    rows = q_dow_hour_heatmap(spark, SF).collect()
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r.n_events for r in rows) == n_events
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    assert all(1 <= r.dow <= 7 and 0 <= r.hour <= 23 for r in rows)


# --- batch 20: Wilcoxon, JS divergence


def test_wilcoxon_matches_local_ranks(spark):
    from etl_city_directories_spark.operators.nonparam import (
        q_wilcoxon_signed_rank,
    )

    r = q_wilcoxon_signed_rank(spark, SF_TINY).collect()[0]
    orders = spark.read.parquet(f"{SF_TINY}/orders.parquet").collect()
    lo = min(x.o_orderdate for x in orders)
    hi = max(x.o_orderdate for x in orders)
    import datetime

    mid = lo + datetime.timedelta(days=(hi - lo).days // 2)
    from collections import defaultdict

    h1, h2 = defaultdict(int), defaultdict(int)
    for x in orders:
        c = round(float(x.o_totalprice) * 100)
        (h1 if x.o_orderdate <= mid else h2)[x.o_custkey] += c
    diffs = [
        h2[k] - h1[k]
        for k in set(h1) & set(h2)
        if h1[k] > 0 and h2[k] > 0 and h1[k] != h2[k]
    ]
    diffs.sort(key=abs)
    # midranks with ties on |d|
    n = len(diffs)
    w_plus = 0.0
    i = 0
    while i < n:
        j = i
        while j < n and abs(diffs[j]) == abs(diffs[i]):
            j += 1
        mid_rank = (i + 1 + j) / 2
        for k in range(i, j):
            if diffs[k] > 0:
                w_plus += mid_rank
        i = j
    assert r.n_pairs == n
    assert abs(r.w_plus - w_plus) < 0.51


def test_js_divergence_bounds_and_symmetric_inputs(spark):
    import math

    from etl_city_directories_spark.operators.textstats import (
        text_source_js_divergence,
    )

    rows = text_source_js_divergence(spark, SF).collect()
    n_sources = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        # JS in nats lives in [0, ln 2]
        assert -1e-9 <= r.js_divergence <= math.log(2) + 1e-9


# --- batch 21: Kruskal-Wallis, split leakage


def test_kruskal_wallis_properties(spark):
    from etl_city_directories_spark.operators.nonparam import q_kruskal_wallis

    r = q_kruskal_wallis(spark, SF).collect()[0]
    assert r.k_groups == 5 and r.df == 4
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert r.n_customers == n_cust
    assert r.h_stat >= -1e-6
    # tie correction can only inflate H
    assert r.h_stat_tie_corrected >= r.h_stat - 1e-9


def test_split_leakage_covers_all_pairs(spark):
    from etl_city_directories_spark.operators.curation import (
        decontaminate_split_leakage,
    )
    from etl_city_directories_spark.operators.dedup import dedup_minhash_lsh

    rows = decontaminate_split_leakage(spark, SF).collect()
    n_pairs = dedup_minhash_lsh(spark, SF).count()
    assert sum(r.n_pairs for r in rows) == n_pairs
    for r in rows:
        assert r.split_lo <= r.split_hi
        assert r.is_leak == (r.split_lo != r.split_hi)
    assert abs(sum(r.pair_share for r in rows) - 1.0) < 1e-3


# --- batch 22: per-source dup rate, order-size histogram


def test_dup_rate_by_source_consistent_with_exact_dedup(spark):
    from etl_city_directories_spark.operators.dedup import (
        dedup_rate_by_source,
        norm_col,
    )

    rows = dedup_rate_by_source(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    n_distinct_total = (
        docs.select("source", F.md5(norm_col()).alias("h")).distinct().count()
    )
    assert sum(r.n_distinct for r in rows) == n_distinct_total
    for r in rows:
        assert 0 <= r.dup_rate < 1
        assert 0 <= r.wasted_char_share < 1


def test_order_size_histogram_totals(spark):
    from etl_city_directories_spark.operators.windows import (
        q_order_size_histogram,
    )

    rows = q_order_size_histogram(spark, SF).collect()
    n_orders = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert sum(r.n_orders for r in rows) == n_orders
    assert abs(rows[-1].cum_share - 1.0) < 1e-6
    shares = [r.cum_share for r in rows]
    assert shares == sorted(shares)


# --- batch 23: order gaps, discount profile


def test_order_gap_totals_and_ordering(spark):
    from etl_city_directories_spark.operators.windows import (
        q_order_gap_percentiles,
    )

    rows = q_order_gap_percentiles(spark, SF).collect()
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    # every customer's k orders produce k-1 gaps
    assert sum(r.n_gaps for r in rows) == n_orders - n_cust
    for r in rows:
        assert r.min_days <= r.median_days <= r.p90_days <= r.max_days


def test_discount_profile_conservation(spark):
    from etl_city_directories_spark.operators.relational_ext import (
        q_discount_depth_profile,
    )

    rows = q_discount_depth_profile(spark, SF).collect()
    n_li = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert sum(r.n_lines for r in rows) == n_li
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r.give_back >= 0
        if r.discount_band == "0: none":
            assert r.give_back == 0
