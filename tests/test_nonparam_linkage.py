"""Property tests for the nonparametric-stats batch
(operators/nonparam.py), the blocked record-linkage module
(operators/linkage.py), per-dimension embedding stats, and the
compaction planner: Python-replay exactness and structural
invariants the DuckDB hash check cannot express (union-find cluster
replay, next-fit bin replay, rank-correlation recomputation)."""

import math

from etl_city_directories_spark.operators.linkage import (
    MAX_EDIT,
    er_blocked_pairs,
    er_match_clusters,
)
from etl_city_directories_spark.operators.nonparam import (
    q_ks_twosample,
    q_mann_kendall,
    q_seasonal_dow_decompose,
    q_spearman_corr,
)
from etl_city_directories_spark.operators.scale_ops import (
    COMPACT_TARGET_CHARS,
    q_compaction_plan,
)
from etl_city_directories_spark.operators.similarity import emb_dim_stats
from etl_city_directories_spark.operators.stats import _daily_type_cents
from etl_city_directories_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_mann_kendall_python_replay(spark):
    grid = {}
    for r in _daily_type_cents(spark, SF).collect():
        grid.setdefault(r.event_type, []).append((r.d, r.cents))
    rows = {r.event_type: r for r in q_mann_kendall(spark, SF).collect()}
    assert set(rows) == set(grid)
    for et, series in grid.items():
        xs = [c for _, c in sorted(series)]
        s = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(len(xs))
            for j in range(i + 1, len(xs))
        )
        n_pairs = len(xs) * (len(xs) - 1) // 2
        assert rows[et].s_stat == s
        assert rows[et].n_pairs == n_pairs
        assert abs(rows[et].tau_a - round(s / n_pairs, 6)) < 1e-9
        assert -1.0 <= rows[et].tau_a <= 1.0


def test_spearman_python_replay(spark):
    from pyspark.sql import functions as F

    # daily grid from the engine (decimal cents are the engine's own
    # exact first stage); the REPLAY re-derives ranks and rho in Python
    daily = (
        load_table(spark, SF, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_ev"),
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .collect()
    )

    def doubled_ranks(vals):
        r2 = []
        for v in vals:
            ties = sum(1 for u in vals if u == v)
            first = sum(1 for u in vals if u < v) + 1
            r2.append(2 * first + ties - 1)
        return r2

    rows = {r.event_type: r for r in q_spearman_corr(spark, SF).collect()}
    by_type = {}
    for r in daily:
        by_type.setdefault(r.event_type, []).append((r.n_ev, r.cents))
    for et, pairs in by_type.items():
        rx = doubled_ranks([p[0] for p in pairs])
        ry = doubled_ranks([p[1] for p in pairs])
        n = len(pairs)
        sx, sy = sum(rx), sum(ry)
        sxx = sum(v * v for v in rx)
        syy = sum(v * v for v in ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        rho = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        assert abs(rows[et].spearman_rho - round(rho, 6)) < 1e-9
        assert rows[et].n_days == n


def test_ks_bounds_and_totals(spark):
    events = load_table(spark, SF, "events").collect()
    n_total = len(events)
    per_type = {}
    for e in events:
        per_type[e.event_type] = per_type.get(e.event_type, 0) + 1
    for r in q_ks_twosample(spark, SF).collect():
        assert r.n_type == per_type[r.event_type]
        assert r.n_rest == n_total - r.n_type
        assert 0 <= r.d_num <= r.n_type * r.n_rest
        assert 0.0 <= r.ks_d <= 1.0
        assert abs(r.ks_d - round(r.d_num / (r.n_type * r.n_rest), 6)) < 1e-9


def test_seasonal_decompose_identity_and_balance(spark):
    rows = q_seasonal_dow_decompose(spark, SF).collect()
    assert rows
    seasonal_by_dow = {}
    n_by_dow = {}
    detr_total = 0.0
    for r in rows:
        # additive identity of the rounded parts
        assert abs(r.remainder - round(r.rev - r.trend - r.seasonal, 4)) < 1e-9
        seasonal_by_dow[r.dow] = r.seasonal
        n_by_dow[r.dow] = n_by_dow.get(r.dow, 0) + 1
        detr_total += r.rev - r.trend
    # the day-of-week seasonal means, weighted by their day counts,
    # carry exactly the total detrended mass (up to per-dow ROUND 4)
    weighted = sum(seasonal_by_dow[d] * n_by_dow[d] for d in seasonal_by_dow)
    assert abs(weighted - detr_total) <= 0.0001 * len(rows) + 0.01


def test_emb_dim_stats_invariants(spark):
    vecs = load_table(spark, SF, "embeddings").collect()
    dim = len(vecs[0].embedding)
    rows = q = emb_dim_stats(spark, SF).collect()
    assert len(rows) == dim
    for r in rows:
        assert r.n == len(vecs)
        assert r.min_x <= r.mean <= r.max_x
        assert 0.0 <= r.near_zero_frac <= 1.0
        # E[x^2] >= E[x]^2 (variance nonnegativity, up to micro rounding)
        assert r.second_moment >= r.mean * r.mean - 1e-5


def test_compaction_plan_python_replay(spark):
    docs = sorted(
        load_table(spark, SF, "documents").collect(),
        key=lambda d: (d.source, d.doc_id),
    )
    expect = {}
    prev_src, run = None, 0
    for d in docs:
        if d.source != prev_src:
            prev_src, run = d.source, 0
        b = run // COMPACT_TARGET_CHARS
        n, tot = expect.get((d.source, b), (0, 0))
        expect[(d.source, b)] = (n + 1, tot + d.n_chars)
        run += d.n_chars
    got = {
        (r.source, r.bin): (r.n_files, r.total_bytes)
        for r in q_compaction_plan(spark, SF).collect()
    }
    assert got == expect


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_er_pairs_scores_and_threshold(spark):
    cust = {
        c.c_custkey: c.c_name
        for c in load_table(spark, SF, "customer").collect()
    }
    rows = er_blocked_pairs(spark, SF).collect()
    assert rows
    for r in rows[:200]:
        assert r.custkey_a < r.custkey_b
        assert r.edit_dist <= MAX_EDIT
        a, b = cust[r.custkey_a], cust[r.custkey_b]
        assert r.edit_dist == _lev(a, b)
        assert a[-2:] == b[-2:]


def test_er_clusters_union_find_replay(spark):
    pairs = [
        (r.custkey_a, r.custkey_b)
        for r in er_blocked_pairs(spark, SF).collect()
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {}
    for node in list(parent):
        root = find(node)
        n, mn, mx = expect.get(root, (0, node, node))
        expect[root] = (n + 1, min(mn, node), max(mx, node))
    # union-by-min makes every root the component's min key, matching
    # the operator's entity_id contract; clusters of 1 are filtered
    expect_multi = {k: v for k, v in expect.items() if v[0] > 1}
    got = {
        r.entity_id: (r.n_records, r.min_key, r.max_key)
        for r in er_match_clusters(spark, SF).collect()
    }
    assert got == expect_multi


def test_isotonic_fit_monotone_and_bracketed(spark):
    from etl_city_directories_spark.operators.nonparam import (
        q_isotonic_calibration,
    )

    rows = q_isotonic_calibration(spark, SF).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append((r.day, r.rev, r.isotonic_fit))
    for series in by_type.values():
        series.sort()
        fits = [f for _, _, f in series]
        revs = [v for _, v, _ in series]
        # nondecreasing fit, bracketed by the series range
        assert all(a <= b + 1e-9 for a, b in zip(fits, fits[1:]))
        assert min(revs) - 1e-6 <= fits[0] and fits[-1] <= max(revs) + 1e-6
        # isotonic regression preserves the series mass (projection
        # onto the monotone cone keeps the mean; PAV block property),
        # up to the ROUND 4 edge
        assert abs(sum(fits) - sum(revs)) <= 0.01 * len(fits) + 0.01


def test_ab_ztest_counts_and_zero_guard(spark):
    from etl_city_directories_spark.operators.stats import (
        q_ab_proportion_ztest,
    )
    from etl_city_directories_spark.sources.tables import load_table

    [r] = q_ab_proportion_ztest(spark, SF).collect()
    users = {
        u.user_id
        for u in load_table(spark, SF, "events").select("user_id").distinct().collect()
    }
    assert r.n_a + r.n_b == len(users)
    assert r.n_a == sum(1 for u in users if u % 2 == 0)
    assert 0 <= r.k_a <= r.n_a and 0 <= r.k_b <= r.n_b
    # interior by construction: the global-mean threshold splits users
    assert 0 < r.k_a + r.k_b < r.n_a + r.n_b
    assert math.isfinite(r.z_stat)


def test_bigram_logprob_floor_and_counts(spark):
    from etl_city_directories_spark.operators.textstats import (
        text_bigram_logprob,
        text_token_count,
    )

    rows = {r.doc_id: r for r in text_bigram_logprob(spark, SF).collect()}
    assert rows
    for r in rows.values():
        # -ln(p) with p <= 1: surprisal is nonnegative
        assert r.mean_surprisal >= 0.0
        assert r.n_bigrams >= 1
