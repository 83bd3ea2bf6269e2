"""Property tests for the distribution-statistics batch
(operators/stats.py) plus the graph-Jaccard / int8-quantization /
percentile-position additions: driver-independent invariants the
DuckDB hash check cannot express (probability-mass closure, CUSUM
recursion replay, quantization round-trip bounds, triangle-edge
consistency)."""

import math

from etl_city_directories_spark.operators.analytics import (
    graph_jaccard_neighbors,
    graph_triangle_count,
)
from etl_city_directories_spark.operators.similarity import emb_quantize_int8
from etl_city_directories_spark.operators.stats import (
    BENFORD_EXPECTED,
    CUSUM_THRESH_X,
    q_benford_digits,
    q_bollinger_bands,
    q_chi_square_assoc,
    q_cusum_drift,
    q_diversity_simpson,
    q_ewma_dyadic,
    q_gini_concentration,
    q_outlier_iqr,
)
from etl_city_directories_spark.operators.windows import q_percentile_position

SF = "/root/testdata/sf0.001"


def test_benford_mass_closure(spark):
    rows = q_benford_digits(spark, SF).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.obs_freq for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.exp_freq - float(BENFORD_EXPECTED[r.digit])) < 1e-9
        assert abs(r.abs_dev - abs(r.obs_freq - r.exp_freq)) < 1e-9


def test_simpson_bounds_and_degenerate_user(spark):
    rows = q_diversity_simpson(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.simpson_diversity < 1.0
        if r.n_types == 1:
            assert r.simpson_diversity == 0.0
        # Simpson is capped at 1 - 1/n_types for a uniform split
        assert r.simpson_diversity <= 1 - 1 / r.n_types + 1e-9


def test_gini_bounds(spark):
    rows = q_gini_concentration(spark, SF).collect()
    assert rows
    for r in rows:
        # rank-sum Gini of non-negative spend lies in [0, 1)
        assert -1e-9 <= r.gini < 1.0
        assert r.total_spend > 0


def test_chi_square_consistency(spark):
    rows = q_chi_square_assoc(spark, SF).collect()
    total_n = sum(r.n_obs for r in rows)
    total_e = sum(r.expected for r in rows)
    # expected margins reproduce the grand total
    assert abs(total_e - total_n) < 1e-2
    chi2 = rows[0].chi2_total
    assert all(abs(r.chi2_total - chi2) < 1e-9 for r in rows)
    assert abs(chi2 - sum(r.contrib for r in rows)) < 1e-2
    assert chi2 >= 0


def test_iqr_outliers_replay(spark):
    rows = {r.n_name: r for r in q_outlier_iqr(spark, SF).collect()}
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    nation = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    by_nation = {}
    for c in cust:
        by_nation.setdefault(nation[c.c_nationkey], []).append(
            round(float(c.c_acctbal) * 100)
        )
    for name, cents in by_nation.items():
        cents.sort()
        n = len(cents)
        q1 = cents[(n + 3) // 4 - 1]
        q3 = cents[(3 * n + 3) // 4 - 1]
        iqr = q3 - q1
        n_out = sum(
            1 for x in cents if 2 * x < 2 * q1 - 3 * iqr or 2 * x > 2 * q3 + 3 * iqr
        )
        r = rows[name]
        assert r.n_customers == n
        assert round(r.q1 * 100) == q1 and round(r.q3 * 100) == q3
        assert r.n_outliers == n_out, name


def test_bollinger_band_geometry(spark):
    rows = q_bollinger_bands(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.bb_lower <= r.ma + 1e-9
        assert r.ma <= r.bb_upper + 1e-9
        # bands are symmetric around the moving average
        assert abs((r.bb_upper - r.ma) - (r.ma - r.bb_lower)) < 2e-4
        assert 1 <= r.n_days <= 7


def test_cusum_matches_recursion(spark):
    rows = q_cusum_drift(spark, SF).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, series in by_type.items():
        series.sort(key=lambda r: r.day)
        # replay the textbook recursion S+ = max(0, S+ + dev) against
        # the closed-form output (cents domain; target reconstructed
        # from the flag threshold is not needed — use mean)
        cents = [round(r.rev * 100) for r in series]
        target = sum(cents) // len(cents)
        s_hi = s_lo = 0
        for r, c in zip(series, cents):
            s_hi = max(0, s_hi + (c - target))
            s_lo = max(0, s_lo - (c - target))
            assert round(r.cusum_high * 100) == s_hi, (et, r.day)
            assert round(r.cusum_low * 100) == s_lo, (et, r.day)
            assert r.drift_flag == (s_hi > CUSUM_THRESH_X * target)


def test_ewma_tracks_series_mean(spark):
    rows = q_ewma_dyadic(spark, SF).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r.day)
        assert series[0].n_obs == 1
        assert all(r.ewma >= 0 for r in series)
        assert max(r.n_obs for r in series) <= 16


def test_jaccard_consistent_with_triangles(spark):
    tri = graph_triangle_count(spark, SF).collect()[0]
    edges = graph_jaccard_neighbors(spark, SF).collect()
    assert len(edges) == tri.n_edges
    # each triangle contributes one common neighbor to three edges
    assert sum(e.n_common for e in edges) == 3 * tri.n_triangles
    for e in edges:
        assert 0.0 <= e.jaccard <= 1.0
        union = e.deg_a + e.deg_b - e.n_common
        assert abs(e.jaccard - e.n_common / union) < 1e-6
        assert e.n_common <= min(e.deg_a, e.deg_b)


def test_int8_quantization_error_bound(spark):
    rows = emb_quantize_int8(spark, SF).collect()
    vecs = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    assert len(rows) == len(vecs)
    dim = len(vecs[0].embedding)
    # per-dim scales: max|x| / 127 -> per-element error <= scale/2;
    # dims are unit-ish, so total squared error is tiny but non-zero
    maxabs = [0.0] * dim
    for v in vecs:
        for i, x in enumerate(v.embedding):
            maxabs[i] = max(maxabs[i], abs(x))
    bound = sum((m / 127 / 2) ** 2 for m in maxabs)
    for r in rows:
        assert r.n_dims == dim
        assert 0.0 <= r.l2_err <= bound + 1e-6
        assert r.code_checksum >= dim  # every (code+128) >= 1


def test_percentile_position_invariants(spark):
    rows = q_percentile_position(spark, SF).collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r.n_name, []).append(r)
    for series in by_nation.values():
        n = len(series)
        series.sort(key=lambda r: (r.acctbal, r.c_custkey))
        assert series[-1].cume_dist == 1.0
        assert min(r.pct_rank for r in series) == 0.0
        deciles = [r.decile for r in series]
        assert deciles == sorted(deciles)
        assert max(deciles) == min(10, n)
        prev = None
        for r in series:
            if prev is not None:
                assert r.cume_dist >= prev.cume_dist - 1e-9
                assert r.pct_rank >= prev.pct_rank - 1e-9
            prev = r
        # spot-replay pct_rank of the max element: (rank-1)/(n-1)
        top_val = series[-1].acctbal
        first_at_top = next(i for i, r in enumerate(series) if r.acctbal == top_val)
        if n > 1:
            want = round(first_at_top / (n - 1) * 1e6 + 0.5)
            got = round(series[-1].pct_rank * 1e6)
            assert abs(got - math.floor(want)) <= 1
