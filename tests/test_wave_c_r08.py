"""Property tests for the round-8 wave-C operators: SRM, Hurst R/S,
incremental join-view maintenance, and the simplified silhouette.
Adversarial planted corpora + pure-python replays, per the house test
policy (contract-shaped parquet in tmp_path, real load_table path).
"""

from __future__ import annotations

import hashlib
import math
import random

import pyspark.sql.functions as F

from etl_city_directories_spark.operators.forecast import (
    HURST_BLOCKS,
    q_fdr_bh,
    q_hurst_rs,
    q_sharpe_sortino,
    q_srm_check,
    q_var_cvar,
)
from etl_city_directories_spark.operators.scale_ops import q_ivm_delta_join
from etl_city_directories_spark.operators.similarity import emb_silhouette

_COLS = ["event_id", "ts_s", "user_id", "event_type", "value", "props"]


def _write_events(spark, tmpdir, rows) -> str:
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


def test_srm_replays_md5_split_and_flags_planted_mismatch(spark, tmp_path):
    """Choose user ids so the md5 parity split is grossly unbalanced —
    the operator must count each arm exactly and flag the SRM."""
    users = list(range(1, 400))
    arm_a = [
        u
        for u in users
        if int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2 == 0
    ]
    biased = arm_a + [u for u in users if u not in arm_a][:20]
    rows = [
        (i, "2024-01-05 10:00:00", u, "click", 1.0, "{}")
        for i, u in enumerate(biased)
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = q_srm_check(spark, sf).collect()[0]
    assert row.n_arm_a == len(arm_a)
    assert row.n_arm_b == 20
    na, nb = len(arm_a), 20
    chi2 = (na - nb) ** 2 / (na + nb)
    assert abs(row.chi2_stat - chi2) < 1e-6
    assert row.srm_detected


def _daily_rows(cents):
    return [
        (i, f"2024-01-{i + 1:02d} 12:00:00", 1, "purchase", c / 100.0, "{}")
        for i, c in enumerate(cents)
    ]


def test_hurst_replay_matches_python_rs(spark, tmp_path):
    """rs_m per block size must equal a pure-python rescaled-range
    computation on the same series, and H the endpoint log2 slope."""
    rng = random.Random(31)
    cents = [rng.randrange(5000, 50000) for _ in range(30)]
    sf = _write_events(spark, tmp_path, _daily_rows(cents))
    row = q_hurst_rs(spark, sf).collect()[0]
    avg = {}
    for m in HURST_BLOCKS:
        ratios = []
        for b in range(len(cents) // m):
            xs = cents[b * m:(b + 1) * m]
            sm, ssm = sum(xs), sum(x * x for x in xs)
            cums, c = [], 0
            for x in xs:
                c += x
                cums.append(c)
            devs = [m * cums[t] - (t + 1) * sm for t in range(m)]
            denom = m * ssm - sm * sm
            rs = 0.0 if denom <= 0 else (max(devs) - min(devs)) / math.sqrt(denom)
            ratios.append(math.floor(1e6 * rs + 0.5))
        avg[m] = sum(ratios) / len(ratios) / 1e6
    for m in HURST_BLOCKS:
        assert abs(getattr(row, f"rs_{m}") - avg[m]) < 1e-5, m
    lo, hi = HURST_BLOCKS[0], HURST_BLOCKS[-1]
    h = (round(math.log2(avg[hi]), 6) - round(math.log2(avg[lo]), 6)) / (
        len(HURST_BLOCKS) - 1
    )
    assert abs(row.hurst_exponent - h) < 1e-5


def test_hurst_is_high_on_trending_low_on_alternating(spark, tmp_path):
    """A strong monotone trend (persistent) must score H near 1; a
    strict alternation (anti-persistent) must score well below 0.5."""
    trend = [1000 * (i + 1) for i in range(30)]
    sf = _write_events(spark, tmp_path / "t", _daily_rows(trend))
    h_trend = q_hurst_rs(spark, sf).collect()[0].hurst_exponent
    alt = [10000 if i % 2 == 0 else 30000 for i in range(30)]
    sf = _write_events(spark, tmp_path / "a", _daily_rows(alt))
    h_alt = q_hurst_rs(spark, sf).collect()[0].hurst_exponent
    assert h_trend > 0.85
    assert h_alt < 0.35
    assert h_trend > h_alt


def test_ivm_delta_join_flag_true_on_driver_corpus(spark, sf_dir):
    """merge(base ⋈ dim, delta ⋈ dim) ≡ recompute on every nation —
    the maintenance identity the operator exists to prove."""
    rows = q_ivm_delta_join(spark, sf_dir).collect()
    assert rows
    assert all(r.ivm_matches_recompute for r in rows)
    assert all(r.n_orders > 0 for r in rows)


def test_silhouette_is_bounded_and_covers_all_vectors(spark, sf_dir):
    """s ∈ [-1, 1] per cell by construction; every embedding lands in
    exactly one cell; negative counts never exceed the cell size."""
    rows = emb_silhouette(spark, sf_dir).collect()
    assert rows
    import duckdb

    n_vecs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    assert sum(r.n_points for r in rows) == n_vecs
    for r in rows:
        assert -1.0 <= r.mean_silhouette <= 1.0
        assert 0 <= r.n_negative <= r.n_points


def test_sharpe_sortino_replay_on_seeded_series(spark, tmp_path):
    """Mean/sd/downside chains replayed in python on a seeded random
    series with both up and down days."""
    rng = random.Random(41)
    cents = [20000]
    for _ in range(29):
        cents.append(max(1000, cents[-1] + rng.randrange(-6000, 6001)))
    sf = _write_events(spark, tmp_path, _daily_rows(cents))
    row = q_sharpe_sortino(spark, sf).collect()[0]
    rets = [
        math.floor(1e6 * (b - a) / a + 0.5) for a, b in zip(cents, cents[1:])
    ]
    n = len(rets)
    mean = sum(rets) / n
    sd = math.sqrt((n * sum(r * r for r in rets) - sum(rets) ** 2) / (n * (n - 1)))
    dd = math.sqrt(sum(r * r for r in rets if r < 0) / n)
    assert row.n_returns == n
    assert abs(row.mean_return_pct - mean / 10000) < 1e-5
    assert abs(row.sharpe - mean / sd) < 1e-5
    assert abs(row.sortino - mean / dd) < 1e-5


def test_var_cvar_rank_selection_replay(spark, tmp_path):
    """VaR = -r_(k), CVaR = -mean of the k worst — python replay."""
    rng = random.Random(43)
    cents = [30000]
    for _ in range(29):
        cents.append(max(1000, cents[-1] + rng.randrange(-9000, 9001)))
    sf = _write_events(spark, tmp_path, _daily_rows(cents))
    row = q_var_cvar(spark, sf).collect()[0]
    rets = sorted(
        math.floor(1e6 * (b - a) / a + 0.5) for a, b in zip(cents, cents[1:])
    )
    k = math.ceil(len(rets) * 5 / 100)
    assert row.k_tail == k
    assert abs(row.var_95_pct - (-rets[k - 1] / 10000)) < 1e-5
    assert abs(row.cvar_95_pct - (-sum(rets[:k]) / k / 10000)) < 1e-5


def test_tscv_folds_are_expanding_and_disjoint(spark, sf_dir):
    """Fold i's train window strictly contains fold i-1's; test
    windows are disjoint and sized ~step; totals never exceed the
    corpus."""
    from etl_city_directories_spark.operators.curation import (
        sample_kfold_timeseries,
    )

    rows = sorted(
        sample_kfold_timeseries(spark, sf_dir).collect(),
        key=lambda r: r.fold,
    )
    assert [r.fold for r in rows] == [1, 2, 3, 4]
    for a, b in zip(rows, rows[1:]):
        assert b.train_days > a.train_days
        # expanding window: next fold's train includes this fold's
        # train AND test events
        assert b.n_train_events == a.n_train_events + a.n_test_events
    assert all(r.n_test_events > 0 for r in rows)


def test_temporal_fk_audit_counts_partition_events(spark, sf_dir):
    """orphan + before_first + valid == total per type, and the share
    matches the exact ratio."""
    from etl_city_directories_spark.operators.scale_ops import (
        q_temporal_fk_audit,
    )

    rows = q_temporal_fk_audit(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == {"click", "error", "signup", "view"}
    for r in rows:
        assert r.n_orphan + r.n_before_first + r.n_valid == r.n_events
        assert abs(r.valid_share - round(r.n_valid / r.n_events, 4)) < 1e-9


def test_stream_srm_equals_batch_srm(spark, sf_dir):
    """The streaming monitor and the batch guardrail must agree
    row-for-row (same split, same chain)."""
    from etl_city_directories_spark.streaming.stream_ops import (
        stream_srm_monitor,
    )

    got = stream_srm_monitor(spark, sf_dir).collect()[0]
    want = q_srm_check(spark, sf_dir).collect()[0]
    assert got.asDict() == want.asDict()


def test_stream_ivm_view_equals_batch_recompute(spark, sf_dir):
    """The foreachBatch-maintained view must equal a one-pass batch
    recompute of the same join view."""
    import pyspark.sql.functions as SF

    from etl_city_directories_spark.sources.tables import load_table
    from etl_city_directories_spark.streaming.stream_ops import (
        stream_ivm_view,
    )

    got = {
        r.nation: (r.n_purchases, r.revenue_cents)
        for r in stream_ivm_view(spark, sf_dir).collect()
    }
    events = load_table(spark, sf_dir, "events").filter(
        SF.col("event_type") == "purchase"
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    want = {
        r.nation: (r.n, r.c)
        for r in events.join(cust, events.user_id == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy(SF.col("n_name").alias("nation"))
        .agg(
            SF.count(SF.lit(1)).alias("n"),
            SF.sum(
                (SF.col("value").cast("decimal(18,2)") * 100).cast("long")
            ).cast("bigint").alias("c"),
        )
        .collect()
    }
    assert got == want


def test_minhash_incremental_agrees_with_full_lsh(spark, sf_dir):
    """Every (odd batch doc, even corpus doc) pair the FULL self-join
    LSH verifies must appear in the incremental screen's candidates,
    with the same best-match election — the no-lost-duplicates
    contract of incremental dedup."""
    from etl_city_directories_spark.operators.dedup import (
        dedup_minhash_incremental,
        dedup_minhash_lsh,
    )

    inc = {
        r.doc_new: (r.n_corpus_dups, r.best_match, r.best_jaccard)
        for r in dedup_minhash_incremental(spark, sf_dir).collect()
    }
    cross = {}
    for r in dedup_minhash_lsh(spark, sf_dir).collect():
        a, b = r.doc_a, r.doc_b
        for new, corp in ((a, b), (b, a)):
            if new % 2 == 1 and corp % 2 == 0:
                cross.setdefault(new, []).append((r.jaccard, corp))
    assert set(inc) == set(cross)
    for doc, pairs in cross.items():
        n, best, bj = inc[doc]
        assert n == len(pairs)
        want = max(pairs, key=lambda p: (p[0], -p[1]))
        assert (bj, best) == want


def test_shot_boundaries_partition_frames(spark, sf_dir):
    """Shots partition the frame sequence: Σ shot lengths = n_frames,
    n_shots = n_cuts + 1, longest ≤ n_frames."""
    from etl_city_directories_spark.operators.multimodal import (
        mm_shot_boundaries,
    )

    rows = mm_shot_boundaries(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_shots == r.n_cuts + 1
        assert 1 <= r.longest_shot_frames <= r.n_frames
        assert r.n_shots <= r.n_frames


def test_little_law_ratio_near_one_on_steady_corpus(spark, sf_dir):
    """TPC-H order arrivals are stationary over the interior window,
    so L/(λW) must sit near 1 (edge-trim removes the censoring
    bias); the identity-side quantities must be self-consistent."""
    from etl_city_directories_spark.operators.analytics import (
        q_queue_little_law,
    )

    r = q_queue_little_law(spark, sf_dir).collect()[0]
    assert r.window_days > 0 and r.n_arrivals > 0
    assert 0.9 < r.little_ratio < 1.1
    assert abs(r.lambda_per_day - r.n_arrivals / r.window_days) < 1e-4


def test_uplift_strata_cover_and_att_is_weighted_mean(spark, sf_dir):
    """Each stratum's arms partition its customers; ATT equals the
    treated-weighted mean of per-stratum uplifts (python replay)."""
    from etl_city_directories_spark.operators.analytics import (
        q_promo_uplift_matching,
    )

    rows = q_promo_uplift_matching(spark, sf_dir).collect()
    assert len(rows) == 10
    both = [r for r in rows if r.uplift_dollars is not None]
    att = sum(
        r.n_treated * math.floor(r.uplift_dollars * 100 + 0.5) for r in both
    ) / sum(r.n_treated for r in both)
    # replay tolerance: uplift_dollars is itself rounded to 4dp, so
    # the reconstructed cents can differ by < 1 cent per stratum
    assert abs(rows[0].att_dollars - att / 100) < 0.02
    assert len({r.att_dollars for r in rows}) == 1


def test_phash_finds_planted_identical_images(spark, tmp_path):
    """Two documents with IDENTICAL text produce identical pixel
    streams → hamming 0; the op must pair them (planted-duplicate
    proof, the q_validate_fk pattern). Unique-text docs stay clean."""
    from etl_city_directories_spark.operators.multimodal import (
        mm_phash_dedup,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "a", 43),
        (41, "the quick brown fox jumps over the lazy dog", "en", "a", 43),
        (3, "a completely different corpus entry about ships", "en", "a", 47),
        (7, "yet another unrelated document with words", "en", "a", 41),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {r.doc_id: r for r in mm_phash_dedup(spark, str(tmp_path)).collect()}
    assert out[1].n_near_dups == 1 and out[1].nearest_dup == 41
    assert out[41].n_near_dups == 1 and out[41].nearest_dup == 1
    assert out[1].phash == out[41].phash
    assert out[3].n_near_dups == 0 and out[7].n_near_dups == 0


def test_tscv_step_agrees_cross_engine_on_a_33_day_span(spark, tmp_path):
    """Regression for the FLOOR/CAST divergence: span=33 gives
    step=6 under FLOOR in BOTH engines (a bare CAST would truncate in
    Spark but round to 7 in DuckDB and shift every fold boundary).
    The oracle runs on the same planted parquet via duckdb."""
    import duckdb

    from etl_city_directories_spark.operators.curation import (
        ORACLES,
        sample_kfold_timeseries,
    )

    rows = []
    for i in range(33):
        mo, day = (1, i + 1) if i < 31 else (2, i - 30)
        rows.append((i, f"2024-{mo:02d}-{day:02d} 10:00:00", 1, "click",
                     1.0, "{}"))
    sf = _write_events(spark, tmp_path, rows)
    got = sorted(
        (r.fold, r.train_days, r.n_train_events, r.n_test_events)
        for r in sample_kfold_timeseries(spark, sf).collect()
    )
    assert got[0][1] == 6  # floor(33/5), not round-to-nearest 7
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    want = sorted(
        tuple(r) for r in
        con.execute(ORACLES["sample_kfold_timeseries"]).fetchall()
    )
    assert got == want


def test_hurst_constant_series_is_null_not_an_error(spark, tmp_path):
    """Regression for the LOG2(0) hard-error path: an all-constant
    series must report NULL H from BOTH engines (DuckDB would raise
    on an unguarded log2(0))."""
    import duckdb

    from etl_city_directories_spark.operators.forecast import ORACLES

    sf = _write_events(spark, tmp_path, _daily_rows([5000] * 30))
    row = q_hurst_rs(spark, sf).collect()[0]
    assert row.hurst_exponent is None
    assert row.rs_7 == 0.0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    orow = con.execute(ORACLES["q_hurst_rs"]).fetchone()
    assert orow[-1] is None  # no OutOfRange error, NULL H


def test_fdr_bh_overflow_ranks_are_never_significant(spark, tmp_path):
    """Regression for the ladder fallthrough: with SIX event types the
    rank-6 test must compare against an effectively-infinite critical
    value — an ELSE 0 would mark it (and via step-up, everything)
    significant. Six null panels → zero discoveries."""
    rng = random.Random(53)
    rows, eid = [], 0
    for day in range(1, 29):
        ts = f"2024-01-{day:02d} 09:00:00"
        for etype in ["a", "b", "c", "d", "e", "f"]:
            for _ in range(5):
                rows.append((eid, ts, 1, etype, 5.0 + rng.random(), "{}"))
                eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = q_fdr_bh(spark, sf).collect()
    assert len(out) == 6
    assert not any(r.discovery for r in out)
