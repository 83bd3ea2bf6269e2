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
