"""Property tests for the geo family (operators/geo.py): planted
point constellations written as a contract-shaped customer parquet
into tmp_path, plus pure-python DBSCAN / nearest-neighbor replays that
do NOT use the grid shortcut — proving the grid-blocked plans compute
the same answer as the naive O(n²) definitions.

The operators derive coordinates from md5(c_custkey), so the tests
control geometry by choosing WHICH custkeys exist: the python replay
computes the same md5 lattice and runs the textbook algorithm on it.
"""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F

from etl_city_directories_spark.operators.geo import (
    EPS_C,
    GRID_CELL_UDEG,
    KNN_C,
    LAT_SPAN,
    LON_SPAN,
    MIN_PTS,
    geo_bbox_summary,
    geo_dbscan_grid,
    geo_grid_density,
    geo_knn_join,
)


def _pt(key, prefix=""):
    h = hashlib.md5(f"{prefix}{key}".encode()).hexdigest()
    lat = int(h[:8], 16) % LAT_SPAN - (LAT_SPAN - 1) // 2
    lon = int(h[8:16], 16) % LON_SPAN - (LON_SPAN - 1) // 2
    return lat, lon


def _write_world(spark, tmpdir, custkeys, suppkeys=()):
    cust = spark.createDataFrame(
        [(int(k), f"Customer#{k}", "addr", int(k) % 25, "p", 1.0, "mkt", "c")
         for k in custkeys],
        ["c_custkey", "c_name", "c_address", "c_nationkey", "c_phone",
         "c_acctbal", "c_mktsegment", "c_comment"],
    )
    cust.coalesce(1).write.mode("overwrite").parquet(
        f"{tmpdir}/customer.parquet"
    )
    nat = spark.createDataFrame(
        [(i, f"NATION_{i:02d}", i % 5, "c") for i in range(25)],
        ["n_nationkey", "n_name", "n_regionkey", "n_comment"],
    )
    nat.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/nation.parquet")
    if suppkeys:
        sup = spark.createDataFrame(
            [(int(k), f"Supplier#{k}", "addr", int(k) % 25, "p", 1.0, "c")
             for k in suppkeys],
            ["s_suppkey", "s_name", "s_address", "s_nationkey", "s_phone",
             "s_acctbal", "s_comment"],
        )
        sup.coalesce(1).write.mode("overwrite").parquet(
            f"{tmpdir}/supplier.parquet"
        )
    return str(tmpdir)


def test_grid_density_counts_every_point_once(spark, tmp_path):
    keys = list(range(1, 301))
    sf = _write_world(spark, tmp_path, keys)
    rows = geo_grid_density(spark, sf).collect()
    assert sum(r.n_points for r in rows) == len(keys)
    # replay the cell of one specific point
    lat, lon = _pt(17)
    cl, cn = math.floor(lat / GRID_CELL_UDEG), math.floor(lon / GRID_CELL_UDEG)
    hit = [r for r in rows if r.cell_lat == cl and r.cell_lon == cn]
    assert hit and hit[0].n_points >= 1
    top = min(r.density_rank for r in rows)
    assert top == 1


def test_bbox_summary_replays_exact_extents(spark, tmp_path):
    keys = list(range(1, 126))
    sf = _write_world(spark, tmp_path, keys)
    rows = {r.nation: r for r in geo_bbox_summary(spark, sf).collect()}
    # replay nation 3 in python
    pts = [_pt(k) for k in keys if k % 25 == 3]
    r = rows["NATION_03"]
    assert r.n_points == len(pts)
    assert r.min_lat == round(min(p[0] for p in pts) / 1e6, 6)
    assert r.max_lon == round(max(p[1] for p in pts) / 1e6, 6)
    cent = sum(p[0] for p in pts) / len(pts) / 1e6
    assert abs(r.centroid_lat - cent) < 1e-5


def test_knn_join_matches_naive_nearest_within_radius(spark, tmp_path):
    """The grid-blocked argmin must equal the O(n*m) python scan for
    every probe whose true nearest neighbor lies within R — the
    radius-bounded contract."""
    custkeys = list(range(1, 201))
    suppkeys = list(range(1, 41))
    sf = _write_world(spark, tmp_path, custkeys, suppkeys)
    out = {r.s_suppkey: r for r in geo_knn_join(spark, sf).collect()}
    assert set(out) == set(suppkeys)
    cpts = {k: _pt(k) for k in custkeys}
    n = len(custkeys)
    r_u = max(int(math.floor(KNN_C / math.sqrt(n))), 1)
    for s in suppkeys:
        slat, slon = _pt(s, prefix="sup-")
        best = min(
            (
                ((clat - slat) ** 2 + (clon - slon) ** 2, k)
                for k, (clat, clon) in cpts.items()
            ),
        )
        if best[0] <= r_u * r_u:
            # true NN inside R ⇒ grid join MUST find it (3x3 covers R)
            assert out[s].found, s
            assert out[s].nearest_custkey == best[1], s
        else:
            # true NN outside R ⇒ NOTHING lies within R, so the
            # bounded-radius contract requires found = False
            assert not out[s].found, s


def test_dbscan_matches_naive_python_dbscan(spark, tmp_path):
    """Cluster summary (sorted (id, n_core, n_border) triples) must
    equal a textbook O(n²) DBSCAN on the same md5 lattice."""
    custkeys = list(range(1, 401))
    sf = _write_world(spark, tmp_path, custkeys)
    got = sorted(
        (r.cluster_id, r.n_core, r.n_border)
        for r in geo_dbscan_grid(spark, sf).collect()
    )
    pts = {k: _pt(k) for k in custkeys}
    n = len(custkeys)
    eps = max(int(math.floor(EPS_C / math.sqrt(n))), 1)
    nbrs = {k: set() for k in custkeys}
    ks = list(custkeys)
    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            d2 = (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
            if d2 <= eps * eps:
                nbrs[a].add(b)
                nbrs[b].add(a)
    core = {k for k in custkeys if len(nbrs[k]) >= MIN_PTS - 1}
    # CC over core-core edges, label = min member
    label = {}
    for k in sorted(core):
        if k in label:
            continue
        stack, comp = [k], []
        seen = {k}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in nbrs[u]:
                if v in core and v not in seen:
                    seen.add(v)
                    stack.append(v)
        lbl = min(comp)
        for u in comp:
            label[u] = lbl
    border = {}
    for k in custkeys:
        if k in core:
            continue
        cands = [label[v] for v in nbrs[k] if v in core]
        if cands:
            border[k] = min(cands)
    want = {}
    for k, lbl in label.items():
        want.setdefault(lbl, [0, 0])[0] += 1
    for k, lbl in border.items():
        want.setdefault(lbl, [0, 0])[1] += 1
    want_rows = sorted((lbl, c, b) for lbl, (c, b) in want.items())
    assert got == want_rows


def test_dbscan_pair_volume_is_linear_in_n(spark, tmp_path):
    """The density-scaled eps bounds mean degree: doubling the corpus
    must NOT double neighbors-per-point (the er_blocked_pairs lesson).
    Checked via the operator's own core/border totals staying a stable
    fraction of n."""
    out = {}
    for tag, n in (("small", 250), ("large", 500)):
        sf = _write_world(spark, tmp_path / tag, list(range(1, n + 1)))
        rows = geo_dbscan_grid(spark, sf).collect()
        out[tag] = sum(r.n_core + r.n_border for r in rows) / n
    # clustered fraction is a density invariant — ratio ~1, not ~2
    assert 0.5 < out["large"] / max(out["small"], 1e-9) < 2.0
