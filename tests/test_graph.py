"""connected_components (large-star/small-star) vs a union-find
reference — correctness on adversarial shapes and diameter-independent
round counts."""

from __future__ import annotations

import random

import pytest

from etl_city_directories_spark.functions.graph import connected_components


def _uf(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(ns) for ns in comp.values() for n in ns}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    nodes = sorted({x for e in edges for x in e})
    want = _uf([(u, v) for u, v in edges if u != v], nodes)
    assert got == want


def test_chain_200_converges_fast(spark):
    """A 200-node path: min-label propagation would need ~200 rounds;
    the star contraction must reach its fixpoint (including the
    confirming no-change round) inside 10."""
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.component
        for r in connected_components(df, max_rounds=10).collect()
    }
    assert got == {i: 0 for i in range(201)}


def test_star_and_self_loops(spark):
    _check(spark, [(500, 500 + i) for i in range(1, 30)])
    _check(spark, [(1, 1), (2, 3), (3, 2), (4, 5), (5, 6), (6, 4), (9, 9)])


@pytest.mark.parametrize("seed", [7, 11, 23])
def test_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(20, 120)
    m = rng.randint(n // 2, n * 2)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    _check(spark, edges)


# --- r07: k-core convergence peel vs pure-Python reference -----------------


def _py_kcore_rounds(edges, k, max_rounds=12):
    """Reference union peel: same contract as kcore_peel_rounds —
    per-round (round, n_nodes, n_edges) up to and including the first
    round that removes no edge."""
    cur = set(edges)
    prev = len(cur)
    out = []
    for rnd in range(1, max_rounds + 1):
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
        nodes = {n for e in cur for n in e}
        out.append((rnd, len(nodes), len(cur)))
        if len(cur) == prev:
            break
        prev = len(cur)
    return out


@pytest.mark.parametrize("seed,k", [(3, 2), (17, 3), (42, 4)])
def test_kcore_peel_matches_python_reference(spark, seed, k):
    from etl_city_directories_spark.operators.analytics import (
        kcore_peel_rounds,
    )

    rng = random.Random(seed)
    n = rng.randint(15, 60)
    edge_set = set()
    for _ in range(rng.randint(n, n * 3)):
        a, b = rng.randrange(n), rng.randrange(n)
        if a == b:
            continue
        edge_set.add((min(a, b), max(a, b)))  # undirected, no dupes
    df = spark.createDataFrame(
        sorted(edge_set), "part_a long, part_b long"
    )
    got = kcore_peel_rounds(df, k=k)
    want = _py_kcore_rounds(edge_set, k=k)
    assert got == want


def test_kcore_peel_empty_graph_converges_immediately(spark):
    from etl_city_directories_spark.operators.analytics import (
        kcore_peel_rounds,
    )

    df = spark.createDataFrame([], "part_a long, part_b long")
    assert kcore_peel_rounds(df, k=3) == [(1, 0, 0)]
