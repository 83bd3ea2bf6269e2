"""Semantic invariants for the time-series repair / matching operators
(operators/timeseries.py) and the analytics skyline + closure — beyond
the DuckDB hash mirror in test_correctness.py.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pyspark.sql.functions as F

from etl_city_directories_spark.operators.analytics import (
    q_skyline_pareto,
    q_transitive_closure,
)
from etl_city_directories_spark.operators.timeseries import (
    q_allocation_fifo,
    q_gapfill_interp,
    q_gapfill_locf,
    q_rolling_slope,
    q_sequence_match,
)
from etl_city_directories_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_locf_grid_is_dense_and_monotone_fill(spark):
    rows = q_gapfill_locf(spark, SF).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    n_days = {len(v) for v in by_user.values()}
    assert len(n_days) == 1  # every user spans the same spine
    for days in by_user.values():
        days.sort(key=lambda r: r["day"])
        last = None
        for r in days:
            if r["is_observed"]:
                last = r["filled_rev"]
            # filled value always equals the most recent observation
            assert r["filled_rev"] == last


def test_interp_brackets_and_matches_observed(spark):
    locf = {(r["user_id"], r["day"]): r for r in q_gapfill_locf(spark, SF).collect()}
    for r in q_gapfill_interp(spark, SF).collect():
        obs = locf[(r["user_id"], r["day"])]
        assert r["is_observed"] == obs["is_observed"]
        if r["is_observed"]:
            assert r["filled_rev"] == obs["filled_rev"]
        elif r["filled_rev"] is not None and obs["filled_rev"] is not None:
            # interpolation never undershoots zero and is finite
            assert r["filled_rev"] >= 0.0


def test_rolling_slope_window_counts(spark):
    rows = q_rolling_slope(spark, SF).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r)
    for seq in by_type.values():
        seq.sort(key=lambda r: r["day"])
        for i, r in enumerate(seq):
            assert r["n_days"] == min(i + 1, 7)
        # n_days == 1 rows have undefined slope (den == 0)
        assert seq[0]["slope_per_day"] is None


def test_fifo_allocation_conserves_quantity(spark):
    li = load_table(spark, SF, "lineitem")
    supply_tot = (
        li.filter(F.col("l_returnflag") == "R")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")))
        .collect()[0][0]
    )
    demand_tot = (
        li.filter(F.col("l_returnflag") != "R")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")))
        .collect()[0][0]
    )
    rows = q_allocation_fifo(spark, SF).collect()
    total_alloc = sum(r["alloc_qty"] for r in rows)
    # FIFO can never allocate more than either side holds
    assert total_alloc <= float(supply_tot) + 1e-6
    assert total_alloc <= float(demand_tot) + 1e-6
    # every pair allocates a positive quantity
    assert all(r["alloc_qty"] > 0 for r in rows)
    # a demand row's allocations never exceed its own quantity
    per_demand = defaultdict(float)
    for r in rows:
        per_demand[(r["l_partkey"], r["d_orderkey"], r["d_linenumber"])] += r[
            "alloc_qty"
        ]
    dq = {
        (r["l_partkey"], r["l_orderkey"], r["l_linenumber"]): float(r["l_quantity"])
        for r in li.filter(F.col("l_returnflag") != "R").collect()
    }
    for k, tot in per_demand.items():
        assert tot <= dq[k] + 1e-6


def test_sequence_match_agrees_with_python_regex(spark):
    events = load_table(spark, SF, "events").collect()
    by_user = defaultdict(list)
    for e in events:
        by_user[e["user_id"]].append((e["ts"], e["event_id"], e["event_type"][0]))
    expect = {
        u: len(re.findall("vc*p", "".join(c for _, _, c in sorted(v))))
        for u, v in by_user.items()
    }
    got = {r["user_id"]: r["n_conversions"] for r in q_sequence_match(spark, SF).collect()}
    assert got == expect


def test_skyline_is_exactly_the_undominated_set(spark):
    parts = [
        (r["p_partkey"], round(r["p_retailprice"], 2), r["p_size"])
        for r in load_table(spark, SF, "part").collect()
    ]
    sky = {r["p_partkey"] for r in q_skyline_pareto(spark, SF).collect()}
    for key, price, size in parts:
        dominated = any(
            (qp <= price and qs >= size and (qp < price or qs > size))
            for _, qp, qs in parts
        )
        assert (key not in sky) == dominated, key


def test_closure_depths_follow_div10_chain(spark):
    rows = q_transitive_closure(spark, SF).collect()
    seen = {(r["descendant"], r["ancestor"]): r["depth"] for r in rows}
    max_key = max(d for d, _ in seen)
    for key in range(1, max_key + 1):
        node, depth = key, 0
        while node >= 1:
            node //= 10
            depth += 1
            if (key, node) in seen:
                assert seen[(key, node)] == depth
    # every pair in the closure is on a real //10 chain
    for (d, a), depth in seen.items():
        node, steps = d, 0
        while node != a and steps <= depth:
            node //= 10
            steps += 1
        assert node == a and steps == depth
