"""Adversarial edge cases for q_histogram_equidepth (windows.py).

The operator computes NTILE's fill-first-buckets semantics as a
closed-form expression over a DISTRIBUTED global rank built from
``repartitionByRange`` + per-partition row_number + broadcast offsets.
That closed form must stay bit-identical to a real NTILE under the
shapes that break naive implementations:

  (a) emptier-than-partitions input (32 range partitions, <32 rows) —
      empty partitions must not shift the offsets;
  (b) heavy ties on o_totalprice — the o_orderkey tiebreak must keep
      the total order unambiguous in BOTH engines;
  (c) N % buckets edge cases (N < B, N == B, N % B == 0, N % B == B-1)
      — the fat-bucket/thin-bucket boundary arithmetic.

Verdict r04 item 6. Each case round-trips through a real parquet file
(the operator's own load path) and compares to DuckDB's NTILE exactly.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from etl_city_directories_spark.operators.windows import (
    N_DEPTH_BUCKETS,
    q_histogram_equidepth,
)

ORACLE = f"""
    SELECT bucket,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM (
      SELECT o_totalprice,
             NTILE({N_DEPTH_BUCKETS})
               OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    GROUP BY bucket ORDER BY bucket
"""


def _roundtrip(spark, tmp_path, rows):
    """Write rows as orders.parquet, run operator + DuckDB NTILE."""
    sf_dir = str(tmp_path)
    df = spark.createDataFrame(rows, "o_orderkey BIGINT, o_totalprice DOUBLE")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/orders.parquet")
    got = [
        (r["bucket"], r["n_orders"], r["lo"], r["hi"])
        for r in q_histogram_equidepth(spark, sf_dir).collect()
    ]
    con = duckdb.connect()
    # Spark writes a directory of part files; glob them for DuckDB
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet/*.parquet')"
    )
    want = [tuple(r) for r in con.execute(ORACLE).fetchall()]
    return got, want


@pytest.mark.parametrize("n", [1, 3, 7, 9, 10, 11, 19, 20, 31])
def test_fewer_rows_than_partitions(spark, tmp_path, n):
    """(a)+(c): 32 range partitions over <32 rows — most partitions are
    empty — across every N < B, N == B, and N just-over-B shape."""
    rows = [(i, float(1000 - 7 * i)) for i in range(n)]
    got, want = _roundtrip(spark, tmp_path, rows)
    assert got == want, f"n={n}: {got} != {want}"


@pytest.mark.parametrize("n", [40, 100, 101, 109, 110])
def test_all_values_tied(spark, tmp_path, n):
    """(b): every o_totalprice identical — bucket boundaries exist ONLY
    through the o_orderkey tiebreak, and every bucket's lo == hi."""
    rows = [(i, 42.42) for i in range(n)]
    got, want = _roundtrip(spark, tmp_path, rows)
    assert got == want, f"n={n}: {got} != {want}"


def test_few_distinct_values_heavy_ties(spark, tmp_path):
    """(b): 3 distinct prices over 97 rows — range partitioning puts
    entire tie-groups into single partitions; the closed form must
    still split them exactly where NTILE does."""
    rows = [(i, float([10.0, 20.0, 30.0][i % 3])) for i in range(97)]
    got, want = _roundtrip(spark, tmp_path, rows)
    assert got == want


@pytest.mark.parametrize("n", [100, 103, 105, 109])
def test_remainder_shapes(spark, tmp_path, n):
    """(c): N % B = 0, 3, 5, 9 — the fat-bucket count is exactly N % B
    and fat buckets precede thin ones."""
    rng = random.Random(n)
    rows = [(i, round(rng.uniform(1.0, 9999.0), 2)) for i in range(n)]
    got, want = _roundtrip(spark, tmp_path, rows)
    assert got == want
    sizes = [g[1] for g in got]
    q, rem = divmod(n, N_DEPTH_BUCKETS)
    assert sizes == [q + 1] * rem + [q] * (N_DEPTH_BUCKETS - rem)


def test_random_ties_and_values_seeded(spark, tmp_path):
    """Property sweep: mixed ties + unique values at several N, one
    seeded RNG — any drift between the closed form and NTILE fails."""
    rng = random.Random(1234)
    for n in (17, 64, 333):
        rows = [
            (i, round(rng.choice([1.5, 2.5, rng.uniform(0, 100)]), 2))
            for i in range(n)
        ]
        got, want = _roundtrip(spark, tmp_path, rows)
        assert got == want, f"n={n}"
