"""Data-scaled ER blocking-key width: Python rule == oracle SQL rule.

The r7 verdict flagged er_blocked_pairs' fixed 2-char suffix as the
only §2.B plan whose block population grows linearly with the corpus
(pairs quadratically). The fix derives the width from the corpus size;
these tests pin (a) the integer-exact formula, (b) bit-equality with
the oracle's scalar-subquery formula across the ceil boundaries, and
(c) that the historical width 2 is preserved at the driver's gate
scales, so r1-r7 oracle evidence stays valid.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_city_directories_spark.operators.linkage import (
    BLOCK_SUFFIX,
    N_NATIONS,
    TARGET_BLOCK_POP,
    _W_SQL,
)


def _py_width(n: int) -> int:
    m = (n + N_NATIONS * TARGET_BLOCK_POP - 1) // (N_NATIONS * TARGET_BLOCK_POP)
    return max(BLOCK_SUFFIX, len(str(m - 1)))


@pytest.mark.parametrize(
    "n,expect",
    [
        (1, 2),
        (625, 2),  # m=1 -> digits(0)=1 -> clamp
        (1_500, 2),  # sf0.01: historical width preserved
        (15_000, 2),  # sf0.1: historical width preserved
        (62_500, 2),  # m=100 -> digits(99)=2
        (62_501, 3),  # m=101 -> digits(100)=3
        (150_000, 3),  # 10x probe corpus
        (625_000, 3),
        (625_001, 4),
        (1_500_000_000, 7),  # ~100 TB-scale row count
    ],
)
def test_width_formula(n, expect):
    assert _py_width(n) == expect
    # expected block population bound holds for digit-tail names
    assert n / (N_NATIONS * 10 ** _py_width(n)) <= TARGET_BLOCK_POP


def test_oracle_formula_matches_python_across_boundaries():
    con = duckdb.connect()
    # every ceil boundary up to 10^7 plus nearby off-by-ones
    ns = [1, 2, 624, 625, 626, 1250, 6249, 6250, 6251]
    for b in (62_500, 625_000, 6_250_000):
        ns += [b - 1, b, b + 1]
    for n in ns:
        con.execute(
            "CREATE OR REPLACE VIEW customer AS "
            f"SELECT * FROM range({n})"
        )
        got = con.execute(f"SELECT {_W_SQL}").fetchone()[0]
        assert got == _py_width(n), (n, got, _py_width(n))


def test_width_at_gate_scales_is_historical(spark):
    from etl_city_directories_spark.operators.linkage import block_width

    assert block_width(spark, "/root/testdata/sf0.001") == 2
    assert block_width(spark, "/root/testdata/sf0.01") == 2
    assert block_width(spark, "/root/testdata/sf0.1") == 2


def _py_mod(n: int) -> int:
    return max(10, (n + 1499) // 1500)


@pytest.mark.parametrize(
    "n,expect",
    [
        (1, 10),
        (1_500, 10),  # sf0.01: historical mod preserved
        (15_000, 10),  # sf0.1: historical mod preserved
        (15_001, 11),
        (150_000, 100),  # 10x probe corpus: stratum stays ~1500
        (1_500_000_000, 1_000_000),
    ],
)
def test_audit_mod_formula(n, expect):
    assert _py_mod(n) == expect
    # stratum size stays bounded near the target
    assert n // _py_mod(n) <= 1_500


def test_audit_mod_oracle_matches_python():
    from etl_city_directories_spark.operators.linkage import _MOD_SQL

    con = duckdb.connect()
    for n in [1, 1499, 1500, 1501, 14999, 15000, 15001, 150000, 2_999_999]:
        con.execute(
            "CREATE OR REPLACE VIEW customer AS "
            f"SELECT * FROM range({n})"
        )
        got = con.execute(f"SELECT {_MOD_SQL}").fetchone()[0]
        assert got == _py_mod(n), (n, got, _py_mod(n))


def test_audit_mod_at_gate_scales_is_historical(spark):
    from etl_city_directories_spark.operators.linkage import audit_mod

    assert audit_mod(spark, "/root/testdata/sf0.01") == 10
    assert audit_mod(spark, "/root/testdata/sf0.1") == 10
