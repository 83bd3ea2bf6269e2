"""OCR-address normalization ahead of the geocode join.

The reference's geocoder (city-directories.js:272-323, backed by
@spacetime/nyc-historical-geocoder) resolves messy OCR address strings
— abbreviated street types, contractions, corner forms, half numbers —
that an exact string join would miss. Every case here FAILED the
pre-normalization exact join (value != address_name) and must resolve
through ``geocode_locations``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_city_directories_spark.operators.citydir import (
    GEOCODE_MISS_MOD,
    geocode_locations,
    normalize_address,
)

# (messy OCR value, expected house-level address_name or None,
#  expected street_name, expects house-level match)
CASES = [
    # street-type suffix + trailing period
    ("23 Pearl st.", "23 Pearl", "Pearl", True),
    # explicit 'street' suffix
    ("88 Water street", "88 Water", "Water", True),
    # leading home marker the parser may leave behind
    ("h 14 Elm", "14 Elm", "Elm", True),
    # OCR contraction of Broadway
    ("112 B'way", "112 Broadway", "Broadway", True),
    # 'No.' prefix
    ("No. 45 Orchard", "45 Orchard", "Orchard", True),
    # half house number
    ("23½ Cherry", "23 Cherry", "Cherry", True),
    ("23 1/2 Cherry", "23 Cherry", "Cherry", True),
    # avenue abbreviation
    ("17 Mulberry ave", "17 Mulberry", "Mulberry", True),
    # case-insensitive street match
    ("9 pearl", "9 Pearl", "Pearl", True),
    # corner forms: number-less → street-level fallback
    ("Pearl c Cherry", None, "Pearl", False),
    ("cor. Pearl & Cherry", None, "Pearl", False),
    ("n e cor Greenwich & Canal", None, "Greenwich", False),
    ("Greenwich cor Canal", None, "Greenwich", False),
]


@pytest.fixture(scope="module")
def geocoded(spark):
    df = spark.createDataFrame(
        [(i, v) for i, (v, _, _, _) in enumerate(CASES)],
        ["case_id", "loc_value"],
    )
    rows = geocode_locations(spark, df).orderBy("case_id").collect()
    return {r.case_id: r for r in rows}


@pytest.mark.parametrize(
    "idx", range(len(CASES)), ids=[c[0] for c in CASES]
)
def test_messy_address_resolves(geocoded, idx):
    value, addr_name, street, house_level = CASES[idx]
    r = geocoded[idx]
    assert r.found, f"{value!r} must geocode (norm={r.loc_norm!r})"
    assert r.street_name == street
    if house_level:
        assert r.address_id is not None, value
        # the join is case-insensitive; loc_norm keeps the input's case
        assert r.loc_norm.lower() == addr_name.lower()
    else:
        # corner form: street-level result, no house-level address
        assert r.address_id is None, value
        assert r.street_id is not None


def test_normalization_is_identity_on_clean_forms(spark):
    """The standing corpus emits parser-clean '<num> <Street>' values —
    normalization must not perturb them (keeps cd_geocode's oracle
    hash stable)."""
    clean = ["23 Pearl", "1 Broadway", "299 Orchard", "154 Greenwich"]
    df = spark.createDataFrame([(v,) for v in clean], ["loc_value"])
    got = [
        r.n for r in df.select(normalize_address(F.col("loc_value")).alias("n")).collect()
    ]
    assert got == clean


def test_spark_and_duckdb_normalize_identically(spark):
    """The oracle replays the chain on CLEAN corpus values only; this
    pins the RE2/Java dialect agreement on the messy forms too (a \\1
    backreference mangled into chr(1) by a non-raw literal, or a
    lookahead RE2 rejects, would surface here)."""
    import duckdb

    from etl_city_directories_spark.operators.citydir import _norm_addr_sql

    values = [c[0] for c in CASES] + ["No. 23½ Pearl st.", "h 9 B'way,"]
    df = spark.createDataFrame([(v,) for v in values], ["loc_value"])
    spark_norm = [
        r.n
        for r in df.select(
            normalize_address(F.col("loc_value")).alias("n")
        ).collect()
    ]
    con = duckdb.connect()
    duck_norm = [
        con.execute(f"SELECT {_norm_addr_sql('?')}", [v]).fetchone()[0]
        for v in values
    ]
    assert spark_norm == duck_norm


def test_dim_miss_is_still_a_miss(spark):
    """Normalization must not fabricate matches: a house number the dim
    excludes (divisible by GEOCODE_MISS_MOD) stays found=false even in
    messy form."""
    n = GEOCODE_MISS_MOD * 3
    df = spark.createDataFrame(
        [(0, f"{n} Pearl st."), (1, "23 Nowhere st.")], ["case_id", "loc_value"]
    )
    rows = geocode_locations(spark, df).orderBy("case_id").collect()
    assert not rows[0].found and rows[0].address_id is None
    assert not rows[1].found and rows[1].street_id is None
