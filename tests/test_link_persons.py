"""cd_link_persons secondary blocking: era name-variant linkage.

1850s directories print the same person as 'Brown Wm. H' one year and
'Brown William H' the next — an exact-subject block never pairs them.
The (surname, first-initial) block over the canonicalized subject must,
with the score/tie-break keeping precision.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_city_directories_spark.operators.citydir import (
    _canon_subject,
    link_person_entries,
)

COLS = ["doc_id", "year_lo", "subject", "occupation", "loc1"]
ROWS = [
    # name-variant pair: abbreviation one year, full name the next,
    # same address + occupation → must link through the secondary block
    (1, 1860, "Brown Wm. H", "grocer", "23 Pearl"),
    (2, 1861, "Brown William H", "grocer", "23 Pearl"),
    # same block (Brown W) but different person: nothing else agrees →
    # score 0, filtered out
    (3, 1861, "Brown Walter", "mason", "9 Canal"),
    # exact-name repeat across years still links (primary behavior)
    (4, 1860, "Smith John", "clerk", "14 Elm"),
    (5, 1861, "Smith John", "tailor", "88 Water"),
    # two candidates for doc 6: the higher-scoring one wins best_link
    (6, 1870, "Taylor Robt", "printer", "7 Cherry"),
    (7, 1871, "Taylor Robert", "printer", "7 Cherry"),   # score 4
    (8, 1871, "Taylor Robert", "porter", "120 Orchard"), # score 2
    # adjacent-year constraint: same name two years later → no pair
    (9, 1880, "White Danl", "smith", "3 Mulberry"),
    (10, 1882, "White Danl", "smith", "3 Mulberry"),
]


def _links(spark):
    df = spark.createDataFrame(ROWS, COLS)
    return link_person_entries(df).collect()


def test_name_variant_links_via_secondary_block(spark):
    got = {(r.doc_a, r.doc_b) for r in _links(spark)}
    assert (1, 2) in got  # Wm. → William through the canonical block


def test_same_block_different_person_filtered(spark):
    got = {(r.doc_a, r.doc_b) for r in _links(spark)}
    assert not any(b == 3 for _, b in got)  # Brown Walter: score 0


def test_exact_name_still_links(spark):
    rows = {(r.doc_a, r.doc_b): r for r in _links(spark)}
    r = rows[(4, 5)]  # same canonical name alone reaches the threshold
    assert r.match_score == 2 and not r.same_address


def test_tie_break_prefers_higher_score(spark):
    rows = {(r.doc_a, r.doc_b): r for r in _links(spark)}
    assert rows[(6, 7)].match_score == 4 and rows[(6, 7)].best_link
    assert rows[(6, 8)].match_score == 2 and not rows[(6, 8)].best_link


def test_non_adjacent_years_never_pair(spark):
    got = {(r.doc_a, r.doc_b) for r in _links(spark)}
    assert (9, 10) not in got


def test_hot_block_capped_but_addr_pairs_survive(spark):
    """A (name, year) cell denser than LINK_MAX_BLOCK is excluded
    whole from name-key pair generation (the deterministic production
    cap the r7 verdict asked for), but pairs that also agree on
    address + occupation still link through the A-key, whose cells
    stay small."""
    from etl_city_directories_spark.operators.citydir import (
        LINK_MAX_BLOCK,
    )

    hot = LINK_MAX_BLOCK + 10
    rows = []
    # hot cell: `hot` "Smith John" entries in 1860 AND 1861, each at a
    # DISTINCT address/occupation except one exact repeat pair
    for i in range(hot):
        rows.append((1000 + i, 1860, "Smith John", f"occ{i}", f"{i} Elm"))
        rows.append((2000 + i, 1861, "Smith John", f"occ{i + hot}", f"{i + hot} Elm"))
    # the one entry whose address+occupation repeat across the years
    rows.append((3001, 1860, "Smith John", "tailor", "9 Canal"))
    rows.append((3002, 1861, "Smith John", "tailor", "9 Canal"))
    # control: a small cell elsewhere still links by name alone
    rows.append((4001, 1860, "Quiet Ann", "nurse", "1 Oak"))
    rows.append((4002, 1861, "Quiet Ann", "baker", "2 Oak"))
    df = spark.createDataFrame(rows, COLS)
    got = link_person_entries(df).collect()
    pairs = {(r.doc_a, r.doc_b) for r in got}
    # the hot name cell emits NO name-only pairs...
    assert not any(1000 <= a < 1100 and 2000 <= b < 2100 for a, b in pairs)
    # ...but the address+occupation pair inside it survives via A-key
    assert (3001, 3002) in pairs
    # and the small cell links by name as usual
    assert (4001, 4002) in pairs


def test_canon_subject_expansions(spark):
    cases = {
        "Brown Wm. H": "Brown William H",
        "Miller Chas": "Miller Charles",
        "Johnson Thos. B": "Johnson Thomas B",
        "Davis Geo. W": "Davis George W",
        "Plain Name": "Plain Name",
        "Williams Jno": "Williams John",
    }
    df = spark.createDataFrame([(k,) for k in cases], ["subject"])
    got = {
        r.subject: r.canon
        for r in df.select(
            "subject", _canon_subject(F.col("subject")).alias("canon")
        ).collect()
    }
    assert got == cases
