"""Property tests for the normalization chains.

Normalization must be IDEMPOTENT — norm(norm(x)) == norm(x) — or the
oracle (which applies the chain once) and any pipeline that re-passes
already-normalized values (cd_geocode feeding transform) could diverge.
Evaluated as one batched Spark pass over a seeded generated corpus
rather than per-example hypothesis rounds (Spark job startup dominates
otherwise).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_city_directories_spark.operators.citydir import (
    STREETS,
    _canon_subject,
    normalize_address,
)

_MARKERS = ["", "h ", "r ", "bds ", "b. ", "No. "]
_SUFFIXES = ["", " st", " st.", " street", " av", " ave.", " avenue", "."]
_CORNERS = ["", "cor ", "n e cor ", "corner "]


def _messy_addresses(n: int, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        street = rng.choice(STREETS + ("B'way", "Gr'wich", "bway"))
        if rng.random() < 0.3:
            other = rng.choice(STREETS)
            joiner = rng.choice([" & ", " c ", " and ", " cor "])
            out.append(
                f"{rng.choice(_CORNERS)}{street}{joiner}{other}"
                + rng.choice(["", "."])
            )
        else:
            num = rng.randint(1, 330)
            half = rng.choice(["", "½", " 1/2"])
            out.append(
                f"{rng.choice(_MARKERS)}{num}{half} {street}"
                f"{rng.choice(_SUFFIXES)}"
            )
    return out


def _idempotent(spark, values: list[str], expr_fn) -> list[tuple]:
    df = spark.createDataFrame([(v,) for v in values], ["raw"])
    once = df.select("raw", expr_fn(F.col("raw")).alias("n1"))
    twice = once.select("raw", "n1", expr_fn(F.col("n1")).alias("n2"))
    return [(r.raw, r.n1, r.n2) for r in twice.collect() if r.n1 != r.n2]


def test_normalize_address_idempotent(spark):
    bad = _idempotent(spark, _messy_addresses(400), normalize_address)
    assert not bad, f"non-idempotent normalizations: {bad[:5]}"


def test_canon_subject_idempotent(spark):
    rng = random.Random(7)
    first = ["Wm.", "Wm", "Chas", "Thos.", "Geo", "Jas", "Robt", "Saml",
             "Edw.", "Benj", "Danl", "Fredk", "Jno", "Mary", "Peter"]
    last = ["Smith", "Brown", "Miller", "Johnson", "Davis", "Wilson"]
    names = [
        f"{rng.choice(last)} {rng.choice(first)}"
        + rng.choice(["", " H", " B.", "  J"])
        for _ in range(300)
    ]
    bad = _idempotent(spark, names, _canon_subject)
    assert not bad, f"non-idempotent canonicalizations: {bad[:5]}"
