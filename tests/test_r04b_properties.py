"""Property tests for the second r04 batch.

Each property is evaluated as ONE batched Spark pass over a seeded
generated frame (same policy as test_norm_properties: Spark job
startup dominates per-example hypothesis rounds).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_city_directories_spark.operators.scale_ops import (
    ZORDER_BITS,
    _morton_col,
)


def _python_morton(x: int, y: int) -> int:
    z = 0
    for i in range(ZORDER_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_python_and_is_bijective(spark):
    """The Spark shift/mask chain equals the reference interleave on a
    random sample, and the mapping is injective over it (a collision
    would corrupt layout bucketing)."""
    rng = random.Random(7)
    pts = [(rng.randrange(256), rng.randrange(256)) for _ in range(500)]
    pts += [(0, 0), (255, 255), (0, 255), (255, 0)]  # corners
    df = spark.createDataFrame(pts, ["x", "y"]).distinct()
    rows = df.select("x", "y", _morton_col(F.col("x"), F.col("y")).alias("z")).collect()
    seen = {}
    for r in rows:
        assert r.z == _python_morton(r.x, r.y), r
        assert 0 <= r.z < (1 << (2 * ZORDER_BITS))
        assert r.z not in seen or seen[r.z] == (r.x, r.y)
        seen[r.z] = (r.x, r.y)
    assert len(seen) == len(rows)  # injective on the sample


def test_morton_locality_bound(spark):
    """The z-curve locality guarantee the layout op relies on: points
    sharing the top 2k z-bits agree on the top k bits of BOTH
    dimensions (this is exactly why per-bucket min/max spans are
    bounded)."""
    rng = random.Random(11)
    pts = [(rng.randrange(256), rng.randrange(256)) for _ in range(400)]
    df = spark.createDataFrame(pts, ["x", "y"]).distinct()
    rows = df.select(
        "x", "y", _morton_col(F.col("x"), F.col("y")).alias("z")
    ).collect()
    buckets: dict[int, list] = {}
    for r in rows:
        buckets.setdefault(r.z >> 8, []).append(r)  # top 8 z-bits
    for zb, rs in buckets.items():
        xs = {r.x >> 4 for r in rs}
        ys = {r.y >> 4 for r in rs}
        assert len(xs) == 1 and len(ys) == 1, (zb, rs)


def test_segment_hash_alignment_property(spark):
    """Shifting a document by a non-multiple of the segment width
    breaks every segment hash (fixed-window dedup is alignment-
    sensitive BY DESIGN — the docstring's contract), while an
    8-word-aligned prefix drop preserves the remaining segments."""
    from etl_city_directories_spark.operators.dedup import (
        SEGMENT_WORDS,
        segment_stats,
    )

    words = ["w%d" % i for i in range(SEGMENT_WORDS * 4)]
    base = " ".join(words)
    misaligned = " ".join(words[1:])               # shift by 1
    aligned_drop = " ".join(words[SEGMENT_WORDS:])  # drop one segment
    got = {
        r.doc_id: r
        for r in segment_stats(
            spark.createDataFrame(
                [(0, base), (1, misaligned), (2, aligned_drop)],
                ["doc_id", "text"],
            )
        ).collect()
    }
    # aligned suffix: all 3 of its segments also occur in base
    assert got[2].n_dup_segs == got[2].n_segs == 3
    # base shares those 3 with doc 2; its first segment is unique
    assert got[0].n_segs == 4 and got[0].n_dup_segs == 3
    # 1-word shift: no segment hash survives
    assert got[1].n_dup_segs == 0


def test_reservoir_insensitive_to_partitioning(spark):
    """Bottom-K-by-hash must return the identical sample whatever the
    input partitioning — the merge-of-local-heaps property."""
    from etl_city_directories_spark.operators.textstats import RESERVOIR_K

    ids = [(i,) for i in range(1000)]
    key = F.md5(F.col("doc_id").cast("string"))
    picks = []
    for parts in (1, 7, 32):
        df = spark.createDataFrame(ids, ["doc_id"]).repartition(parts)
        got = (
            df.select("doc_id", key.alias("p"))
            .orderBy("p", "doc_id")
            .limit(RESERVOIR_K)
            .collect()
        )
        picks.append([r.doc_id for r in got])
    assert picks[0] == picks[1] == picks[2]
