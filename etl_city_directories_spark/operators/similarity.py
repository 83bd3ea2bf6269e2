"""Approximate-nearest-neighbor search over the embedding column.

- ``ann_topk_bruteforce``: exact cosine top-k. The probe side is a
  small capped set that broadcasts; the corpus side streams — at 100 TB
  the cost is one corpus scan per batch of probes, which is the honest
  brute-force baseline.
- ``ann_ivf_bucketed``: the scale path. Vectors are coarse-partitioned
  into buckets (here the ``label`` column plays the trained IVF cell
  id; on real data it would be argmin-centroid from a k-means pass) and
  each probe searches ONLY its own bucket — the bucket id is the
  shuffle key, cutting compared pairs by ~|buckets|×.

Cosine uses sequential-left-fold dot products (bit-identical in Spark
and DuckDB); ranking orders by round(cos, 6) with vec_id tiebreak so
float noise below 1e-6 can't flip ranks across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_city_directories_spark.sources.tables import load_table, load_table_parallel

N_PROBES = 10
TOP_K = 5


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table_parallel(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # persisted: probe and corpus sides of the ANN joins share this
    return e.withColumn(
        "nrm", F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
    ).persist()


def _cos(va: Column, vb: Column, na: Column, nb: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return dot / (F.sqrt(na) * F.sqrt(nb))


def _topk(pairs: DataFrame) -> DataFrame:
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_r6"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            "neighbor_id",
            F.round("cos_r6", 4).alias("cos_sim"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast probes × streaming corpus."""
    vecs = _vectors(spark, sf_dir)
    probes = vecs.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("nrm").alias("pn"),
    )
    pairs = (
        load_table_parallel(spark, sf_dir, "embeddings")
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("cv"),
        )
        .withColumn("cn", F.aggregate("cv", F.lit(0.0), lambda acc, x: acc + x * x))
        .join(F.broadcast(probes), F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(
                _cos(F.col("pv"), F.col("cv"), F.col("pn"), F.col("cn")), 6
            ).alias("cos_r6"),
        )
    )
    return _topk(pairs)


# IVF coarse quantizer: K cells, trained with KMEANS_ITERS Lloyd
# rounds from a deterministic md5-ranked seed set; probes search their
# IVF_NPROBE nearest cells (the recall knob). Production tuning scales
# K ~ sqrt(n) and nprobe with the recall target.
N_CELLS = 8
KMEANS_ITERS = 2
IVF_NPROBE = 2


def _dist2(v: Column, c: Column) -> Column:
    """Squared L2 distance as a sequential left fold (bit-identical to
    the DuckDB list_reduce fold)."""
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_cells(spark: SparkSession, sf_dir: str, n_best: int = 1) -> DataFrame:
    """Train the IVF coarse quantizer and assign every vector a cell.

    Lloyd iterations expressed as DataFrame ops end-to-end:
    - init: the N_CELLS vectors with the smallest md5(vec_id) — a
      deterministic pseudo-random sample any engine can replay (no RNG
      state). TakeOrdered top-K, not a global sort.
    - assign: crossJoin(broadcast(centroids)) + row_number argmin over
      (dist², cell id) — the centroid table is K rows, so this is a
      map-side broadcast join; ties break on cell id in both engines.
    - update: per-dimension centroid means with DECIMAL(27,6) sums —
      decimal addition is associative, so shuffle order can't flip a
      bit, and the DuckDB oracle reproduces the exact same centroids;
      the mean itself divides as double.

    Returns (vec_id, label, v, nrm, cell, cell_rank) with cell_rank ≤
    n_best: rank 1 is the cell a vector BELONGS to; ranks 2..n_best are
    the next-nearest cells (what an nprobe>1 probe also searches). At
    100 TB: assignment is a broadcast map per round, the update is one
    groupBy(cell, dim) shuffle of (K × dims) partials — Lloyd's the
    classic MapReduce way.
    """
    vecs = _vectors(spark, sf_dir)
    seeds = (
        vecs.select(
            "vec_id", "v", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h")
        .limit(N_CELLS)
    )
    w_seed = Window.orderBy("h")  # 8 rows post-limit; the window is tiny
    cents = seeds.withColumn("cluster_id", F.row_number().over(w_seed)).select(
        "cluster_id", F.col("v").alias("c")
    )
    w_arg = Window.partitionBy("vec_id").orderBy("d2", "cluster_id")
    assigned = None
    for it in range(KMEANS_ITERS):
        final = it == KMEANS_ITERS - 1
        assigned = (
            vecs.select("vec_id", "v")
            .crossJoin(F.broadcast(cents))
            .select(
                "vec_id",
                "v",
                "cluster_id",
                _dist2(F.col("v"), F.col("c")).alias("d2"),
            )
            .withColumn("rn", F.row_number().over(w_arg))
            .filter(F.col("rn") <= (n_best if final else 1))
            .select(
                "vec_id",
                "v",
                F.col("cluster_id").alias("cell"),
                F.col("rn").cast("bigint").alias("cell_rank"),
            )
        )
        if final:
            break
        # per-dim means via posexplode + groupBy(cell, dim): the
        # exploded row count is |vectors| × dims with map-side partial
        # aggregation — measured faster than 64 wide agg buffers
        # (decimal sums keep it shuffle-order-independent either way)
        cents = (
            assigned.select("cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(27,6)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("val")
            )
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "val"))),
                    lambda s: s["val"],
                ).alias("c")
            )
            .withColumnRenamed("cell", "cluster_id")
        )
    return vecs.join(assigned.select("vec_id", "cell", "cell_rank"), "vec_id")


def ann_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: k-means-trained coarse cells; each probe searches its
    IVF_NPROBE nearest cells, the corpus lives in its rank-1 cell. The
    cell id is the shuffle key — compared pairs drop by ~|cells|/nprobe
    × vs brute force; recall vs brute force is asserted in
    tests/test_dedup_quality.py. A probe's nprobe cells are distinct,
    so no pair dedup is needed."""
    vecs = kmeans_cells(spark, sf_dir, n_best=IVF_NPROBE).persist()
    probes = vecs.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("cell").alias("bucket"),
        F.col("v").alias("pv"),
        F.col("nrm").alias("pn"),
    )
    pairs = (
        vecs.filter(F.col("cell_rank") == 1)
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("cell").alias("bucket"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
        .join(F.broadcast(probes), "bucket")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(
                _cos(F.col("pv"), F.col("cv"), F.col("pn"), F.col("cn")), 6
            ).alias("cos_r6"),
        )
    )
    return _topk(pairs)


# 4 sign bits × 8 tables → recall@5 ≈ 0.74 vs brute force on the test
# corpus with 2× candidate pruning. Production tuning scales bits with
# corpus size (16-20 bits at 10^9+ vectors) and tables with the recall
# target; both just change these constants — bucketing stays exact.
N_PLANES = 4
N_TABLES = 8
N_DIMS = 64


def _plane_signs() -> list[list[list[float]]]:
    """Deterministic ±1 hyperplane components per (table, plane, dim):
    parity of the first hex digit of md5('table|plane|dim'). No RNG
    state, reproducible in any engine — the DuckDB oracle embeds the
    same literals."""
    import hashlib

    def sign(t: int, j: int, d: int) -> float:
        h = hashlib.md5(f"{t}|{j}|{d}".encode()).hexdigest()
        return 1.0 if int(h[0], 16) % 2 == 0 else -1.0

    return [
        [[sign(t, j, d) for d in range(N_DIMS)] for j in range(N_PLANES)]
        for t in range(N_TABLES)
    ]


def _bucket_expr(signs_t: list[list[float]]) -> Column:
    """Sign-bit bucket string for one hash table."""
    return F.concat(
        *[
            F.when(
                F.aggregate(
                    F.zip_with(
                        "v",
                        F.array(*[F.lit(s) for s in signs_j]),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for signs_j in signs_t
        ]
    )


def ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-random-projection LSH ANN (Charikar 2002): N_TABLES
    independent hash tables of N_PLANES sign bits each; a vector is a
    candidate for a probe if they share a bucket in ANY table (the
    OR-construction that trades a little extra candidate work for
    recall — single-table SRP recalls ~0.1 here, 4 tables ~0.8+).

    posexplode turns the table axis into rows, so (table, bucket) is
    the shuffle key — candidate generation is a hash join, never a
    cross product; pairs colliding in several tables dedup in the same
    aggregation that carries the cosine. Projections are sequential
    left-folds, bit-identical in the DuckDB oracle, so bucketing (and
    the whole result) is exactly reproducible. Recall vs brute force
    is asserted in tests/test_dedup_quality.py.
    """
    vecs = _vectors(spark, sf_dir)
    signs = _plane_signs()
    buckets = F.array(*[_bucket_expr(signs[t]) for t in range(N_TABLES)])
    # persisted: probe and corpus sides below are a self-join, and Spark
    # recomputes the (expensive, 32-projection) bucket expressions per
    # alias otherwise
    hashed = vecs.select(
        "vec_id", "v", "nrm", F.posexplode(buckets).alias("t", "bucket")
    ).persist()
    probes = hashed.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        "t",
        "bucket",
        F.col("v").alias("pv"),
        F.col("nrm").alias("pn"),
    )
    pairs = (
        hashed.select(
            F.col("vec_id").alias("neighbor_id"),
            "t",
            "bucket",
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
        .join(F.broadcast(probes), ["t", "bucket"])
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .groupBy("probe_id", "neighbor_id")
        .agg(
            F.min(
                F.round(
                    _cos(F.col("pv"), F.col("cv"), F.col("pn"), F.col("cn")), 6
                )
            ).alias("cos_r6")
        )
    )
    return _topk(pairs)


QUERIES = {
    "ann_topk_bruteforce": ann_topk_bruteforce,
    "ann_ivf_bucketed": ann_ivf_bucketed,
    "ann_lsh_cosine": ann_lsh_cosine,
}

_VEC_CTE = """
  vecs AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS v,
           list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
                       (a, b) -> a + b) AS nrm
    FROM embeddings
  )
"""

_COS = (
    "list_reduce(list_transform(list_zip({a}.v, {b}.v), x -> x[1] * x[2]), "
    "(p, q) -> p + q) / (sqrt({a}.nrm) * sqrt({b}.nrm))"
)

def _bucket_sql(signs_t: list[list[float]]) -> str:
    parts = []
    for signs_j in signs_t:
        lit = "[" + ", ".join(str(s) for s in signs_j) + "]"
        proj = (
            f"list_reduce(list_transform(list_zip(v, {lit}), "
            "x -> x[1] * x[2]), (p, q) -> p + q)"
        )
        parts.append(f"CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END")
    return " || ".join(parts)


def _hashed_sql() -> str:
    """One SELECT per hash table, unioned: (vec_id, t, bucket, v, nrm)."""
    return "\n          UNION ALL\n".join(
        f"          SELECT vec_id, {t} AS t, {_bucket_sql(signs_t)} AS bucket,"
        " v, nrm FROM vecs"
        for t, signs_t in enumerate(_plane_signs())
    )


_D2_SQL = (
    "list_reduce(list_transform(list_zip(v.v, c.c), "
    "x -> (x[1] - x[2]) * (x[1] - x[2])), (p, q) -> p + q)"
)


def _kmeans_ctes() -> str:
    """CTE chain replaying kmeans_cells exactly: md5-ranked seeds,
    then KMEANS_ITERS × (argmin assign [+ decimal-mean update])."""
    ctes = [
        f"""seeds AS (
          SELECT vec_id, v, md5(CAST(vec_id AS VARCHAR)) AS h
          FROM vecs ORDER BY h LIMIT {N_CELLS}
        )""",
        """cents0 AS (
          SELECT ROW_NUMBER() OVER (ORDER BY h) AS cluster_id, v AS c
          FROM seeds
        )""",
    ]
    for it in range(KMEANS_ITERS):
        n_keep = IVF_NPROBE if it == KMEANS_ITERS - 1 else 1
        ctes.append(f"""assign{it} AS (
          SELECT vec_id, v, cell, rn AS cell_rank FROM (
            SELECT v.vec_id, v.v, c.cluster_id AS cell,
                   ROW_NUMBER() OVER (
                     PARTITION BY v.vec_id
                     ORDER BY {_D2_SQL}, c.cluster_id
                   ) AS rn
            FROM vecs v CROSS JOIN cents{it} c
          ) WHERE rn <= {n_keep}
        )""")
        if it < KMEANS_ITERS - 1:
            ctes.append(f"""cents{it + 1} AS (
          SELECT cell AS cluster_id, list(val ORDER BY dim) AS c
          FROM (
            SELECT cell, dim,
                   (SUM(x::DECIMAL(27,6)))::DOUBLE / COUNT(*) AS val
            FROM (
              SELECT cell, generate_subscripts(v, 1) AS dim, unnest(v) AS x
              FROM assign{it}
            )
            GROUP BY cell, dim
          )
          GROUP BY cell
        )""")
    ctes.append(f"""cells AS (
          SELECT vec_id, cell, cell_rank FROM assign{KMEANS_ITERS - 1}
        )""")
    return ",\n        ".join(ctes)


ORACLES = {
    "ann_lsh_cosine": f"""
        WITH {_VEC_CTE},
        hashed AS (
{_hashed_sql()}
        ),
        pairs AS (
          SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                 MIN(ROUND({_COS.format(a="p", b="c")}, 6)) AS cos_r6
          FROM hashed p JOIN hashed c
            ON c.t = p.t AND c.bucket = p.bucket AND c.vec_id != p.vec_id
          WHERE p.vec_id < {N_PROBES}
          GROUP BY 1, 2
        ),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY probe_id ORDER BY cos_r6 DESC, neighbor_id ASC
          ) AS rank
          FROM pairs
        )
        SELECT probe_id, neighbor_id, ROUND(cos_r6, 4) AS cos_sim, rank
        FROM ranked WHERE rank <= {TOP_K}
    """,
    "ann_topk_bruteforce": f"""
        WITH {_VEC_CTE},
        pairs AS (
          SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                 ROUND({_COS.format(a="p", b="c")}, 6) AS cos_r6
          FROM vecs p JOIN vecs c ON c.vec_id != p.vec_id
          WHERE p.vec_id < {N_PROBES}
        ),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY probe_id ORDER BY cos_r6 DESC, neighbor_id ASC
          ) AS rank
          FROM pairs
        )
        SELECT probe_id, neighbor_id, ROUND(cos_r6, 4) AS cos_sim, rank
        FROM ranked WHERE rank <= {TOP_K}
    """,
    "ann_ivf_bucketed": f"""
        WITH {_VEC_CTE},
        {_kmeans_ctes()},
        probe_cells AS (
          SELECT vecs.*, cells.cell FROM vecs JOIN cells USING (vec_id)
          WHERE vec_id < {N_PROBES}
        ),
        corpus AS (
          SELECT vecs.*, cells.cell FROM vecs JOIN cells USING (vec_id)
          WHERE cells.cell_rank = 1
        ),
        pairs AS (
          SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                 ROUND({_COS.format(a="p", b="c")}, 6) AS cos_r6
          FROM probe_cells p JOIN corpus c
            ON c.cell = p.cell AND c.vec_id != p.vec_id
        ),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY probe_id ORDER BY cos_r6 DESC, neighbor_id ASC
          ) AS rank
          FROM pairs
        )
        SELECT probe_id, neighbor_id, ROUND(cos_r6, 4) AS cos_sim, rank
        FROM ranked WHERE rank <= {TOP_K}
    """,
}
