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


def ann_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probes search only their own coarse bucket."""
    vecs = _vectors(spark, sf_dir)
    probes = vecs.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("bucket"),
        F.col("v").alias("pv"),
        F.col("nrm").alias("pn"),
    )
    pairs = (
        vecs.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("bucket"),
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


QUERIES = {
    "ann_topk_bruteforce": ann_topk_bruteforce,
    "ann_ivf_bucketed": ann_ivf_bucketed,
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

ORACLES = {
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
        pairs AS (
          SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                 ROUND({_COS.format(a="p", b="c")}, 6) AS cos_r6
          FROM vecs p JOIN vecs c ON c.label = p.label AND c.vec_id != p.vec_id
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
}
