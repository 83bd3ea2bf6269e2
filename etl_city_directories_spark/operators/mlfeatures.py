"""Feature-engineering and embedding-quality operators for ML prep.

The layer between the warehouse and a training job: target encoding,
weight-of-evidence binning, the hashing trick, embedding outlier
screening, Matryoshka truncation evaluation, and curriculum ordering.
The reference pipeline stops at per-entry objects
(nypl-spacetime/etl-city-directories city-directories.js:338-451);
these are the operators its downstream consumers would run next on a
100 TB corpus before any model sees the data.

Cross-engine determinism policy (the repo standard): exact
integer/decimal sufficient statistics first, closed-form doubles with
a fixed association order second, ONE ROUND at the edge; every ln()
term is quantized to DECIMAL(18,8) BEFORE entering arithmetic so libm
last-ulp differences cannot reach a driver hash; rank ties always
break on an id column.

Scale notes inline per operator. Nothing here exceeds one shuffle per
logical stage, and the embedding folds reuse the memoized normalized
vector table shared by every ANN index (operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_city_directories_spark.functions.numeric import dec2
from etl_city_directories_spark.operators.similarity import (
    N_PROBES,
    _VEC_CTE,
    _cos,
    _vectors,
)
from etl_city_directories_spark.sources.tables import (
    load_table,
    load_table_parallel,
)

FH_BUCKETS = 32  # hashing-trick output dimensionality
MAT_DIMS = 16  # Matryoshka truncation width (of 64)
MAT_K = 10  # recall@K
CURR_DECILES = 10


# ---------------------------------------------------------------------------
# tabular feature encoders
# ---------------------------------------------------------------------------


def feature_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the customer market segment
    against order value — THE high-cardinality categorical encoder for
    gradient-boosted / linear models, in its leakage-safe LOO form:
    each order's encoding excludes its own target, (seg_sum − own) /
    (seg_n − 1), NULL for singleton segments.

    Shape: one broadcast dim join (customer is dimension-sized) + one
    map-side-combinable groupBy(segment) whose two sufficient sums
    broadcast back — the fact table is touched exactly twice, never
    re-shuffled. Money stays integer cents until the single divide.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (dec2("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    seg = j.groupBy("c_mktsegment").agg(
        F.sum("cents").alias("seg_sum"), F.count(F.lit(1)).alias("seg_n")
    )
    enc = F.when(
        F.col("seg_n") > 1,
        F.round(
            (F.col("seg_sum") - F.col("cents")).cast("double")
            / (F.col("seg_n") - 1).cast("double")
            / 100.0,
            4,
        ),
    ).otherwise(F.lit(None).cast("double"))
    return j.join(F.broadcast(seg), "c_mktsegment").select(
        "o_orderkey",
        "c_mktsegment",
        enc.alias("loo_target_avg"),
    )


def feature_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence per discount bin against the return flag —
    the credit-scoring encoder: WoE = ln(good_share / bad_share),
    positive bins predict kept orders, negative bins predict returns.

    The bin grid is value-bounded (discount has ~11 distinct cents
    values), so after ONE map-side-combinable groupBy the whole
    computation is a constant-size frame. Each ln() is quantized to
    DECIMAL(18,8) before the subtraction chain (the repo's
    transcendental rule) and the shares are exact integer counts, so
    both engines produce the identical WoE bit pattern.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100).cast("int").alias("disc_pct"),
        (F.col("l_returnflag") == "R").alias("is_bad"),
    )
    per_bin = li.groupBy("disc_pct").agg(
        F.sum(F.when(F.col("is_bad"), 0).otherwise(1)).alias("n_good"),
        F.sum(F.when(F.col("is_bad"), 1).otherwise(0)).alias("n_bad"),
    )
    tot = per_bin.agg(
        F.sum("n_good").alias("tot_good"), F.sum("n_bad").alias("tot_bad")
    )
    d188 = "decimal(18,8)"

    def q(c):
        return F.log(c.cast("double")).cast(d188)

    woe = F.when(
        (F.col("n_good") > 0) & (F.col("n_bad") > 0),
        F.round(
            (
                q(F.col("n_good"))
                - q(F.col("tot_good"))
                - q(F.col("n_bad"))
                + q(F.col("tot_bad"))
            ).cast("double"),
            6,
        ),
    ).otherwise(F.lit(None).cast("double"))
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "disc_pct",
            F.col("n_good").cast("bigint").alias("n_good"),
            F.col("n_bad").cast("bigint").alias("n_bad"),
            woe.alias("woe"),
        )
        .orderBy("disc_pct")
    )


def feature_hash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): event features
    (event_type, props.k) hashed into FH_BUCKETS signed buckets,
    accumulated per user — fixed-dimensional model input from
    unbounded categorical space with no vocabulary to build, ship, or
    version. md5-derived bucket and sign replay in any engine; the
    accumulator is exact integer cents. One groupBy((user, bucket)) —
    the feature matrix is emitted sparse, the only scalable form.
    """
    events = load_table(spark, sf_dir, "events")
    feat = F.concat_ws(
        "|", F.col("event_type"), F.regexp_extract("props", "[0-9]+", 0)
    )
    h = F.conv(F.substring(F.md5(feat), 1, 8), 16, 10).cast("long")
    sign = F.when(F.substring(F.md5(feat), 9, 1).isin(
        "0", "1", "2", "3", "4", "5", "6", "7"
    ), F.lit(1)).otherwise(F.lit(-1))
    cents = (dec2("value") * 100).cast("bigint")
    return (
        events.select(
            "user_id",
            (h % FH_BUCKETS).cast("int").alias("bucket"),
            (sign * cents).alias("signed_cents"),
        )
        .groupBy("user_id", "bucket")
        .agg(F.sum("signed_cents").alias("feat_cents"))
        .orderBy("user_id", "bucket")
    )


# ---------------------------------------------------------------------------
# embedding quality
# ---------------------------------------------------------------------------


def emb_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier screen: squared distance of every vector to
    its label centroid, z-scored within the label — the cheap first
    pass that catches mislabeled / corrupted vectors before they
    poison contrastive training.

    Centroids are per-(label, dim) DECIMAL(27,6) means (the
    emb_drift_monitor idiom — decimal addition is shuffle-order-proof);
    the distance fold is the sequential zip_with both engines replay
    identically; d² is quantized to DECIMAL(18,8) before the z-score's
    sufficient sums so the variance math is exact. Cost: one
    |vecs|×dims explode with map-side partial agg + one broadcast of
    the label-count centroid table.
    """
    vecs = _vectors(spark, sf_dir)
    cent = (
        vecs.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"],
            ).alias("c")
        )
    )
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("c"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = vecs.join(F.broadcast(cent), "label").select(
        "vec_id", "label", d2.cast("decimal(18,8)").alias("d2q")
    )
    stats = scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d2q").alias("s1"),
        F.sum(
            (F.col("d2q") * F.col("d2q")).cast("decimal(38,16)")
        ).alias("s2"),
    )
    # closed form in PURE doubles with a fixed association order: the
    # exact decimal sums cast to double once (a deterministic cast),
    # then only correctly-rounded IEEE ops — a decimal n·s2−s1² here
    # would overflow precision 38 and round engine-specifically.
    n_d = F.col("n").cast("double")
    s1_d = F.col("s1").cast("double")
    s2_d = F.col("s2").cast("double")
    d2_d = F.col("d2q").cast("double")
    # z = (d2 − s1/n)/std with std = sqrt((n·s2 − s1²)/n²): the n's
    # cancel into z = (n·d2 − s1)/sqrt(n·s2 − s1²) exactly.
    den = n_d * s2_d - s1_d * s1_d
    z = F.when(
        den > 0,
        F.round((n_d * d2_d - s1_d) / F.sqrt(den), 4),
    ).otherwise(F.lit(None).cast("double"))
    return (
        scored.join(F.broadcast(stats), "label")
        .select(
            "vec_id",
            "label",
            F.round(F.col("d2q").cast("double"), 4).alias("dist2"),
            z.alias("z_score"),
            F.coalesce(F.abs(z) >= 2.0, F.lit(False)).alias("is_outlier"),
        )
        .orderBy("vec_id")
    )


def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation eval (Kusupati et al. 2022): recall@K of
    cosine ranking using only the first MAT_DIMS dims against the
    full-width ranking, per probe — the measurement that tells you
    whether the cheap prefix index is safe to serve.

    One capped probe×corpus scan computes BOTH cosines per pair (the
    allowlisted broadcast-probe shape ann_topk_bruteforce uses), two
    rank windows over the same pair frame, one agg. Ties break on
    (rounded cosine, neighbor id) in both engines.
    """
    vecs = _vectors(spark, sf_dir)
    probes = vecs.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("nrm").alias("pn"),
    )
    tn = F.aggregate(
        F.slice(F.col("v"), 1, MAT_DIMS), F.lit(0.0), lambda acc, x: acc + x * x
    )
    tpn = F.aggregate(
        F.slice(F.col("pv"), 1, MAT_DIMS), F.lit(0.0), lambda acc, x: acc + x * x
    )
    pairs = (
        vecs.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cos(F.col("pv"), F.col("v"), F.col("pn"), F.col("nrm")), 6)
            .alias("cos_full"),
            F.round(
                _cos(
                    F.slice(F.col("pv"), 1, MAT_DIMS),
                    F.slice(F.col("v"), 1, MAT_DIMS),
                    tpn,
                    tn,
                ),
                6,
            ).alias("cos_trunc"),
        )
    )
    wf = Window.partitionBy("probe_id").orderBy(
        F.col("cos_full").desc(), F.col("neighbor_id")
    )
    wt = Window.partitionBy("probe_id").orderBy(
        F.col("cos_trunc").desc(), F.col("neighbor_id")
    )
    ranked = pairs.select(
        "probe_id",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wt).alias("rt"),
    )
    return (
        ranked.groupBy("probe_id")
        .agg(
            F.sum(
                F.when((F.col("rf") <= MAT_K) & (F.col("rt") <= MAT_K), 1)
                .otherwise(0)
            ).alias("n_hit")
        )
        .select(
            "probe_id",
            F.col("n_hit").cast("bigint").alias("n_hit"),
            F.round(F.col("n_hit").cast("double") / MAT_K, 4).alias(
                "recall_at_k"
            ),
        )
        .orderBy("probe_id")
    )


# ---------------------------------------------------------------------------
# curriculum ordering
# ---------------------------------------------------------------------------


def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum position per document: easy-to-hard ordering (short
    docs first) within each language, plus the difficulty decile a
    staged training schedule samples from.

    Ordering is (n_chars, doc_id) — fully deterministic. Per-lang
    ranking is a range-partitionable sort (repartitionByRange at real
    scale; languages are few, documents are not): rank and NTILE come
    from the same window, so the whole op is one sort per lang
    partition, no second shuffle.
    """
    docs = load_table_parallel(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.row_number().over(w).alias("curriculum_pos"),
        F.ntile(CURR_DECILES).over(w).alias("difficulty_decile"),
    ).orderBy("lang", "curriculum_pos")


QUERIES = {
    "feature_target_encode": feature_target_encode,
    "feature_woe_binning": feature_woe_binning,
    "feature_hash_encode": feature_hash_encode,
    "emb_outlier_zscore": emb_outlier_zscore,
    "emb_matryoshka_recall": emb_matryoshka_recall,
    "corpus_curriculum_order": corpus_curriculum_order,
}

ORACLES = {
    "feature_target_encode": """
        WITH j AS (
          SELECT o.o_orderkey, c.c_mktsegment,
                 CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        seg AS (
          SELECT c_mktsegment, SUM(cents) AS seg_sum, COUNT(*) AS seg_n
          FROM j GROUP BY 1
        )
        SELECT j.o_orderkey, j.c_mktsegment,
               CASE WHEN s.seg_n > 1
                 THEN ROUND((s.seg_sum - j.cents)::DOUBLE
                            / (s.seg_n - 1)::DOUBLE / 100.0, 4)
                 ELSE NULL END AS loo_target_avg
        FROM j JOIN seg s USING (c_mktsegment)
    """,
    "feature_woe_binning": """
        WITH b AS (
          SELECT CAST(ROUND(l_discount * 100) AS INT) AS disc_pct,
                 SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS n_good,
                 SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_bad
          FROM lineitem GROUP BY 1
        ),
        tot AS (
          SELECT SUM(n_good) AS tot_good, SUM(n_bad) AS tot_bad FROM b
        )
        SELECT disc_pct, n_good::BIGINT AS n_good, n_bad::BIGINT AS n_bad,
               CASE WHEN n_good > 0 AND n_bad > 0
                 THEN ROUND(CAST(
                        CAST(ln(n_good::DOUBLE) AS DECIMAL(18,8))
                        - CAST(ln(tot_good::DOUBLE) AS DECIMAL(18,8))
                        - CAST(ln(n_bad::DOUBLE) AS DECIMAL(18,8))
                        + CAST(ln(tot_bad::DOUBLE) AS DECIMAL(18,8))
                      AS DOUBLE), 6)
                 ELSE NULL END AS woe
        FROM b, tot ORDER BY disc_pct
    """,
    "feature_hash_encode": f"""
        WITH feat AS (
          SELECT user_id,
                 event_type || '|' || regexp_extract(props, '[0-9]+', 0)
                   AS f,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM events
        )
        SELECT user_id,
               CAST(CAST('0x' || substr(md5(f), 1, 8) AS BIGINT)
                    % {FH_BUCKETS} AS INT) AS bucket,
               CAST(SUM(CASE WHEN substr(md5(f), 9, 1) IN
                        ('0','1','2','3','4','5','6','7')
                   THEN cents ELSE -cents END) AS BIGINT) AS feat_cents
        FROM feat
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "emb_outlier_zscore": f"""
        WITH {_VEC_CTE},
        expl AS (
          SELECT label, generate_subscripts(v, 1) AS dim, unnest(v) AS x
          FROM vecs
        ),
        cent AS (
          SELECT label, dim,
                 (SUM(x::DECIMAL(27,6)))::DOUBLE / COUNT(*)::DOUBLE AS m
          FROM expl GROUP BY 1, 2
        ),
        cent_arr AS (
          SELECT label, list(m ORDER BY dim) AS c FROM cent GROUP BY 1
        ),
        scored AS (
          SELECT vecs.vec_id, vecs.label,
                 CAST(list_reduce(
                   list_transform(list_zip(vecs.v, ca.c),
                                  x -> (x[1] - x[2]) * (x[1] - x[2])),
                   (p, q) -> p + q) AS DECIMAL(18,8)) AS d2q
          FROM vecs JOIN cent_arr ca USING (label)
        ),
        stats AS (
          SELECT label, COUNT(*) AS n, SUM(d2q) AS s1,
                 SUM(CAST(d2q * d2q AS DECIMAL(38,16))) AS s2
          FROM scored GROUP BY 1
        ),
        zs AS (
          SELECT s.vec_id, s.label,
                 ROUND(s.d2q::DOUBLE, 4) AS dist2,
                 CASE WHEN t.n::DOUBLE * t.s2::DOUBLE
                           - t.s1::DOUBLE * t.s1::DOUBLE > 0
                   THEN ROUND((t.n::DOUBLE * s.d2q::DOUBLE - t.s1::DOUBLE)
                              / SQRT(t.n::DOUBLE * t.s2::DOUBLE
                                     - t.s1::DOUBLE * t.s1::DOUBLE), 4)
                   ELSE NULL END AS z_score
          FROM scored s JOIN stats t USING (label)
        )
        SELECT vec_id, label, dist2, z_score,
               COALESCE(ABS(z_score) >= 2.0, FALSE) AS is_outlier
        FROM zs ORDER BY vec_id
    """,
    "emb_matryoshka_recall": f"""
        WITH {_VEC_CTE},
        tr AS (
          SELECT vec_id, v, nrm, v[1:{MAT_DIMS}] AS tv,
                 list_reduce(list_transform(v[1:{MAT_DIMS}], x -> x * x),
                             (a, b) -> a + b) AS tnrm
          FROM vecs
        ),
        pairs AS (
          SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                 ROUND(list_reduce(list_transform(list_zip(p.v, c.v),
                         x -> x[1] * x[2]), (a, b) -> a + b)
                       / (sqrt(p.nrm) * sqrt(c.nrm)), 6) AS cos_full,
                 ROUND(list_reduce(list_transform(list_zip(p.tv, c.tv),
                         x -> x[1] * x[2]), (a, b) -> a + b)
                       / (sqrt(p.tnrm) * sqrt(c.tnrm)), 6) AS cos_trunc
          FROM tr p JOIN tr c ON c.vec_id != p.vec_id
          WHERE p.vec_id < {N_PROBES}
        ),
        ranked AS (
          SELECT probe_id,
                 ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY cos_full DESC, neighbor_id) AS rf,
                 ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY cos_trunc DESC, neighbor_id) AS rt
          FROM pairs
        )
        SELECT probe_id,
               SUM(CASE WHEN rf <= {MAT_K} AND rt <= {MAT_K} THEN 1
                   ELSE 0 END)::BIGINT AS n_hit,
               ROUND(SUM(CASE WHEN rf <= {MAT_K} AND rt <= {MAT_K} THEN 1
                     ELSE 0 END)::DOUBLE / {MAT_K}, 4) AS recall_at_k
        FROM ranked GROUP BY 1 ORDER BY 1
    """,
    "corpus_curriculum_order": f"""
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY n_chars, doc_id) AS curriculum_pos,
               NTILE({CURR_DECILES}) OVER (PARTITION BY lang
                 ORDER BY n_chars, doc_id) AS difficulty_decile
        FROM documents
        ORDER BY lang, curriculum_pos
    """,
}


# --- r06 batch 2: robust scaling --------------------------------------------


def feature_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/IQR robust scaling of order value within each market
    segment — the outlier-proof standardization (sklearn's
    RobustScaler) for long-tailed money features.

    The quartiles are selected POSITIONALLY from the exact integer
    cents order (positions ⌈n/4⌉, ⌈n/2⌉, ⌈3n/4⌉ — PERCENTILE_DISC
    semantics), so both engines pick identical pivot VALUES instead of
    interpolating doubles; the scaled feature is one exact-integer
    difference over one exact-integer IQR, ROUND 4, with a
    degenerate-IQR guard.

    r10 optimization (guide §2.3): a positional pick from a sorted
    multiset depends only on the (segment, cents) value counts, never
    on the per-row orderkey tiebreak — so the rows collapse map-side
    to (segment, cents, count) and the rank window runs over
    O(distinct values) rows per segment instead of every order. The
    former row_number window partitioned by c_mktsegment (5 values —
    a 5-task parallelism ceiling and the 100 TB skew hazard) is gone;
    a value at position p is the row whose cumulative-count interval
    [hi-c+1, hi] covers p. The quartile table stays dimension-sized
    and is broadcast back.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (dec2("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    per_val = j.groupBy("c_mktsegment", "cents").agg(
        F.count(F.lit(1)).alias("c")
    )
    ws = Window.partitionBy("c_mktsegment").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_val.select(
        "c_mktsegment",
        "cents",
        "c",
        F.sum("c").over(ws).alias("hi"),
        F.sum("c").over(Window.partitionBy("c_mktsegment")).alias("n"),
    ).withColumn("lo", F.col("hi") - F.col("c") + 1)

    def _pick(p: Column) -> Column:
        return F.min(
            F.when((F.col("lo") <= p) & (p <= F.col("hi")), F.col("cents"))
        )

    picks = cum.groupBy("c_mktsegment").agg(
        _pick(F.ceil(F.col("n") / 2)).alias("med"),
        _pick(F.ceil(F.col("n") / 4)).alias("q1"),
        _pick(F.ceil(F.col("n") * 3 / 4)).alias("q3"),
    )
    # + 0.0 normalizes IEEE -0.0 to +0.0 (x + 0.0 is the identity for
    # every other value) — engines disagree on -0.0 serialization
    scaled = F.when(
        F.col("q3") > F.col("q1"),
        F.round(
            (F.col("cents") - F.col("med")).cast("double")
            / (F.col("q3") - F.col("q1")).cast("double"),
            4,
        )
        + 0.0,
    ).otherwise(F.lit(None).cast("double"))
    return (
        j.join(F.broadcast(picks), "c_mktsegment")
        .select("o_orderkey", "c_mktsegment", scaled.alias("robust_scaled"))
        .orderBy("o_orderkey")
    )


QUERIES["feature_robust_scale"] = feature_robust_scale

ORACLES["feature_robust_scale"] = """
    WITH j AS (
      SELECT o.o_orderkey, c.c_mktsegment,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
               ORDER BY cents, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM j
    ),
    picks AS (
      SELECT c_mktsegment,
             MIN(CASE WHEN rn = CEIL(n / 2.0) THEN cents END) AS med,
             MIN(CASE WHEN rn = CEIL(n / 4.0) THEN cents END) AS q1,
             MIN(CASE WHEN rn = CEIL(n * 3 / 4.0) THEN cents END) AS q3
      FROM ranked
      WHERE rn = CEIL(n / 4.0) OR rn = CEIL(n / 2.0) OR rn = CEIL(n * 3 / 4.0)
      GROUP BY 1
    )
    SELECT r.o_orderkey, r.c_mktsegment,
           CASE WHEN p.q3 > p.q1
             THEN ROUND((r.cents - p.med)::DOUBLE / (p.q3 - p.q1)::DOUBLE, 4)
                  + 0.0
             ELSE NULL END AS robust_scaled
    FROM ranked r JOIN picks p USING (c_mktsegment)
    ORDER BY r.o_orderkey
"""


# --- r06 batch 3: label separation, k-center coreset, one-hot dict ----------

KC_CENTERS = 5  # greedy k-center rounds (Gonzalez 1985) after the seed
OH_TOP_K = 10  # one-hot dictionary width before the __other__ bucket


def _label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid arrays (the emb_outlier_zscore idiom):
    decimal-exact per-dim means, assembled in dim order."""
    vecs = _vectors(spark, sf_dir)
    return (
        vecs.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"],
            ).alias("c")
        )
    )


def _d2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def emb_label_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality audit per label: mean intra-label distance² to
    the own centroid vs the distance² to the NEAREST other centroid —
    the silhouette-style ratio that tells you which classes an
    embedding model actually separates before anyone trains on it.

    Intra distances are quantized to DECIMAL(18,8) and averaged
    exactly; the inter table is the K×K centroid self-join (labels are
    few — a broadcast of dimension size); nearest-other picks on
    (rounded d², label id) so both engines elect the same neighbor.
    """
    vecs = _vectors(spark, sf_dir)
    cent = F.broadcast(_label_centroids(spark, sf_dir))
    intra = (
        vecs.join(cent, "label")
        .select(
            "label", _d2(F.col("v"), F.col("c")).cast("decimal(18,8)").alias("d2q")
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (F.sum("d2q") / F.count(F.lit(1))).cast("double").alias("mean_intra_d2"),
        )
    )
    ca = cent.select(F.col("label").alias("la"), F.col("c").alias("cla"))
    cb = cent.select(F.col("label").alias("lb"), F.col("c").alias("clb"))
    inter = (
        ca.join(cb, F.col("la") != F.col("lb"))
        .select(
            "la",
            "lb",
            F.round(_d2(F.col("cla"), F.col("clb")), 6).alias("d2"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("la").orderBy("d2", "lb")
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("la").alias("label"),
            F.col("lb").alias("nearest_label"),
            F.col("d2").alias("nearest_centroid_d2"),
        )
    )
    return (
        intra.join(inter, "label")
        .select(
            "label",
            F.col("n_vecs").cast("bigint").alias("n_vecs"),
            F.round("mean_intra_d2", 4).alias("mean_intra_d2"),
            "nearest_label",
            F.round("nearest_centroid_d2", 4).alias("nearest_centroid_d2"),
            # singleton/degenerate label: the only vector IS the
            # centroid (mean_intra_d2 = 0) and the ratio is undefined
            # (x/0 raises under Spark 4 ANSI; inf in DuckDB)
            F.when(
                F.col("mean_intra_d2") > 0,
                F.round(
                    F.col("nearest_centroid_d2") / F.col("mean_intra_d2"), 4
                ),
            ).alias("separation_ratio"),
        )
        .orderBy("label")
    )


def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985): seed at the
    md5-min vector, then KC_CENTERS−1 rounds of "add the point
    farthest from every chosen center" — the classical 2-approximation
    whose selected set is the diversity coreset active-learning and
    data-pruning pipelines draw. Each round is ONE broadcast distance
    pass + one takeOrdered argmax (distances rounded to 6 dp with a
    vec_id tiebreak, so the replayed oracle elects identical centers);
    the running min-distance column updates functionally — no state
    beyond the O(k) chosen list.

    Output: (rank, vec_id, radius) where radius is the max-min
    distance the round resolved — the coverage guarantee curve.
    """
    vecs = _vectors(spark, sf_dir).select("vec_id", "v")
    seed = (
        vecs.select(
            "vec_id", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h", "vec_id")
        .limit(1)
        .collect()[0]
        .vec_id
    )
    chosen = [(1, seed, None)]
    cur = vecs.join(
        F.broadcast(vecs.filter(F.col("vec_id") == seed).select(
            F.col("v").alias("cv")
        )),
    ).select(
        "vec_id", "v", F.round(_d2(F.col("v"), F.col("cv")), 6).alias("mind2")
    )
    for rank in range(2, KC_CENTERS + 1):
        cur = cur.localCheckpoint(eager=True)  # O(rounds) lineage cap
        far = (
            cur.orderBy(F.col("mind2").desc(), F.col("vec_id"))
            .limit(1)
            .collect()[0]
        )
        chosen.append((rank, far.vec_id, float(far.mind2)))
        cv = F.broadcast(
            vecs.filter(F.col("vec_id") == far.vec_id).select(
                F.col("v").alias("cv")
            )
        )
        cur = cur.join(cv).select(
            "vec_id",
            "v",
            F.least(
                F.col("mind2"), F.round(_d2(F.col("v"), F.col("cv")), 6)
            ).alias("mind2"),
        )
    return spark.createDataFrame(
        [(r, v, d) for r, v, d in chosen],
        "rank int, vec_id bigint, radius_d2 double",
    ).orderBy("rank")


def feature_onehot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot dictionary builder for a categorical column (part
    brand): the OH_TOP_K most frequent categories get indexes 1..K
    (by count desc, then name — fully deterministic), everything else
    collapses to index 0 (__other__) — the fixed-width encoding
    contract a training job ships with the model. One groupBy + one
    dimension-sized window.
    """
    part = load_table(spark, sf_dir, "part")
    counts = part.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_parts"))
    w = Window.orderBy(F.col("n_parts").desc(), F.col("p_brand"))
    ranked = counts.withColumn("rk", F.row_number().over(w))
    return ranked.select(
        F.col("p_brand").alias("category"),
        F.col("n_parts").cast("bigint").alias("n_rows"),
        F.when(F.col("rk") <= OH_TOP_K, F.col("rk"))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("onehot_index"),
    ).orderBy(F.col("onehot_index") == 0, "onehot_index", "category")


QUERIES["emb_label_separation"] = emb_label_separation
QUERIES["sample_coreset_kcenter"] = sample_coreset_kcenter
QUERIES["feature_onehot_topk"] = feature_onehot_topk

_CENT_CTES = """
    expl AS (
      SELECT label, generate_subscripts(v, 1) AS dim, unnest(v) AS x
      FROM vecs
    ),
    cent AS (
      SELECT label, dim,
             (SUM(x::DECIMAL(27,6)))::DOUBLE / COUNT(*)::DOUBLE AS m
      FROM expl GROUP BY 1, 2
    ),
    cent_arr AS (
      SELECT label, list(m ORDER BY dim) AS c FROM cent GROUP BY 1
    )
"""

_D2_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "x -> (x[1] - x[2]) * (x[1] - x[2])), (p, q) -> p + q)"
)

ORACLES["emb_label_separation"] = f"""
    WITH {_VEC_CTE},
    {_CENT_CTES},
    intra AS (
      SELECT vecs.label, COUNT(*) AS n_vecs,
             (SUM(CAST({_D2_SQL.format(a="vecs.v", b="ca.c")} AS DECIMAL(18,8)))
              / COUNT(*))::DOUBLE AS mean_intra_d2
      FROM vecs JOIN cent_arr ca USING (label)
      GROUP BY 1
    ),
    inter AS (
      SELECT a.label AS la, b.label AS lb,
             ROUND({_D2_SQL.format(a="a.c", b="b.c")}, 6) AS d2,
             ROW_NUMBER() OVER (PARTITION BY a.label
               ORDER BY ROUND({_D2_SQL.format(a="a.c", b="b.c")}, 6), b.label)
               AS rn
      FROM cent_arr a JOIN cent_arr b ON a.label != b.label
    )
    SELECT i.label, i.n_vecs::BIGINT AS n_vecs,
           ROUND(i.mean_intra_d2, 4) AS mean_intra_d2,
           n.lb AS nearest_label,
           ROUND(n.d2, 4) AS nearest_centroid_d2,
           (CASE WHEN i.mean_intra_d2 > 0 THEN
             ROUND(n.d2 / i.mean_intra_d2, 4) END) AS separation_ratio
    FROM intra i JOIN (SELECT * FROM inter WHERE rn = 1) n ON n.la = i.label
    ORDER BY i.label
"""

_KC_ROUND = """
    c{r} AS MATERIALIZED (
      SELECT vec_id, v, mind2 FROM m{p}
      ORDER BY mind2 DESC, vec_id LIMIT 1
    ),
    m{r} AS MATERIALIZED (
      SELECT m.vec_id, m.v,
             least(m.mind2,
                   ROUND({d2}, 6)) AS mind2
      FROM m{p} m, c{r} c
    )"""

ORACLES["sample_coreset_kcenter"] = (
    f"""
    WITH {_VEC_CTE},
    seed AS MATERIALIZED (
      SELECT vec_id, v FROM vecs
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1
    ),
    m1 AS MATERIALIZED (
      SELECT vecs.vec_id, vecs.v,
             ROUND({_D2_SQL.format(a="vecs.v", b="seed.v")}, 6) AS mind2
      FROM vecs, seed
    ),"""
    + ",".join(
        _KC_ROUND.format(
            r=r, p=r - 1, d2=_D2_SQL.format(a="m.v", b="c.v")
        )
        for r in range(2, KC_CENTERS + 1)
    )
    + f"""
    SELECT 1 AS rank, seed.vec_id, NULL::DOUBLE AS radius_d2 FROM seed
    UNION ALL
    {" UNION ALL ".join(
        f"SELECT {r} AS rank, c{r}.vec_id, c{r}.mind2 AS radius_d2 FROM c{r}"
        for r in range(2, KC_CENTERS + 1)
    )}
    ORDER BY rank
"""
)

ORACLES["feature_onehot_topk"] = f"""
    WITH counts AS (
      SELECT p_brand, COUNT(*) AS n_parts FROM part GROUP BY 1
    ),
    ranked AS (
      SELECT p_brand, n_parts,
             ROW_NUMBER() OVER (ORDER BY n_parts DESC, p_brand) AS rk
      FROM counts
    )
    SELECT p_brand AS category,
           n_parts::BIGINT AS n_rows,
           CAST(CASE WHEN rk <= {OH_TOP_K} THEN rk ELSE 0 END AS INT)
             AS onehot_index
    FROM ranked
    ORDER BY (CASE WHEN rk <= {OH_TOP_K} THEN rk ELSE 0 END) = 0,
             CASE WHEN rk <= {OH_TOP_K} THEN rk ELSE 0 END, category
"""


# --- r06 batch 5: vector-norm health -----------------------------------------


def emb_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-norm health screen: per-label norm² mean/min/max and the
    count of vectors whose norm² sits further than NORM_TOL× from the
    label mean — the collapse/explosion detector run before any cosine
    math is trusted (a near-zero-norm vector makes every cosine
    unstable). norm² is quantized to micro-units (the emb_dim_stats
    idiom) so the sums are exact integers; one map-side groupBy.
    """
    vecs = _vectors(spark, sf_dir)
    micro = F.floor(F.col("nrm") * 1e6 + 0.5).cast("bigint")
    per_label = (
        vecs.select("label", micro.alias("nm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("nm").alias("s"),
            F.min("nm").alias("mn"),
            F.max("nm").alias("mx"),
        )
    )
    flagged = (
        vecs.select("label", micro.alias("nm"))
        .join(F.broadcast(per_label), "label")
        .select(
            "label",
            (
                (F.col("nm") * F.col("n") * 10 > F.col("s") * 13)
                | (F.col("nm") * F.col("n") * 10 < F.col("s") * 7)
            ).cast("int").alias("is_out"),
        )
        .groupBy("label")
        .agg(F.sum("is_out").alias("n_norm_outliers"))
    )
    return (
        per_label.join(flagged, "label")
        .select(
            "label",
            F.col("n").cast("bigint").alias("n_vecs"),
            F.round(F.col("s").cast("double") / (F.col("n") * 1e6), 6).alias(
                "mean_norm2"
            ),
            F.round(F.col("mn").cast("double") / 1e6, 6).alias("min_norm2"),
            F.round(F.col("mx").cast("double") / 1e6, 6).alias("max_norm2"),
            F.col("n_norm_outliers").cast("bigint").alias("n_norm_outliers"),
        )
        .orderBy("label")
    )


QUERIES["emb_norm_outliers"] = emb_norm_outliers

ORACLES["emb_norm_outliers"] = f"""
    WITH {_VEC_CTE},
    q AS (
      SELECT label,
             CAST(FLOOR(nrm * 1e6 + 0.5) AS BIGINT) AS nm
      FROM vecs
    ),
    per_label AS (
      SELECT label, COUNT(*) AS n, SUM(nm) AS s,
             MIN(nm) AS mn, MAX(nm) AS mx
      FROM q GROUP BY 1
    ),
    flagged AS (
      SELECT q.label,
             SUM(CASE WHEN q.nm * p.n * 10 > p.s * 13
                       OR q.nm * p.n * 10 < p.s * 7
                 THEN 1 ELSE 0 END) AS n_norm_outliers
      FROM q JOIN per_label p USING (label)
      GROUP BY 1
    )
    SELECT p.label, p.n::BIGINT AS n_vecs,
           ROUND(p.s::DOUBLE / (p.n * 1e6), 6) AS mean_norm2,
           ROUND(p.mn::DOUBLE / 1e6, 6) AS min_norm2,
           ROUND(p.mx::DOUBLE / 1e6, 6) AS max_norm2,
           f.n_norm_outliers::BIGINT AS n_norm_outliers
    FROM per_label p JOIN flagged f USING (label)
    ORDER BY p.label
"""
