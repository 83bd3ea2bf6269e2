"""Corpus-curation operators: the selection / split / rebalancing steps
that sit between cleaning and training in an LLM data pipeline.

- ``text_perplexity_buckets``: CCNet-style head/middle/tail terciles by
  LM surprisal, per language (Wenzek et al. 2020 §4.3 — their KenLM
  perplexity split, re-expressed over the corpus unigram LM that
  ``text_unigram_logprob`` already computes).
- ``sample_balanced_classes``: class-balanced downsample of the
  embeddings table — every label keeps exactly ``min(class sizes)``
  rows, chosen by deterministic hash order.
- ``sample_train_test_split``: coordination-free train/valid/test
  assignment by md5 hash threshold (75/12.5/12.5), audited per source.

All three follow the repo's determinism rules: hash order instead of
rand(), decimal-quantized sums before any mean, 4dp rounding at the
output boundary, and doc_id/vec_id tiebreaks on every rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_city_directories_spark.operators.textstats import (
    text_unigram_logprob,
)
from etl_city_directories_spark.operators.textstats import (
    ORACLES as _TEXT_ORACLES,
)
from etl_city_directories_spark.sources.tables import load_table_parallel

N_PPL_BUCKETS = 3
_BUCKET_NAMES = {1: "head", 2: "middle", 3: "tail"}


def text_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language surprisal terciles: head = most fluent third,
    tail = highest-surprisal third — the CCNet quality split that
    decides which web text is worth training on.

    Scale shape: the per-doc surprisal table (one row per document,
    three narrow columns) NTILEs inside a hash-partition-by-lang sort —
    the sorted data is the scores table, never the corpus text. At
    100 TB the exact-tercile sort is still only O(docs) narrow rows;
    the approximate alternative (approx cutpoints + map-side bucket
    assign) trades that sort for a two-pass scan but loses the exact
    bucket sizes this audit reports. Output is O(languages × 3).
    """
    scores = text_unigram_logprob(spark, sf_dir)
    docs = load_table_parallel(spark, sf_dir, "documents").select(
        "doc_id", "lang"
    )
    w = Window.partitionBy("lang").orderBy(
        F.asc("mean_surprisal"), F.asc("doc_id")
    )
    bucketed = (
        scores.join(docs, "doc_id")
        .withColumn("b", F.ntile(N_PPL_BUCKETS).over(w))
    )
    bucket_name = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _BUCKET_NAMES.items() for x in kv]
        ),
        F.col("b"),
    )
    return (
        bucketed.groupBy("lang", "b")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(
                    F.col("mean_surprisal").cast("decimal(18,4)")
                ).cast("double")
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("avg_surprisal"),
        )
        .select(
            "lang",
            bucket_name.alias("bucket"),
            "n_docs",
            "avg_surprisal",
        )
        .orderBy("lang", "bucket")
    )


def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsample: keep exactly min(class sizes) rows
    per label, selected by md5 hash order (the deterministic stand-in
    for a uniform draw), vec_id tiebreak.

    Scale shape: one groupBy to per-label counts (O(labels) rows), the
    global min arrives via an empty-frame window over that tiny table
    and broadcasts back; the keep decision is a row_number inside a
    hash-partition-by-label sort of (hash, id) pairs — the same
    window-rank shape as ``sample_stratified``, one shuffle of narrow
    rows, no collect.
    """
    vecs = load_table_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", "label"
    )
    counts = vecs.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    min_n = counts.select(
        "label", F.min("n").over(Window.partitionBy()).alias("min_n")
    )
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.asc("vec_id")
    )
    return (
        vecs.withColumn("sample_rank", F.row_number().over(w))
        .join(F.broadcast(min_n), "label")
        .filter(F.col("sample_rank") <= F.col("min_n"))
        .select(
            "vec_id", "label", F.col("sample_rank").cast("bigint").alias(
                "sample_rank"
            )
        )
    )


# md5-hex space thresholds: [0, c) = train (12/16), [c, e) = valid
# (2/16), [e, f...] = test (2/16). Hash-threshold assignment is
# rerun-stable, pure map-side, and — unlike rand() — keeps every
# engine and every rerun in byte agreement.
_SPLIT_TRAIN_HI = "c" + "0" * 31
_SPLIT_VALID_HI = "e" + "0" * 31


def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 75/12.5/12.5 train/valid/test split audit: each
    document's split is a pure function of md5(doc_id), so the split
    is reproducible shard-by-shard with zero coordination; the output
    is the per-(source, split) count/char audit a dataset card needs.

    Scale shape: map-side hash + classify, one partial-aggregated
    shuffle to O(sources × 3) rows. The per-doc assignment never
    materializes wide rows.
    """
    docs = load_table_parallel(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string"))
    split = (
        F.when(key < _SPLIT_TRAIN_HI, "train")
        .when(key < _SPLIT_VALID_HI, "valid")
        .otherwise("test")
    )
    return (
        docs.select("source", split.alias("split"), "n_chars")
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source", "split")
    )


QUERIES = {
    "text_perplexity_buckets": text_perplexity_buckets,
    "sample_balanced_classes": sample_balanced_classes,
    "sample_train_test_split": sample_train_test_split,
}

# The per-doc surprisal CTE is the text_unigram_logprob oracle verbatim
# (single source of truth for the unigram LM definition).
_SURPRISAL_SQL = _TEXT_ORACLES["text_unigram_logprob"]

_BUCKET_CASE = (
    "CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END"
)

ORACLES = {
    "text_perplexity_buckets": f"""
        WITH scores AS ({_SURPRISAL_SQL}),
        bucketed AS (
          SELECT d.lang, s.mean_surprisal,
                 NTILE({N_PPL_BUCKETS}) OVER (
                   PARTITION BY d.lang
                   ORDER BY s.mean_surprisal ASC, s.doc_id ASC
                 ) AS b
          FROM scores s JOIN documents d USING (doc_id)
        )
        SELECT lang,
               {_BUCKET_CASE} AS bucket,
               COUNT(*) AS n_docs,
               ROUND((SUM(mean_surprisal::DECIMAL(18,4)))::DOUBLE
                     / COUNT(*), 4) AS avg_surprisal
        FROM bucketed
        GROUP BY lang, b
        ORDER BY lang, bucket
    """,
    "sample_balanced_classes": """
        WITH counts AS (
          SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
        ),
        lim AS (
          SELECT label, MIN(n) OVER () AS min_n FROM counts
        ),
        ranked AS (
          SELECT vec_id, label,
                 ROW_NUMBER() OVER (
                   PARTITION BY label
                   ORDER BY md5(vec_id::VARCHAR), vec_id ASC
                 ) AS sample_rank
          FROM embeddings
        )
        SELECT vec_id, ranked.label, sample_rank
        FROM ranked JOIN lim USING (label)
        WHERE sample_rank <= min_n
    """,
    "sample_train_test_split": f"""
        SELECT source,
               CASE
                 WHEN md5(doc_id::VARCHAR) < '{_SPLIT_TRAIN_HI}' THEN 'train'
                 WHEN md5(doc_id::VARCHAR) < '{_SPLIT_VALID_HI}' THEN 'valid'
                 ELSE 'test'
               END AS split,
               COUNT(*) AS n_docs,
               SUM(n_chars)::BIGINT AS total_chars
        FROM documents
        GROUP BY source, split
        ORDER BY source, split
    """,
}


# Total sample budget for the Neyman allocation readout.
NEYMAN_BUDGET = 1000


def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation over (lang, source).

    The variance-minimizing way to spend a labeling/eval budget
    (Neyman 1934): stratum h gets n_h ∝ N_h·σ_h — big AND
    internally-diverse strata get the samples; a huge but homogeneous
    stratum gets few. Strata stats reduce map-side to exact integer
    (N, Σchars, Σchars²); σ_h is one deterministic sqrt over
    exact-int-derived doubles; the allocation share and rounded n_h
    are single double ops mirrored verbatim in the oracle. O(strata)
    everything after the one corpus pass — the planner every serious
    eval-set builder runs before sampling 100 TB.
    """
    docs = load_table_parallel(spark, sf_dir, "documents")
    suff = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("decimal(38,0)")).alias("s"),
        F.sum(
            (F.col("n_chars").cast("decimal(18,0)") * F.col("n_chars").cast("decimal(18,0)")).cast("decimal(38,0)")
        ).alias("ss"),
    )
    # singleton strata have no within-stratum variance: weight 0
    sd = F.when(
        F.col("n_docs") > 1,
        F.sqrt(
            (
                F.col("ss").cast("double")
                - F.col("s").cast("double") * F.col("s").cast("double")
                / F.col("n_docs").cast("double")
            )
            / (F.col("n_docs").cast("double") - 1)
        ),
    ).otherwise(F.lit(0.0))
    weighted = suff.select(
        "lang",
        "source",
        "n_docs",
        sd.alias("sd_chars"),
        (F.col("n_docs").cast("double") * sd).alias("w"),
    )
    wv = Window.partitionBy()
    return (
        weighted.select(
            "lang",
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.round("sd_chars", 4).alias("sd_chars"),
            # all-singleton corpus: total weight 0 -> allocation
            # undefined (x/0 raises under Spark 4 ANSI; NaN in DuckDB)
            F.when(
                F.sum("w").over(wv) > 0,
                F.round(F.col("w") / F.sum("w").over(wv), 6),
            ).alias("alloc_share"),
            F.when(
                F.sum("w").over(wv) > 0,
                F.floor(
                    F.lit(NEYMAN_BUDGET) * F.col("w") / F.sum("w").over(wv)
                ).cast("bigint"),
            ).alias("n_alloc"),
        )
        .orderBy("lang", "source")
    )


QUERIES["sample_neyman_allocation"] = sample_neyman_allocation

ORACLES["sample_neyman_allocation"] = f"""
    WITH suff AS (
      SELECT lang, source, COUNT(*) AS n_docs,
             SUM(n_chars::HUGEINT) AS s,
             SUM(n_chars::HUGEINT * n_chars::HUGEINT) AS ss
      FROM documents GROUP BY 1, 2
    ),
    weighted AS (
      SELECT lang, source, n_docs,
             CASE WHEN n_docs > 1 THEN
               sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n_docs::DOUBLE)
                    / (n_docs::DOUBLE - 1))
             ELSE 0.0 END AS sd_chars,
             n_docs::DOUBLE
               * CASE WHEN n_docs > 1 THEN
                   sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n_docs::DOUBLE)
                        / (n_docs::DOUBLE - 1))
                 ELSE 0.0 END AS w
      FROM suff
    )
    SELECT lang, source, n_docs::BIGINT AS n_docs,
           ROUND(sd_chars, 4) AS sd_chars,
           (CASE WHEN SUM(w) OVER () > 0 THEN
             ROUND(w / SUM(w) OVER (), 6) END) AS alloc_share,
           (CASE WHEN SUM(w) OVER () > 0 THEN
             CAST(FLOOR({NEYMAN_BUDGET} * w / SUM(w) OVER ()) AS BIGINT)
            END) AS n_alloc
    FROM weighted ORDER BY lang, source
"""


GROUP_KFOLD_K = 5


def sample_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware K-fold assignment audit (grouped cross-validation).

    Naive row-level folds leak: a user's events end up in both train
    and validation. Group K-fold assigns the GROUP (user) a fold —
    fold = md5(user_id) mod K, coordination-free and rerun-stable —
    so every event of a user shares a fold by construction. Output is
    the per-fold audit (users, events, event share) a CV harness
    checks for balance before training. Map-side hash + one partial-
    aggregated shuffle to K rows.
    """
    from etl_city_directories_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    fold = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % GROUP_KFOLD_K
    )
    per_fold = (
        events.select(fold.alias("fold"), "user_id")
        .groupBy("fold")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    wt = Window.partitionBy()
    return per_fold.select(
        F.col("fold").cast("bigint").alias("fold"),
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(
            F.col("n_events").cast("double")
            / F.sum("n_events").over(wt).cast("double"),
            6,
        ).alias("event_share"),
    ).orderBy("fold")


QUERIES["sample_group_kfold"] = sample_group_kfold

ORACLES["sample_group_kfold"] = f"""
    WITH folded AS (
      SELECT CAST('0x' || substr(md5(user_id::VARCHAR), 1, 4) AS BIGINT)
               % {GROUP_KFOLD_K} AS fold,
             user_id
      FROM events
    ),
    per_fold AS (
      SELECT fold, COUNT(DISTINCT user_id) AS n_users,
             COUNT(*) AS n_events
      FROM folded GROUP BY 1
    )
    SELECT fold::BIGINT AS fold, n_users::BIGINT AS n_users,
           n_events::BIGINT AS n_events,
           ROUND(n_events::DOUBLE / SUM(n_events) OVER ()::DOUBLE, 6)
             AS event_share
    FROM per_fold ORDER BY fold
"""


def decontaminate_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate leakage audit across the train/valid/test split.

    The eval-integrity check every dataset card should print: a
    near-dup pair with one member in train and the other in test IS
    contamination even after exact decontamination passes. Joins the
    verified LSH near-dup pairs (shared minhash pipeline — the pair
    set is memoized with the dedup family) against the deterministic
    hash-threshold split and rolls up pair counts per (split_a,
    split_b) cell with the cross-split leak share. O(pairs) work on
    top of the shared candidates.
    """
    from etl_city_directories_spark.operators.dedup import dedup_minhash_lsh

    key = F.md5(F.col("doc_id").cast("string"))
    split = (
        F.when(key < _SPLIT_TRAIN_HI, "train")
        .when(key < _SPLIT_VALID_HI, "valid")
        .otherwise("test")
    )
    docs = load_table_parallel(spark, sf_dir, "documents").select(
        "doc_id", split.alias("split")
    )
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    sa = docs.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = docs.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    labeled = pairs.join(sa, "doc_a").join(sb, "doc_b").select(
        F.least("split_a", "split_b").alias("split_lo"),
        F.greatest("split_a", "split_b").alias("split_hi"),
    )
    wt = Window.partitionBy()
    return (
        labeled.groupBy("split_lo", "split_hi")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "split_lo",
            "split_hi",
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            (F.col("split_lo") != F.col("split_hi")).alias("is_leak"),
            F.round(
                F.col("n_pairs").cast("double")
                / F.sum("n_pairs").over(wt).cast("double"),
                6,
            ).alias("pair_share"),
        )
        .orderBy("split_lo", "split_hi")
    )


QUERIES["decontaminate_split_leakage"] = decontaminate_split_leakage


# the pairs CTE chain is the dedup module's minhash oracle up through
# `pairs`; _CC_CTES already packages exactly that prefix
from etl_city_directories_spark.operators.dedup import _CC_CTES as _DEDUP_CC_CTES

ORACLES["decontaminate_split_leakage"] = f"""{_DEDUP_CC_CTES},
    labeled AS (
      SELECT least(
               CASE WHEN md5(a.doc_id::VARCHAR) < '{_SPLIT_TRAIN_HI}' THEN 'train'
                    WHEN md5(a.doc_id::VARCHAR) < '{_SPLIT_VALID_HI}' THEN 'valid'
                    ELSE 'test' END,
               CASE WHEN md5(b.doc_id::VARCHAR) < '{_SPLIT_TRAIN_HI}' THEN 'train'
                    WHEN md5(b.doc_id::VARCHAR) < '{_SPLIT_VALID_HI}' THEN 'valid'
                    ELSE 'test' END) AS split_lo,
             greatest(
               CASE WHEN md5(a.doc_id::VARCHAR) < '{_SPLIT_TRAIN_HI}' THEN 'train'
                    WHEN md5(a.doc_id::VARCHAR) < '{_SPLIT_VALID_HI}' THEN 'valid'
                    ELSE 'test' END,
               CASE WHEN md5(b.doc_id::VARCHAR) < '{_SPLIT_TRAIN_HI}' THEN 'train'
                    WHEN md5(b.doc_id::VARCHAR) < '{_SPLIT_VALID_HI}' THEN 'valid'
                    ELSE 'test' END) AS split_hi
      FROM pairs p
      JOIN documents a ON a.doc_id = p.doc_a
      JOIN documents b ON b.doc_id = p.doc_b
    )
    SELECT split_lo, split_hi, COUNT(*)::BIGINT AS n_pairs,
           split_lo <> split_hi AS is_leak,
           ROUND(COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER ()::DOUBLE, 6)
             AS pair_share
    FROM labeled GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- Forward-chaining time-series cross-validation -----------------
TSCV_FOLDS = 4  # expanding-window folds over the event span


def sample_kfold_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-chaining (expanding-window) time-series CV folds: fold
    i trains on the first (i+1)·step days and tests on the next step —
    the split discipline for any model evaluated on temporal data
    (sample_group_kfold leaks future into past for a time series; this
    is its order-respecting sibling).

    The span divides into TSCV_FOLDS+1 equal steps from a 1-row
    bounds aggregate (no literals); each fold's train/test row counts
    come from ONE conditional-sum pass over the per-day counts grid
    crossed with the 4-row fold spec. Integer day arithmetic end to
    end — fold boundaries are exact in both engines.
    """
    from etl_city_directories_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    bounds = daily.groupBy().agg(
        F.min("d").alias("lo"), (F.datediff(F.max("d"), F.min("d")) + 1).alias("span")
    )
    folds = bounds.select(
        "lo",
        "span",
        F.explode(
            F.sequence(F.lit(1), F.lit(TSCV_FOLDS))
        ).alias("fold"),
    ).select(
        "lo",
        "fold",
        # integer step via explicit FLOOR in BOTH engines (a bare
        # CAST truncates in Spark but rounds-to-nearest in DuckDB —
        # span % 5 in {3,4} would shift every fold boundary); the
        # remainder tail days fall into no test fold
        F.floor(F.col("span") / (TSCV_FOLDS + 1)).cast("long").alias("step"),
    )
    tagged = daily.crossJoin(F.broadcast(folds)).select(
        "fold",
        "step",
        "n",
        F.datediff("d", "lo").alias("off"),
    )
    return (
        tagged.groupBy("fold")
        .agg(
            F.min(F.col("step") * F.col("fold")).alias("train_days"),
            F.sum(
                F.when(F.col("off") < F.col("step") * F.col("fold"), F.col("n"))
                .otherwise(0)
            ).cast("long").alias("n_train_events"),
            F.sum(
                F.when(
                    (F.col("off") >= F.col("step") * F.col("fold"))
                    & (F.col("off") < F.col("step") * (F.col("fold") + 1)),
                    F.col("n"),
                ).otherwise(0)
            ).cast("long").alias("n_test_events"),
        )
        .select(
            F.col("fold").cast("long").alias("fold"),
            F.col("train_days").cast("long").alias("train_days"),
            "n_train_events",
            "n_test_events",
        )
    )


QUERIES["sample_kfold_timeseries"] = sample_kfold_timeseries

ORACLES["sample_kfold_timeseries"] = f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n FROM events GROUP BY 1
    ),
    bounds AS (
      SELECT MIN(d) AS lo,
             date_diff('day', MIN(d), MAX(d)) + 1 AS span
      FROM daily
    ),
    folds AS (
      SELECT lo, fold,
             CAST(FLOOR(span / {TSCV_FOLDS + 1}.0) AS BIGINT) AS step
      FROM bounds, (SELECT unnest(generate_series(1, {TSCV_FOLDS})) AS fold)
    ),
    tagged AS (
      SELECT f.fold, f.step, y.n,
             date_diff('day', f.lo, y.d) AS off
      FROM daily y, folds f
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(MIN(step * fold) AS BIGINT) AS train_days,
           CAST(SUM(CASE WHEN off < step * fold THEN n ELSE 0 END)
                AS BIGINT) AS n_train_events,
           CAST(SUM(CASE WHEN off >= step * fold
                         AND off < step * (fold + 1) THEN n ELSE 0 END)
                AS BIGINT) AS n_test_events
    FROM tagged GROUP BY fold
"""
