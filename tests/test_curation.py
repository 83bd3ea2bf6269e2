"""Curation-operator properties: balanced classes, split invariants,
perplexity-bucket shape."""

import pyspark.sql.functions as F

from etl_city_directories_spark.operators.curation import (
    sample_balanced_classes,
    sample_train_test_split,
    text_perplexity_buckets,
)
from etl_city_directories_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_balanced_classes_exact_min_count(spark):
    """Every label keeps exactly min(class sizes) rows, and the kept
    rows are a subset of the originals."""
    kept = sample_balanced_classes(spark, SF)
    counts = {
        r["label"]: r["n"]
        for r in kept.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    raw = {
        r["label"]: r["n"]
        for r in load_table(spark, SF, "embeddings")
        .groupBy("label")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    min_n = min(raw.values())
    assert set(counts) == set(raw)
    assert all(n == min_n for n in counts.values())


def test_balanced_classes_deterministic(spark):
    """Hash-order selection: two runs return the identical row set."""
    a = sorted(map(tuple, sample_balanced_classes(spark, SF).collect()))
    b = sorted(map(tuple, sample_balanced_classes(spark, SF).collect()))
    assert a == b


def test_split_partitions_corpus(spark):
    """train/valid/test is a disjoint, complete partition of the corpus
    with fractions near 75/12.5/12.5."""
    audit = sample_train_test_split(spark, SF).collect()
    total_docs = load_table(spark, SF, "documents").count()
    by_split = {}
    for r in audit:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    assert sum(by_split.values()) == total_docs
    assert set(by_split) == {"train", "valid", "test"}
    assert 0.65 <= by_split["train"] / total_docs <= 0.85
    assert 0.05 <= by_split["valid"] / total_docs <= 0.20
    assert 0.05 <= by_split["test"] / total_docs <= 0.20


def test_split_is_hash_composable(spark):
    """A doc's split never depends on the rest of the corpus: the
    assignment recomputed from md5 alone matches the audit totals."""
    docs = load_table(spark, SF, "documents")
    key = F.md5(F.col("doc_id").cast("string"))
    manual = (
        docs.select(
            F.when(key < "c" + "0" * 31, "train")
            .when(key < "e" + "0" * 31, "valid")
            .otherwise("test")
            .alias("split")
        )
        .groupBy("split")
        .agg(F.count("*").alias("n"))
    )
    manual_counts = {r["split"]: r["n"] for r in manual.collect()}
    audit = sample_train_test_split(spark, SF).collect()
    audit_counts = {}
    for r in audit:
        audit_counts[r["split"]] = audit_counts.get(r["split"], 0) + r["n_docs"]
    assert manual_counts == audit_counts


def test_perplexity_buckets_shape(spark):
    """Per language: three buckets, sizes within 1 of each other
    (NTILE), and head is strictly more fluent than tail."""
    rows = text_perplexity_buckets(spark, SF).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}, lang
        sizes = [b["n_docs"] for b in buckets.values()]
        assert max(sizes) - min(sizes) <= 1, lang
        assert (
            buckets["head"]["avg_surprisal"] < buckets["tail"]["avg_surprisal"]
        ), lang
