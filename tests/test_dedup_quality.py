"""Dedup quality guarantees (SURVEY §5): the LSH approximation must
actually find near-duplicates, not just run.

Recall check: every pair the exact all-pairs jaccard scorer finds at
high similarity must be surfaced by the banded-LSH candidate pipeline.
With 8 minhashes in 4 bands of 2, P[candidate] = 1-(1-j²)⁴ (≈ 0.99 at
j=0.8, ≈ 0.94 at j=0.6), so high-sim pairs missing from LSH output
indicate a broken banding/signature, not statistics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_city_directories_spark.operators import dedup

SF = "/root/testdata/sf0.01"
HIGH_SIM = 0.8


def _exact_pairs(spark, threshold: float) -> set[tuple[int, int]]:
    """Brute-force all-pairs exact jaccard (test-only oracle)."""
    sh = dedup._shingled_df(spark, SF).select("doc_id", "shingles").persist()
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    rows = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            dedup._jaccard(F.col("sh_a"), F.col("sh_b")).alias("j"),
        )
        .filter(F.col("j") >= threshold)
        .collect()
    )
    sh.unpersist()
    return {(r.doc_a, r.doc_b) for r in rows}


def test_lsh_finds_all_high_similarity_pairs(spark):
    truth = _exact_pairs(spark, HIGH_SIM)
    assert truth, "corpus should contain high-similarity pairs"
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_minhash_lsh(spark, SF).collect()
    }
    missed = truth - lsh
    recall = 1 - len(missed) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall:.2f}; missed {sorted(missed)[:5]}"


def test_lsh_verification_removes_false_positives(spark):
    """Everything LSH reports must genuinely clear the jaccard
    threshold (the verify stage, not the banding, owns precision)."""
    reported = dedup.dedup_minhash_lsh(spark, SF).collect()
    assert reported
    truth = _exact_pairs(spark, dedup.LSH_VERIFY_THRESHOLD)
    for r in reported:
        assert (r.doc_a, r.doc_b) in truth


def test_clusters_are_consistent_with_pairs(spark):
    """Every verified pair lands in one cluster; cluster id is the
    component minimum; sizes agree with membership."""
    pairs = [
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_minhash_lsh(spark, SF).collect()
    ]
    clusters = dedup.dedup_lsh_clusters(spark, SF).collect()
    label = {r.doc_id: r.cluster_id for r in clusters}
    size = {r.doc_id: r.cluster_size for r in clusters}
    for a, b in pairs:
        assert label[a] == label[b], f"pair ({a},{b}) split across clusters"
    by_cluster: dict[int, set[int]] = {}
    for doc, cl in label.items():
        by_cluster.setdefault(cl, set()).add(doc)
    for cl, members in by_cluster.items():
        assert cl == min(members)
        assert all(size[d] == len(members) for d in members)


def test_ann_lsh_recall_vs_bruteforce(spark):
    """Multi-table SRP-LSH must recover ≥70% of the exact top-5
    neighbor pairs (deterministic: hyperplanes are md5-derived)."""
    from etl_city_directories_spark.operators.similarity import (
        ann_lsh_cosine,
        ann_topk_bruteforce,
    )

    sf = "/root/testdata/sf0.01"
    bf = {(r.probe_id, r.neighbor_id) for r in ann_topk_bruteforce(spark, sf).collect()}
    lsh = {(r.probe_id, r.neighbor_id) for r in ann_lsh_cosine(spark, sf).collect()}
    assert len(bf & lsh) / len(bf) >= 0.70


def test_ann_ivf_kmeans_recall_vs_bruteforce(spark):
    """The k-means-trained IVF (single-cell probe) must recover a
    meaningful share of exact top-5 neighbors, and the trained cells
    must form a proper partition of the corpus (deterministic: md5
    seeds + decimal centroid math)."""
    from etl_city_directories_spark.operators.similarity import (
        N_CELLS,
        ann_ivf_bucketed,
        ann_topk_bruteforce,
        kmeans_cells,
    )

    sf = "/root/testdata/sf0.01"
    members = kmeans_cells(spark, sf).filter(F.col("cell_rank") == 1)
    counts = {
        r.cell: r.n
        for r in members.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == members.count()  # every vector assigned once
    assert len(counts) >= N_CELLS // 2  # training didn't collapse
    bf = {(r.probe_id, r.neighbor_id) for r in ann_topk_bruteforce(spark, sf).collect()}
    ivf = {(r.probe_id, r.neighbor_id) for r in ann_ivf_bucketed(spark, sf).collect()}
    assert len(bf & ivf) / len(bf) >= 0.40  # nprobe=2 of 8 cells


def test_ann_pq_adc_recall_vs_bruteforce(spark):
    """PQ-ADC with exact re-rank must recover ≥75% of the exact-L2
    top-5 neighbors (measured 0.86 at shortlist 80; deterministic:
    md5 seeds + decimal Lloyd + decimal ADC sums), and every corpus
    vector must encode to exactly M_SUB codes."""
    from etl_city_directories_spark.operators.similarity import (
        M_SUB,
        N_PROBES,
        TOP_K,
        _dist2,
        _pq_codebooks,
        _vectors,
        ann_pq_adc,
    )
    from pyspark.sql import Window

    sf = "/root/testdata/sf0.01"
    _, codes = _pq_codebooks(spark, sf)
    per_vec = codes.groupBy("vec_id").agg(F.count("*").alias("n"))
    assert per_vec.filter(F.col("n") != M_SUB).count() == 0

    vecs = _vectors(spark, sf)
    probes = vecs.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")
    )
    w = Window.partitionBy("probe_id").orderBy("d2", "neighbor_id")
    bf = {
        (r.probe_id, r.neighbor_id)
        for r in (
            vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
            .join(F.broadcast(probes), F.col("neighbor_id") != F.col("probe_id"))
            .select(
                "probe_id",
                "neighbor_id",
                _dist2(F.col("pv"), F.col("cv")).alias("d2"),
            )
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TOP_K)
            .collect()
        )
    }
    pq = {(r.probe_id, r.neighbor_id) for r in ann_pq_adc(spark, sf).collect()}
    assert len(bf & pq) / len(bf) >= 0.75


def test_ngram_novelty_bounds_and_first_doc_wins(spark):
    """Novelty ∈ (0,1]; the corpus's first doc is fully novel; totals
    conserve: sum(n_novel) == number of distinct shingles."""
    from etl_city_directories_spark.operators.dedup import (
        _shingled_df,
        text_ngram_novelty,
    )

    sf = "/root/testdata/sf0.001"
    rows = text_ngram_novelty(spark, sf).collect()
    by_id = {r.doc_id: r for r in rows}
    assert all(0 <= r.n_novel <= r.n_grams for r in rows)
    # novelty is rounded to 4 dp at the projection
    assert all(abs(r.novelty - r.n_novel / r.n_grams) < 5.1e-5 for r in rows)
    first_doc = min(by_id)
    assert by_id[first_doc].novelty == 1.0  # nothing precedes it
    sh = _shingled_df(spark, sf).collect()
    distinct_shingles = len({g for r in sh for g in r.shingles})
    assert sum(r.n_novel for r in rows) == distinct_shingles


def test_lsh_tuning_probabilities_are_exact_and_monotone(spark):
    """p(s) must equal the closed form exactly, rise with s, and more
    bands must dominate at low similarity."""
    from etl_city_directories_spark.operators.dedup import dedup_lsh_tuning

    rows = dedup_lsh_tuning(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 3 * 19
    by_cfg = {}
    for r in rows:
        by_cfg.setdefault(r.config, {})[round(r.s * 20)] = r
    for cfg, b, rr in (("b8r1", 8, 1), ("b4r2", 4, 2), ("b2r4", 2, 4)):
        seq = [by_cfg[cfg][k] for k in range(1, 20)]
        for k, row in zip(range(1, 20), seq):
            s = k / 20
            expect = 1 - (1 - s**rr) ** b
            assert abs(row.detect_prob - expect) < 1e-6, (cfg, k)
            assert abs(row.expected_caught - row.detect_prob * row.n_pairs) < 5e-4
        probs = [r.detect_prob for r in seq]
        assert probs == sorted(probs)  # monotone in s
    for k in range(1, 10):  # low similarity: more bands catch more
        assert (
            by_cfg["b8r1"][k].detect_prob
            >= by_cfg["b4r2"][k].detect_prob
            >= by_cfg["b2r4"][k].detect_prob
        )
