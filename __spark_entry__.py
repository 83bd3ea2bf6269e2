"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are assembled from the operator
modules in etl_city_directories_spark/ — each module exports a
``QUERIES`` dict (name → (spark, sf_dir) -> DataFrame) and an
``ORACLES`` dict (name → DuckDB ANSI SQL) with identical column
aliases. SURVEY.md §2 is the inventory these keys implement.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_city_directories_spark.operators import (
    analytics,
    citydir,
    curation,
    dedup,
    ingest,
    multimodal,
    partsupp,
    relational,
    relational_ext,
    scale_ops,
    shaping,
    similarity,
    temporal,
    textstats,
    windows,
)
from etl_city_directories_spark.streaming import stream_ops

_MODULES = [
    analytics,
    curation,
    dedup,
    similarity,
    textstats,
    multimodal,
    stream_ops,
    ingest,
    partsupp,
    relational,
    relational_ext,
    scale_ops,
    windows,
    temporal,
    shaping,
    citydir,
]

# The driver's correctness gate has a ~50-key-per-round budget and walks
# queries() in insertion order. Recomputed for r05 from CORRECTNESS_r01-r04
# (tools/gate_priority.py), then extended as round 5 widened the surface
# 169 → 200: the 31 r05-new keys lead (zero driver evidence — they must
# consume the budget first), followed by dedup_simhash (newly oracle'd)
# and the stale r01/r02 greens oldest-first. The staleness rotation the
# r04 verdict asked for therefore spills into r06's budget; recompute
# via tools/gate_priority.py next round.
_GATE_PRIORITY = [
    "q_market_basket",
    "q_rfm_segmentation",
    "q_skew_salted_join",
    "q_k_anonymity",
    "graph_triangle_count",
    "text_char_entropy",
    "q_table_checksum",
    "q_unpivot",
    "text_ngram_novelty",
    "dedup_lsh_tuning",
    "mm_image_meta",
    "mm_frame_sample",
    "mm_audio_meta",
    "q_regr_trend",
    "q_pareto_abc",
    "corpus_mix_epochs",
    "bpe_pair_counts",
    "bpe_train_merges",
    "bpe_encode",
    "sketch_countmin_topk",
    "dedup_bloom_incremental",
    "ann_ivf_pq",
    "emb_pca_power",
    "emb_pca_project",
    "text_ocr_spellfix",
    "profile_dq_rules",
    "emb_knn_classify",
    "emb_hard_negatives",
    "dedup_containment",
    "sample_weighted_reservoir",
    "q_time_weighted_avg",
    "q_ohlc_bars",
    "stream_ohlc_bars",
    "dedup_semantic",
    "q_hll_partial_rollup",
    "dedup_simhash",
    "cd_relations",
    "cd_transform_objects",
    "cd_year_normalize",
    "q10_returned_items",
    "q13_order_count_dist",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive",
    "q1_pricing_summary",
    "q22_idle_customers",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q_anti_join",
    "q_corr_max_order",
    "q_cube_status_priority",
    "q_exists_agg",
    "q_rollup",
    "q_semi_join",
    "q_top_customers",
    "q_window_rank",
    "q_window_running",
    "source_csv_roundtrip",
    "ann_ivf_bucketed",
    "ann_lsh_cosine",
    "ann_pq_adc",
    "ann_topk_bruteforce",
    "decontaminate",
    "decontaminate_fuzzy",
    "dedup_embedding",
    "dedup_exact",
    "dedup_keep_first",
    "dedup_lsh_clusters",
    "dedup_minhash_lsh",
    "dedup_near_keep_first",
    "dedup_ngram_jaccard",
    "dedup_report",
    "mm_caption_pairs",
    "mm_payload_stats",
    "sample_bernoulli",
    "sample_stratified",
    "sample_temperature",
    "shard_manifest",
    "sink_partitioned",
    "stream_dedup_exact",
    "stream_static_join",
    "text_chunk",
    "text_corpus_stats",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_score",
    "text_redact_pii",
    "text_repetition_stats",
    "text_tfidf_topk",
    "text_token_count",
    "text_top_terms",
    "text_unigram_logprob",
    "cd_logs",
    "cd_parse_multi",
    "cd_pipeline",
    "profile_categorical",
    "profile_numeric",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q16_supplier_cnt",
    "q20_promotable_suppliers",
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q9_product_profit",
    "q_anomaly_mad",
    "q_asof_join",
    "q_bitmap_distinct",
    "q_bloom_semi_reduction",
    "q_bucketed_join",
    "q_cohort_retention",
    "q_date_spine",
    "q_distinct_users",
    "q_dpp_partition_pruned",
    "q_event_paths",
    "q_event_transitions",
    "q_first_touch",
    "q_funnel",
    "q_gdpr_erasure",
    "q_grouping_sets",
    "q_interval_overlap",
    "q_json_extract",
    "q_moving_avg",
    "q_percentiles",
    "q_pivot",
    "q_range_frame_total",
    "q_range_join",
    "q_running_distinct",
    "q_scd2_history",
    "q_sessionize",
    "q_skew_salted_agg",
    "q_tumbling_window",
    "q_upsert_merge",
    "q_value_histogram",
    "stream_foreachbatch_upsert",
    "stream_late_data",
    "stream_sessionize",
    "stream_sliding_agg",
    "stream_stream_join",
    "stream_tumbling_agg",
    "ann_mmr_diversify",
    "ann_rrf_hybrid",
    "cd_clean_text",
    "cd_geocode",
    "cd_link_persons",
    "cd_make_id",
    "cd_occupation_year_stats",
    "cd_page_filter",
    "cd_parse_entries",
    "cd_parse_tagged",
    "cd_validate_schema",
    "corpus_prepare_pipeline",
    "dedup_cross_source",
    "dedup_prefix",
    "dedup_segments",
    "dedup_shared_spans",
    "graph_pagerank_dupes",
    "mm_shard_pack",
    "pack_sequences",
    "q_attribution_linear",
    "q_bitmap_set_algebra",
    "q_cdc_apply",
    "q_gaps_islands",
    "q_hierarchy_rollup",
    "q_histogram_equidepth",
    "q_incremental_rollup",
    "q_snapshot_diff",
    "q_string_agg",
    "q_zorder_layout",
    "sample_balanced_classes",
    "sample_domain_mix",
    "sample_dsir",
    "sample_reservoir",
    "sample_train_test_split",
    "shuffle_global_permute",
    "source_json_roundtrip",
    "source_orc_roundtrip",
    "stream_chained_windows",
    "stream_checkpoint_recovery",
    "stream_dedup_within_watermark",
    "stream_python_source",
    "stream_session_window",
    "stream_stateful_processor",
    "stream_topk",
    "text_domain_classify",
    "text_gopher_filter",
    "text_mojibake_stats",
    "text_perplexity_buckets",
    "cd_download",
    "hocr_parse",
    "manifest_parse",
    "ndjson_sink",
    "q_approx_distinct",
    "q_approx_quantiles",
    "hocr_source_v2",
]


def _ordered(mapping: dict) -> dict:
    out = {k: mapping[k] for k in _GATE_PRIORITY if k in mapping}
    out.update({k: v for k, v in mapping.items() if k not in out})
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return _ordered(out)
