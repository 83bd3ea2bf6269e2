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
    citydir,
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
# queries() in insertion order, so keys are emitted never-oracle-green
# first (per CORRECTNESS_r01/r02): the 18 keys no gate has ever reached,
# then the 26 batch events keys + 8 streaming keys broken by r02's ts
# dtype flip (fixed in sources.tables.events_ts_encoding this round).
# Keys green in r01 or r02 follow, for cheap re-confirmation if budget
# remains.
_GATE_PRIORITY = [
    # --- never inside any round's gate budget ---
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_stock",
    "q16_supplier_cnt",
    "q20_promotable_suppliers",
    "q21_waiting_suppliers",
    "q4_order_priority",
    "q12_shipmode_priority",
    "q_bucketed_join",
    "q_bloom_semi_reduction",
    "profile_numeric",
    "profile_categorical",
    "q_grouping_sets",
    "q_cohort_retention",
    "q_range_frame_total",
    "cd_logs",
    "cd_pipeline",
    "cd_parse_multi",
    # --- batch events keys, broken by the r02 ts dtype flip ---
    "q_distinct_users",
    "q_sessionize",
    "q_tumbling_window",
    "q_pivot",
    "q_asof_join",
    "q_range_join",
    "q_json_extract",
    "q_percentiles",
    "q_funnel",
    "q_first_touch",
    "q_moving_avg",
    "q_date_spine",
    "q_running_distinct",
    "q_value_histogram",
    "q_anomaly_mad",
    "q_interval_overlap",
    "q_event_transitions",
    "q_skew_salted_agg",
    "q_upsert_merge",
    "q_scd2_history",
    "q_approx_distinct",
    "q_approx_quantiles",
    "q_dpp_partition_pruned",
    "q_bitmap_distinct",
    "q_gdpr_erasure",
    "q_event_paths",
    # --- streaming keys, same root cause ---
    "stream_tumbling_agg",
    "stream_sessionize",
    "stream_sliding_agg",
    "stream_late_data",
    "stream_stream_join",
    "stream_foreachbatch_upsert",
    "stream_session_window",
    "stream_dedup_within_watermark",
    # --- new this round (first gate opportunity r03/r04) ---
    "cd_parse_tagged",
    "dedup_shared_spans",
    "sample_domain_mix",
    "corpus_prepare_pipeline",
    "cd_link_persons",
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
