"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in
``etl_pipeline_for_elasticsearch_json_document_spark.queries`` (one entry
per operator from SURVEY.md §2); this module just adapts the registry to
the driver's interface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_pipeline_for_elasticsearch_json_document_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the engine's signature
    operation — flatten semi-structured events (JSON props) into the
    reference's wide all-string shape, executed as one Catalyst select."""
    from etl_pipeline_for_elasticsearch_json_document_spark.queries.registry import REGISTRY

    all_queries()
    return REGISTRY["q70_flatten_events"].fn(spark, "/root/testdata/sf0.001")


# Ordering policy: the driver verifies a bounded number (~50) of queries per
# round in dict order, so _ordered() emits (1) queries never yet driver-
# checked and not brand-new (the q106-q127 block plus the q67/q87 sketch
# queries reformulated this round to be oracle-checkable), (2) queries first
# registered this round, (3) already-driver-verified names.
# ALL of (1) and (2) are locally green against the same DuckDB oracles at the
# driver's sf0.01 (scripts/compare_oracle.py); the verified remainder keeps
# regression coverage via tests/test_queries.py. Round maintenance: after each
# CORRECTNESS_r{N}.json, move its green names into _DRIVER_VERIFIED and empty
# the new-this-round set.

#: Queries first registered in round 4 — ordered after block (1) so the
#: driver budget closes out every round-1/2/3 registration first.
_NEW_IN_R4: set[str] = {
    "q128_dedup_cluster_stats", "q129_regression_agg", "q130_ewma_daily",
    "q131_boilerplate_ratio", "q132_lsh_verify_calibration",
    "q133_salted_join", "q134_length_stratified_sample",
    "q135_campaign_overlap", "q136_debounce_events", "q137_json_key_profile",
    "q138_kmeans_codebook", "q139_semantic_dedup", "q140_heavy_hitters",
    "q141_prefix_filter_jaccard", "q142_asof_join_forward",
    "q143_event_transitions",
}

_DRIVER_VERIFIED = {
    "q01_pricing_summary", "q02_filter_predicates", "q03_revenue_topn",
    "q04_join_region_rollup", "q05_count_distinct", "q06_rollup", "q07_cube",
    "q08_grouping_sets", "q09_median_percentile", "q10_window_topk",
    "q11_window_running", "q12_rank_dense", "q13_sort_limit", "q14_union_all",
    "q15_intersect", "q16_except", "q17_semi_join", "q18_anti_join",
    "q19_outer_join_coalesce", "q20_string_funcs", "q21_date_funcs",
    "q22_case_when", "q23_json_extract", "q24_array_funcs", "q25_keyset_page",
    "q26_asof_join", "q27_range_join", "q28_exists_subquery_agg",
    "q29_tumbling_window", "q30_dedup_exact", "q31_jaccard_pairs",
    "q32_minhash_lsh", "q33_simhash_pairs", "q34_embedding_neardup",
    "q36_repetition_metrics", "q37_shingle_jaccard",
    "q40_knn_bruteforce", "q41_knn_lsh", "q42_knn_ivf", "q43_knn_pq",
    "q44_label_centroids", "q45_ann_recall", "q48_pagerank",
    "q50_token_stats", "q51_quality_metrics", "q52_lang_facet",
    "q53_fingerprint_groups", "q54_bigram_counts", "q55_language_id",
    "q57_char_ngram_profile", "q58_pii_redaction", "q59_train_split",
    "q60_multimodal_meta",
    # CORRECTNESS_r03 greens (48/48 hash-match; q67/q87 were no_oracle rows
    # and stay in block (1) after their round-4 oracle-checkable rewrite).
    "q35_dedup_clusters", "q38_sentence_dedup", "q46_cdc_chunk_dedup",
    "q47_flatten_families", "q56_tfidf", "q61_multimodal_decode",
    "q62_frame_sample", "q63_pipeline_e2e", "q64_sessionize",
    "q65_outlink_domains", "q66_audio_chunks", "q68_ntile_deciles",
    "q69_group_concat", "q70_flatten_events", "q71_winnowing_fingerprints",
    "q72_bpe_token_stats", "q73_zorder_key", "q74_binned_quantile_sketch",
    "q75_top_tokens_per_lang", "q76_variant_json", "q77_latest_by_key",
    "q78_mode_per_group", "q79_histogram", "q80_math_funcs",
    "q81_null_handling", "q82_string_more", "q83_date_more",
    "q84_scalar_subquery", "q85_in_subquery", "q86_literal_dim_join",
    "q88_posexplode", "q89_full_outer_join", "q90_map_functions",
    "q91_pivot", "q92_unpivot", "q93_stats_agg", "q94_window_distribution",
    "q95_sessionize", "q96_regexp_extract_all", "q97_rolling_time_window",
    "q98_nth_value", "q99_bool_bit_agg",
    "q100_decontaminate", "q101_domain_quota", "q102_sequence_packing",
    "q103_lsh_star_dedup", "q104_text_chunks", "q105_bigram_lift",
}


def _ordered() -> list[str]:
    names = sorted(all_queries())
    never_checked = [
        n for n in names if n not in _DRIVER_VERIFIED and n not in _NEW_IN_R4
    ]
    return (
        never_checked
        + [n for n in names if n in _NEW_IN_R4]
        + [n for n in names if n in _DRIVER_VERIFIED]
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = all_queries()
    return {name: reg[name].fn for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    reg = all_queries()
    return {name: reg[name].oracle for name in _ordered() if reg[name].oracle}
