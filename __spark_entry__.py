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
# checked and not brand-new (the q35-q103 block incl. r3-edited q38/q46/q56),
# (2) queries first registered this round, (3) already-driver-verified names.
# ALL of (1) and (2) are locally green against the same DuckDB oracles at the
# driver's sf0.01 (scripts/compare_oracle.py); the verified remainder keeps
# regression coverage via tests/test_queries.py. Round maintenance: after each
# CORRECTNESS_r{N}.json, move its green names into _DRIVER_VERIFIED and empty
# the new-this-round set.

#: Queries first registered in round 3 — ordered after block (1) so the
#: driver budget closes out every round-1/2 registration first.
_NEW_IN_R3 = {
    "q104_text_chunks", "q105_bigram_lift", "q106_count_min",
    "q107_vector_quantize", "q108_scd2", "q109_dedup_weights",
    "q110_fuzzy_decontaminate", "q111_weighted_sample", "q112_facets",
    "q113_bm25_topk", "q114_triangle_counts", "q115_source_mix",
    "q116_decontaminated_stats", "q117_novelty_scores", "q118_profile",
    "q119_gap_fill", "q120_null_safe_join", "q121_union_schema_evolution",
    "q122_bfs_levels", "q123_funnel", "q124_retention_cohorts",
    "q125_fuzzy_match", "q126_anomaly_days", "q127_snapshot_diff",
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
}


def _ordered() -> list[str]:
    names = sorted(all_queries())
    never_checked = [
        n for n in names if n not in _DRIVER_VERIFIED and n not in _NEW_IN_R3
    ]
    return (
        never_checked
        + [n for n in names if n in _NEW_IN_R3]
        + [n for n in names if n in _DRIVER_VERIFIED]
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = all_queries()
    return {name: reg[name].fn for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    reg = all_queries()
    return {name: reg[name].oracle for name in _ordered() if reg[name].oracle}
