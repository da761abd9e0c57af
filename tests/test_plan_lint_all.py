"""Exhaustive plan-lint gate: EVERY registered query's physical plan is
linted, and every accepted finding is an explicit, reasoned allowance.

A new query (or an edit to an old one) that introduces a cartesian
product, a row-at-a-time Python UDF, an unbounded single-partition
funnel, or an undocumented global sort fails CI here — the "would this
survive 100×?" review runs on the whole surface, not just the bench
headliners (tests/test_plan_lint.py covers those plus the rule
mechanics)."""

from __future__ import annotations

import pytest

from etl_pipeline_for_elasticsearch_json_document_spark.operators.plan_lint import lint_plan
from etl_pipeline_for_elasticsearch_json_document_spark.queries import all_queries

# Every entry is a finding the query's docstring justifies: the flagged
# relation is bounded by construction (broadcast scalar / K-row stats,
# vocabulary-sized windows) or the query exists to pin a SQL surface
# whose canonical spelling carries the shape.
BROADCAST_SCALAR = "broadcast 1-row/K-row relation crossJoined onto the stream"
ALLOWANCES: dict[str, dict[str, str]] = {
    # BroadcastNestedLoopJoin: bounded broadcast side by contract
    "q40_knn_bruteforce": {"nested-loop-join": "K query vectors broadcast"},
    "q42_knn_ivf": {"nested-loop-join": "k centroids broadcast"},
    "q45_ann_recall": {"nested-loop-join": BROADCAST_SCALAR},
    "q56_tfidf": {"nested-loop-join": "1-row corpus-size broadcast"},
    "q105_bigram_lift": {"nested-loop-join": "1-row token-total broadcast"},
    "q107_vector_quantize": {"nested-loop-join": "1-row calibration broadcast"},
    "q113_bm25_topk": {"nested-loop-join": "1-row corpus stats broadcast"},
    "q115_source_mix": {"nested-loop-join": "1-row total broadcast"},
    "q135_campaign_overlap": {"nested-loop-join": BROADCAST_SCALAR},
    "q137_json_key_profile": {"nested-loop-join": "1-row doc-count broadcast"},
    "q146_token_jsd": {"nested-loop-join": "lang-pair sketch cross, vocab-bounded"},
    "q147_kmv_sketch_overlap": {"nested-loop-join": "K-row sketch pair cross"},
    "q150_matryoshka_recall": {"nested-loop-join": "K query vectors broadcast"},
    "q161_hard_negatives": {"nested-loop-join": "query-set broadcast, non-equi <>"},
    "q162_quality_funnel": {"nested-loop-join": "stage-literal broadcast"},
    "q165_vocab_coverage": {
        "nested-loop-join": "1-row token-total broadcast",
        "single-partition": "cumulative window over the vocabulary relation",
    },
    "q167_truncation_loss": {"nested-loop-join": "3-row ctx-limit literal broadcast"},
    "q171_temperature_mix": {"nested-loop-join": "1-row total + 1-row Z broadcast"},
    "q173_label_shard_balance": {"nested-loop-join": "1-row N broadcast"},
    "q175_length_calibration": {
        "nested-loop-join": "1-row N broadcast",
        "single-partition": "cumulative window over DISTINCT n_chars values",
    },
    "q178_canary_scan": {"nested-loop-join": "K-row canary set broadcast"},
    "q179_filter_redundancy": {
        "nested-loop-join": "1-row quartile-cutoff broadcast",
        "single-partition": "exact-quartile ranking window; docstring documents "
        "the q175 distinct-value swap at scale",
    },
    "q180_event_cooccurrence": {"nested-loop-join": "1-row user-count broadcast"},
    "q185_dsir_importance": {
        "nested-loop-join": "1-row corpus-total broadcast onto the <=4096-row "
        "feature table"
    },
    "q187_blocking_audit": {
        "nested-loop-join": "1-row count aggregates crossJoined into the "
        "3-row audit report"
    },
    "q198_packing_boundary_curve": {
        "nested-loop-join": "3-row ctx spine literal broadcast"
    },
    "q199_gram_df_spectrum": {
        "nested-loop-join": "1-row vocab-total broadcast"
    },
    "q200_label_silhouette": {
        "nested-loop-join": "|labels|-row centroid table broadcast"
    },
    "q201_basket_lift": {
        "nested-loop-join": "1-row basket-total broadcast"
    },
    "q205_lang_source_chi2": {
        "nested-loop-join": "|langs|x|sources| marginal grid + 1-row totals "
        "broadcast"
    },
    "q206_langid_kappa": {
        "nested-loop-join": "1-row (n, agree) + 1-row pe aggregates crossed "
        "into the scalar report"
    },
    "q208_benford_price_audit": {
        "nested-loop-join": "1-row order-total broadcast onto the 9-digit "
        "relation"
    },
    # bounded / surface-demo single-partition + global-sort shapes
    "q12_rank_dense": {
        "single-partition": "global rank/ntile SQL surface over the supplier dim; "
        "partitioned variants are q10/q94"
    },
    "q174_dedup_growth_curve": {
        "single-partition": "cumulative window over the corpus/100 bucket relation"
    },
    "q160_lateral_topn": {
        "global-sort": "decorrelated LATERAL demo; window top-n twin is q10"
    },
}


def test_every_query_plan_is_clean_or_allowed(spark, sf_dir):
    unexpected: dict[str, list[str]] = {}
    stale: dict[str, list[str]] = {}
    for name, q in sorted(all_queries().items()):
        fn = getattr(q, "fn", q)
        found = {f["rule"] for f in lint_plan(fn(spark, sf_dir))}
        allowed = set(ALLOWANCES.get(name, {}))
        extra = found - allowed
        if extra:
            unexpected[name] = sorted(extra)
        unused = allowed - found
        if unused:
            stale[name] = sorted(unused)
    assert not unexpected, f"undocumented scale-hostile plan shapes: {unexpected}"
    # an allowance that stopped firing means the plan improved — prune it
    assert not stale, f"stale allowances (plan no longer carries them): {stale}"
