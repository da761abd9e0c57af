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
# fact-scaled-broadcast allowance vocabulary. The rule flags every EXPLICIT
# broadcast hint whose build side scans an SF-scaled table without a
# limit/scalar-agg bound on its output spine; these constants name the
# contracts that bound such relations anyway. Each use below was re-audited
# this round (the rule landed together with the q201/q203 fixes, which are
# deliberately NOT allowed — they were real).
PROBE_SET = (
    "broadcast side is the probe/query/test set — K rows by contract "
    "(unique-id < K literal filter, a benchmark suite, a deletion manifest, "
    "or a canary list); the corpus streams map-side"
)
BOUNDED_DOMAIN_AGG = (
    "broadcast side is a grouped aggregate keyed on a bounded domain "
    "(language / event-type / label / shard / source / vector-dim / decile "
    "/ char-bigram vocabulary, or a kmeans-k centroid id), not a fact key"
)
SKETCH_RELATION = (
    "broadcast side is a fixed-size sketch (hash-modulus bucket keys: "
    "depth×width count-min cells or bottom-k KMV rows)"
)
TOKEN_VOCAB = (
    "broadcast side is the token-vocabulary relation (document frequencies); "
    "sublinear in corpus size (Heaps' law) and df-threshold-prunable — the "
    "docstring documents the shuffle fallback at open-vocab scale"
)
# bounded-key-window allowance vocabulary. The rule flags windows whose
# partition key is ONLY bounded-domain columns over an input it cannot prove
# bounded; these constants name the contracts that bound such inputs anyway.
VALUE_DOMAIN_WINDOW = (
    "cumulative window over a DISTINCT-VALUE relation (grouped by "
    "(bounded key, exact score) before the window — the q175 trick): input "
    "is bounded by the score's value domain, not the corpus; the rule "
    "cannot prove it because the grouping key includes the score column"
)
CARRY_WINDOW = (
    "the only flagged window is grouped_prefix_sum's CARRY pass over the "
    "per-chunk totals relation (one row per (group, chunk) — size "
    "chunk_width like a partition count so the chunk relation stays "
    "task-sized); the data-sized cumsum runs per (group, chunk), "
    "structurally pinned in tests/test_sampling_ops.py::"
    "test_prefix_sum_windows_are_chunk_bounded"
)
ALLOWANCES: dict[str, dict[str, str]] = {
    # BroadcastNestedLoopJoin: bounded broadcast side by contract
    "q40_knn_bruteforce": {
        "nested-loop-join": "K query vectors broadcast",
        "fact-scaled-broadcast": PROBE_SET,
    },
    "q42_knn_ivf": {
        "nested-loop-join": "k centroids broadcast",
        "fact-scaled-broadcast": PROBE_SET + "; the centroid and residual "
        "sides are kmeans-k-bounded grouped aggregates",
    },
    "q45_ann_recall": {
        "nested-loop-join": BROADCAST_SCALAR,
        "fact-scaled-broadcast": PROBE_SET + "; plus kmeans-k-bounded "
        "centroids for the IVF arm",
    },
    "q56_tfidf": {
        "nested-loop-join": "1-row corpus-size broadcast",
        "fact-scaled-broadcast": TOKEN_VOCAB,
    },
    "q105_bigram_lift": {"nested-loop-join": "1-row token-total broadcast"},
    "q107_vector_quantize": {"nested-loop-join": "1-row calibration broadcast"},
    "q113_bm25_topk": {
        "nested-loop-join": "1-row corpus stats broadcast",
        "fact-scaled-broadcast": "df postings joined in are restricted to "
        "the query's terms — query-vocabulary-bounded",
    },
    "q115_source_mix": {
        "nested-loop-join": "1-row total broadcast",
        "fact-scaled-broadcast": BOUNDED_DOMAIN_AGG,
    },
    "q135_campaign_overlap": {"nested-loop-join": BROADCAST_SCALAR},
    "q137_json_key_profile": {"nested-loop-join": "1-row doc-count broadcast"},
    "q146_token_jsd": {
        "nested-loop-join": "lang-pair sketch cross, vocab-bounded",
        "fact-scaled-broadcast": TOKEN_VOCAB,
    },
    "q147_kmv_sketch_overlap": {
        "nested-loop-join": "K-row sketch pair cross",
        "fact-scaled-broadcast": SKETCH_RELATION,
        "bounded-key-window": "pair-merge window input is the broadcast-"
        "joined KMV union — ≤ 2K rows per (type_a, type_b) pair by "
        "construction (the per-type sketches are K-bounded per_key_topk "
        "output)",
    },
    "q150_matryoshka_recall": {
        "nested-loop-join": "K query vectors broadcast",
        "fact-scaled-broadcast": PROBE_SET,
    },
    "q161_hard_negatives": {
        "nested-loop-join": "query-set broadcast, non-equi <>",
        "fact-scaled-broadcast": PROBE_SET,
    },
    "q162_quality_funnel": {"nested-loop-join": "stage-literal broadcast"},
    "q165_vocab_coverage": {
        "nested-loop-join": "1-row token-total broadcast",
        "single-partition": "cumulative window over the vocabulary relation",
    },
    "q167_truncation_loss": {"nested-loop-join": "3-row ctx-limit literal broadcast"},
    "q171_temperature_mix": {"nested-loop-join": "1-row total + 1-row Z broadcast"},
    "q242_epoch_budget_plan": {
        "nested-loop-join": "1-row total + 1-row Z broadcast (q171's shape "
        "on the source axis)"
    },
    "q244_trailing_wau": {
        "nested-loop-join": BROADCAST_SCALAR + " (the constant 7-row "
        "offset fan-out of the trailing window)"
    },
    "q173_label_shard_balance": {
        "nested-loop-join": "1-row N broadcast",
        "fact-scaled-broadcast": BOUNDED_DOMAIN_AGG,
    },
    "q175_length_calibration": {
        "nested-loop-join": "1-row N broadcast",
        "single-partition": "cumulative window over DISTINCT n_chars values",
        "fact-scaled-broadcast": BOUNDED_DOMAIN_AGG,
    },
    "q178_canary_scan": {
        "nested-loop-join": "K-row canary set broadcast",
        "fact-scaled-broadcast": PROBE_SET,
    },
    "q179_filter_redundancy": {
        "nested-loop-join": "1-row quartile-cutoff broadcast",
        "single-partition": "exact-quartile ranking window; docstring documents "
        "the q175 distinct-value swap at scale",
    },
    "q180_event_cooccurrence": {
        "nested-loop-join": "1-row user-count broadcast",
        "fact-scaled-broadcast": BOUNDED_DOMAIN_AGG,
    },
    "q185_dsir_importance": {
        "nested-loop-join": "1-row corpus-total broadcast onto the <=4096-row "
        "feature table",
        "fact-scaled-broadcast": "the <=4096-row hash-bucketed feature table "
        "(modulus-bounded grouping key)",
    },
    "q187_blocking_audit": {
        "nested-loop-join": "1-row count aggregates crossJoined into the "
        "3-row audit report"
    },
    "q198_packing_boundary_curve": {
        "nested-loop-join": "3-row ctx spine literal broadcast",
        "bounded-key-window": CARRY_WINDOW,
    },
    "q199_gram_df_spectrum": {
        "nested-loop-join": "1-row vocab-total broadcast"
    },
    "q200_label_silhouette": {
        "nested-loop-join": "|labels|-row centroid table broadcast",
        "fact-scaled-broadcast": BOUNDED_DOMAIN_AGG,
    },
    "q201_basket_lift": {
        "nested-loop-join": "1-row basket-total broadcast"
    },
    "q205_lang_source_chi2": {
        "nested-loop-join": "|langs|x|sources| marginal grid + 1-row totals "
        "broadcast",
        "fact-scaled-broadcast": BOUNDED_DOMAIN_AGG,
    },
    "q206_langid_kappa": {
        "nested-loop-join": "1-row (n, agree) + 1-row pe aggregates crossed "
        "into the scalar report"
    },
    "q208_benford_price_audit": {
        "nested-loop-join": "1-row order-total broadcast onto the 9-digit "
        "relation"
    },
    "q212_part_value_concentration": {
        "nested-loop-join": "1-row total/part-count aggregate crossJoined "
        "back onto the per-part relation (the Q11 scalar threshold)"
    },
    "q214_idle_customer_audit": {
        "nested-loop-join": "1-row average-balance aggregate crossJoined "
        "onto customer (the Q22 scalar threshold)"
    },
    # fact-scaled-broadcast: contract-bounded build sides (see constants)
    "q41_knn_lsh": {"fact-scaled-broadcast": PROBE_SET},
    "q43_knn_pq": {
        "fact-scaled-broadcast": PROBE_SET + "; the PQ codebook / distance "
        "tables are (m x k)-bounded grouped aggregates"
    },
    "q100_decontaminate": {"fact-scaled-broadcast": PROBE_SET},
    "q243_contamination_cascade": {
        "fact-scaled-broadcast": PROBE_SET + "; only the test-side gram "
        "postings carry the hint — the hit/cluster sets are unhinted "
        "(AQE decides, the q203 rule)"
    },
    "q106_count_min": {"fact-scaled-broadcast": SKETCH_RELATION},
    "q110_fuzzy_decontaminate": {"fact-scaled-broadcast": PROBE_SET},
    "q116_decontaminated_stats": {"fact-scaled-broadcast": PROBE_SET},
    "q140_heavy_hitters": {"fact-scaled-broadcast": SKETCH_RELATION},
    "q145_winsorized_stats": {"fact-scaled-broadcast": BOUNDED_DOMAIN_AGG},
    "q153_bloom_decontaminate": {"fact-scaled-broadcast": PROBE_SET},
    "q154_line_dedup_rebuild": {
        "fact-scaled-broadcast": "boilerplate-line relation: lines with "
        "df >= threshold — the hot-line vocabulary, df-threshold-pruned "
        "before the hint"
    },
    "q155_char_lm_score": {
        "fact-scaled-broadcast": BOUNDED_DOMAIN_AGG + " (char bigrams: "
        "alphabet^2 rows)"
    },
    "q166_source_overlap": {"fact-scaled-broadcast": BOUNDED_DOMAIN_AGG},
    "q170_deletion_manifest": {"fact-scaled-broadcast": PROBE_SET},
    "q189_label_margin_audit": {"fact-scaled-broadcast": BOUNDED_DOMAIN_AGG},
    "q209_embedding_cov_probe": {"fact-scaled-broadcast": BOUNDED_DOMAIN_AGG},
    # band-join: residual inequality over a bounded equi-key group
    "q139_semantic_dedup": {
        "band-join": "within-cluster candidate residual (id_a < id_b) over "
        "the kmeans cluster-id equi-key; pair work is cluster-blocked by "
        "construction, pinned in tests/test_plans.py::"
        "test_semantic_dedup_pairs_are_cluster_blocked"
    },
    # bounded-key-window: value-domain / vocabulary / surface-demo windows
    "q217_scorer_rank_correlation": {"bounded-key-window": VALUE_DOMAIN_WINDOW},
    "q222_user_value_gini": {"bounded-key-window": VALUE_DOMAIN_WINDOW},
    "q245_zipf_slope": {"bounded-key-window": VALUE_DOMAIN_WINDOW},
    "q134_length_stratified_sample": {"bounded-key-window": VALUE_DOMAIN_WINDOW},
    "q68_ntile_deciles": {
        "bounded-key-window": "ntile SQL-surface demo (per-status deciles "
        "over orders); the scalable quantile paths are q74's binned sketch "
        "and the q175/q134 distinct-value decomposition"
    },
    "q94_window_distribution": {
        "bounded-key-window": "window-distribution SQL surface (ntile / "
        "percent_rank / cume_dist): the per-row exact global ranking IS the "
        "pinned surface; scalable summaries are q74/q175/q134"
    },
    # (q102/q198/q210 run grouped_prefix_sum's hierarchical form in r10 —
    # only the tiny carry pass still windows on the bare group key; q210's
    # composite (score desc, id) order rides the exact 6dp integer key +
    # tiebreak_cols)
    "q102_sequence_packing": {"bounded-key-window": CARRY_WINDOW},
    "q210_budget_selection": {"bounded-key-window": CARRY_WINDOW},
    "q234_dominant_part_suppliers": {
        "band-join": "the 15%-share threshold is a residual on the "
        "l_partkey equi-join whose RIGHT side (per-part totals) has "
        "exactly one row per key — matched pairs equal the per-"
        "(supplier, part) relation, never |key-group|²; the rule cannot "
        "see the one-row-per-key bound"
    },
    # bounded / surface-demo single-partition + global-sort shapes
    "q12_rank_dense": {
        "single-partition": "global rank/ntile SQL surface over the supplier dim; "
        "partitioned variants are q10/q94"
    },
    "q174_dedup_growth_curve": {
        "single-partition": "cumulative window over the corpus/100 bucket relation"
    },
    "q223_backlog_curve": {
        "single-partition": "cumulative backlog window over the calendar-"
        "month relation (bounded: decades ≈ hundreds of rows)"
    },
    "q249_flatten_width_contract": {
        "single-partition": "batch-shift LAG window over the batch-domain "
        "relation (export days/epochs — tiny at any corpus size); r13 "
        "replaced the r12 self-join, whose double consumption forced an "
        "unreleasable internal cache (ADVICE r12)"
    },
    "q250_volume_contract": {
        "single-partition": "trailing-RANGE window over the batch-domain "
        "relation (one row per export day — tiny at any corpus size; the "
        "corpus-sized work is the map-side count/sum partial agg before it)"
    },
    "q227_balance_outliers_robust": {
        "fact-scaled-broadcast": BOUNDED_DOMAIN_AGG + " — the median/MAD "
        "relations are keyed on nationkey, a 25-value domain at EVERY SF"
    },
    "q160_lateral_topn": {
        "global-sort": "decorrelated LATERAL demo; window top-n twin is q10"
    },
}


@pytest.mark.slow
def test_every_query_plan_is_clean_or_allowed(spark, sf_dir):
    # r14 (suite wall time, VERDICT r13 item 2): the 248 plan builds +
    # explains are driver-side JVM work behind py4j calls that release
    # the GIL, and every query fn is session-read-only (temp views are
    # query-name-prefixed), so they lint safely from a thread pool —
    # same assertions, ~4x less wall.
    from concurrent.futures import ThreadPoolExecutor

    def lint_one(item):
        name, q = item
        fn = getattr(q, "fn", q)
        return name, {f["rule"] for f in lint_plan(fn(spark, sf_dir))}

    unexpected: dict[str, list[str]] = {}
    stale: dict[str, list[str]] = {}
    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(lint_one, sorted(all_queries().items())))
    for name, found in results:
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
