"""End-to-end shakeout of the fuzzy-dedup closer at a replicated scale:
minhash_lsh_pairs → connected_components → representative filter over a
corpus with *engineered* duplicate cliques (every doc replicated k times
with remapped ids).

What this pins, beyond the per-operator oracles:
  * the pipeline composes (pairs feed the closure; every replica group
    collapses to one representative);
  * convergence stays at clique speed (≤4 label-propagation rounds — the
    100 TB posture claims near-dup graphs are cliques-of-clusters);
  * the band-bucket self-join's output is balanced (no task holding 10× a
    median task's rows — the "would this shuffle survive 1000 executors"
    proxy we can measure on local[32]).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.operators.dedup import (
    minhash_lsh_pairs,
)
from etl_pipeline_for_elasticsearch_json_document_spark.operators.graph import dedup_clusters
from etl_pipeline_for_elasticsearch_json_document_spark.operators.skew import partition_balance

REPLICAS = 10


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = docs.count()
    # id remap keeps ids unique and makes replica 0 the min of its clique,
    # so the expected representative set is exactly the original ids.
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    return (
        docs.crossJoin(F.broadcast(reps))
        .select((F.col("doc_id") + F.col("rep") * F.lit(10 * n)).alias("doc_id"), "text")
    ), n


@pytest.mark.slow
def test_dedup_closer_end_to_end(corpus):
    docs, n_orig = corpus
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=16, bands=4).cache()
    try:
        iters: list = []
        labels = dedup_clusters(pairs, docs, iteration_log=iters).cache()
        n_reps = labels.filter("is_representative").count()
        # Replicas are byte-identical → identical signatures → every clique
        # is recovered; near-dups BETWEEN originals can merge cliques, so
        # the representative count is bounded by the original corpus and
        # must shrink the replicated one by ≥ the replica factor.
        assert n_reps <= n_orig
        assert labels.count() == n_orig * REPLICAS
        # every non-representative maps to a smaller live cluster id
        bad = labels.filter(F.col("cluster_id") > F.col("doc_id")).count()
        assert bad == 0
        # clique graphs converge in ≤4 propagation rounds
        assert len(iters) <= 4
        labels.unpersist()
    finally:
        pairs.unpersist()


def test_band_join_output_balance(corpus):
    docs, _ = corpus
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=16, bands=4)
    bal = partition_balance(pairs)
    # uniform md5 band keys → no reducer holds a hot bucket
    assert bal["ratio"] <= 10, bal


def test_star_edges_linear_bound_at_scale(corpus):
    """The 100 TB claim's empirical teeth at the replicated scale: the star
    edge relation is bounded by bands×docs (each doc emits ≤1 edge per band
    — none when it IS the bucket min), and on a clique-heavy corpus it sits
    NEAR that ceiling (≥10-doc cliques ⇒ ≤1 min per 10 docs per bucket), so
    the bound is tight, not vacuous. The pair path on the same corpus would
    grow quadratically in clique size (100× here, ~10¹¹× on a 1M-doc
    boilerplate bucket)."""
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.dedup import (
        lsh_bucket_edges,
    )

    docs, n_orig = corpus
    n = n_orig * REPLICAS
    bands = 4
    edges = lsh_bucket_edges(docs, "doc_id", "text", num_hashes=16, bands=bands).count()
    assert edges <= bands * n
    # per band: edges = n - n_buckets, and cliques ≥ REPLICAS docs keep
    # n_buckets ≤ n/REPLICAS ⇒ edges ≥ bands·n·(1 − 1/REPLICAS)
    assert edges >= bands * n * (1 - 1 / REPLICAS)


def test_bucket_star_components_equal_pair_components(spark, sf_dir):
    # A star to the bucket min spans exactly the bucket clique's component,
    # so closing over star edges (O(n·bands)) must produce the same
    # clusters as closing over ALL candidate pairs (threshold=0, quadratic)
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.dedup import (
        lsh_bucket_edges,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    star = dedup_clusters(lsh_bucket_edges(docs, "doc_id", "text"), docs)
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.0)
    clique = dedup_clusters(pairs, docs)
    assert star.exceptAll(clique).isEmpty() and clique.exceptAll(star).isEmpty()
