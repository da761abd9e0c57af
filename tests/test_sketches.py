"""HLL sketch aggregation (Apache DataSketches via Spark built-ins):
accuracy vs the exact count, and the mergeability property that enables
incremental distinct-count rollups (pre-aggregate per partition/day, union
sketches later — never re-scan raw data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.sources.tables import load_table


def test_hll_estimate_accuracy(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    got = (
        e.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert got, "no groups"
    for r in got:
        assert abs(r["approx"] - r["exact"]) <= max(2, 0.05 * r["exact"]), r


def test_hll_sketches_merge_like_a_rollup(spark, sf_dir):
    """Union of per-half sketches must estimate the same as one global
    sketch — the algebraic property incremental rollups rely on."""
    e = load_table(spark, sf_dir, "events")
    whole = e.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    halves = e.withColumn("half", F.col("event_id") % 2).groupBy("half").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = halves.select(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    assert merged == whole
