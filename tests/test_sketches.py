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


# ---------------------------------------------------------------------------
# Binned quantile sketch (operators/sketches.py)
# ---------------------------------------------------------------------------

from etl_pipeline_for_elasticsearch_json_document_spark.operators import sketches  # noqa: E402

_LO, _HI, _BINS = 900.0, 105000.0, 256


def test_binned_sketch_merge_equals_global(spark, sf_dir):
    """Summing the bin counts of per-half sketches must reproduce the
    global sketch exactly — the associativity that lets sketches roll up
    across shards/days without re-reading raw data."""
    li = load_table(spark, sf_dir, "lineitem")
    whole = sketches.binned_sketch(li, ["l_returnflag"], "l_extendedprice", _LO, _HI, _BINS)
    h0 = li.filter(F.col("l_orderkey") % 2 == 0)
    h1 = li.filter(F.col("l_orderkey") % 2 == 1)
    merged = (
        sketches.binned_sketch(h0, ["l_returnflag"], "l_extendedprice", _LO, _HI, _BINS)
        .unionByName(
            sketches.binned_sketch(h1, ["l_returnflag"], "l_extendedprice", _LO, _HI, _BINS)
        )
        .groupBy("l_returnflag", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_sketch_quantiles_within_bin_width_of_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    sk = sketches.binned_sketch(li, ["l_returnflag"], "l_extendedprice", _LO, _HI, _BINS)
    est = {
        r["l_returnflag"]: r
        for r in sketches.sketch_quantiles(
            sk, ["l_returnflag"], (0.5, 0.9), _LO, _HI, _BINS
        ).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
        )
        .collect()
    }
    width = (_HI - _LO) / _BINS
    for flag, r in est.items():
        assert abs(r["p50"] - exact[flag]["p50"]) <= width, (flag, r)
        assert abs(r["p90"] - exact[flag]["p90"]) <= width, (flag, r)
