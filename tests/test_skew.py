"""Skew-mitigation operators: salted join/agg must produce EXACTLY the
plain operator's results (salting changes the physical distribution, never
the logical result), and the salt must actually spread hot keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    hot = spark.range(5000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    cold = spark.range(100).select(
        (F.col("id") % 10).cast("string").alias("k"), (F.col("id") + 10000).alias("v")
    )
    return hot.union(cold)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([("hot", 1), ("3", 2), ("absent", 3)], "k string, w int")


def _counts(df):
    return sorted((r["k"], r["n"]) for r in df.groupBy("k").agg(F.count("*").alias("n")).collect())


def test_salted_join_inner_matches_plain(skewed, dim):
    plain = skewed.join(dim, "k")
    salted = skew.salted_join(skewed, dim, "k", salt=8)
    assert _counts(salted) == _counts(plain)
    assert sorted(salted.columns) == sorted(plain.columns)


def test_salted_join_left_matches_plain(skewed, dim):
    plain = skewed.join(dim, "k", "left")
    salted = skew.salted_join(skewed, dim, "k", salt=8, how="left")
    assert _counts(salted) == _counts(plain)
    # unmatched big rows survive exactly once with null w
    assert (
        salted.filter(F.col("w").isNull()).count()
        == plain.filter(F.col("w").isNull()).count()
    )


def test_salted_join_semi_anti(skewed, dim):
    for how in ("left_semi", "left_anti"):
        plain = skewed.join(dim, "k", how)
        salted = skew.salted_join(skewed, dim, "k", salt=8, how=how)
        assert _counts(salted) == _counts(plain)


def test_salted_join_rejects_right(skewed, dim):
    with pytest.raises(ValueError):
        skew.salted_join(skewed, dim, "k", how="right")


def test_salted_collect_is_multiset_equal(skewed):
    plain = {
        r["k"]: sorted(r["values"])
        for r in skewed.groupBy("k").agg(F.collect_list("v").alias("values")).collect()
    }
    salted = {
        r["k"]: sorted(r["values"])
        for r in skew.salted_agg_collect(skewed, "k", "v", salt=8).collect()
    }
    assert salted == plain


def test_salt_spreads_identical_rows(spark):
    # 1000 BYTE-IDENTICAL rows: a content-hash salt would put them all in
    # one bucket; the seeded-rand salt must spread them
    df = spark.range(1000).select(F.lit("dup").alias("k"))
    n_salts = skew.with_salt(df, 16).select("__salt").distinct().count()
    assert n_salts >= 12


def test_top_keys_reports_hot_key(skewed):
    top = skew.top_keys(skewed, "k", n=3).collect()
    assert top[0]["k"] == "hot"
    assert top[0]["share"] > 0.9


def test_aqe_skew_join_split_triggers(spark):
    """Direct evidence for the AQE-first skew policy: a sort-merge join
    with one hot key must come out of AQE with the skewed partition SPLIT
    (``skew=true`` on the SMJ node of the final adaptive plan). Thresholds
    are lowered to test scale; at production scale the defaults (256 MB)
    play the same role."""
    import contextlib
    import io

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        big = spark.range(400_000).select(
            F.lit("hot").alias("k"), F.col("id").alias("v")
        ).union(
            spark.range(1000).select(
                (F.col("id") % 50).cast("string").alias("k"), F.col("id").alias("v")
            )
        )
        right = spark.range(50).select(
            F.when(F.col("id") == 0, "hot").otherwise(F.col("id").cast("string")).alias("k"),
            F.col("id").alias("w"),
        )
        j = big.join(right, "k")
        # right covers "hot" and "1".."49" (id 0 became "hot"), so big's
        # key "0" rows (1000/50 = 20) drop out of the inner join. Execute
        # THIS DataFrame's own plan (collect, not count — count wraps it in
        # a different query) so its AdaptiveSparkPlan finalizes and
        # explain() shows the post-execution physical plan.
        assert len(j.collect()) == 400_000 + 1000 - 20
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain()  # post-action: prints the FINAL adaptive plan
        plan = buf.getvalue()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
