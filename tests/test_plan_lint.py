"""Plan linter: each rule fires on a crafted scale-hostile plan and
stays silent on the idiomatic alternative; assert_scalable gates on the
allow-set contract; headline production queries come out clean."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType
from pyspark.sql.window import Window

from etl_pipeline_for_elasticsearch_json_document_spark.operators.plan_lint import (
    assert_scalable,
    lint_plan,
)
from etl_pipeline_for_elasticsearch_json_document_spark.sources.tables import load_table


def _rules(df):
    return {f["rule"] for f in lint_plan(df)}


def test_cartesian_product_flagged(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    # small crossJoins compile to BNLJ (broadcastable side); a true
    # CartesianProduct needs both sides non-broadcastable
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert "cartesian-product" in _rules(a.crossJoin(b))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "nested-loop-join" in _rules(a.crossJoin(b))
    # equi-join on the same relations: clean
    assert _rules(a.join(b, a.id == b.id2)) & {"cartesian-product", "nested-loop-join"} == set()


def test_nested_loop_join_flagged(spark):
    a = spark.range(100).toDF("x")
    b = spark.range(100).toDF("y")
    nonequi = a.join(F.broadcast(b), F.col("x") < F.col("y"))
    assert "nested-loop-join" in _rules(nonequi)


def test_python_row_udf_flagged_arrow_not(spark):
    rowudf = F.udf(lambda s: s.upper(), StringType(), useArrow=False)
    df = spark.range(5).select(rowudf(F.col("id").cast("string")).alias("u"))
    assert "python-row-udf" in _rules(df)
    arrowudf = F.udf(lambda s: s.upper(), StringType(), useArrow=True)
    df2 = spark.range(5).select(arrowudf(F.col("id").cast("string")).alias("u"))
    assert "python-row-udf" not in _rules(df2)


def test_single_partition_and_global_sort_flagged(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    # window without partitionBy: everything through one task
    w = o.withColumn("r", F.row_number().over(Window.orderBy("o_orderkey")))
    assert "single-partition" in _rules(w)
    # partitioned window: clean
    wp = o.withColumn(
        "r", F.row_number().over(Window.partitionBy("o_custkey").orderBy("o_orderkey"))
    )
    assert "single-partition" not in _rules(wp)
    # unbounded global sort flagged; bounded top-k (TakeOrderedAndProject) not
    assert "global-sort" in _rules(o.orderBy("o_totalprice"))
    assert "global-sort" not in _rules(o.orderBy("o_totalprice").limit(10))


def test_fact_scaled_broadcast_flagged(spark, sf_dir):
    """The rule fires on exactly the r8 regressions (forced broadcast of an
    SF-scaled relation) and stays silent on every bounded-by-construction
    hint and on planner-chosen broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    # the pre-fix q203 shape: explicit hint on a fact-scaled dim
    bad = li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
    assert "fact-scaled-broadcast" in _rules(bad)
    # the pre-fix q201 shape: explicit hint on a fact-derived grouped agg
    marg = li.groupBy("l_partkey").agg(F.count("*").alias("n"))
    bad2 = li.join(F.broadcast(marg), "l_partkey")
    assert "fact-scaled-broadcast" in _rules(bad2)
    # un-hinted: AQE owns the choice — never flagged
    assert "fact-scaled-broadcast" not in _rules(
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
    )
    # constant-cardinality dims (nation=25 rows at every SF): exempt
    assert "fact-scaled-broadcast" not in _rules(
        li.join(F.broadcast(n), li["l_suppkey"] == n["n_nationkey"])
    )
    # scalar aggregate / limit on the build spine: bounded by construction
    assert "fact-scaled-broadcast" not in _rules(
        li.crossJoin(F.broadcast(li.agg(F.count("*").alias("c"))))
    )
    assert "fact-scaled-broadcast" not in _rules(
        li.join(F.broadcast(s.limit(5)), li["l_suppkey"] == s["s_suppkey"])
    )


def test_band_join_flagged(spark, sf_dir):
    """The rule fires on the pre-fix q207 shape (shuffled join whose band
    residual is evaluated per matched pair) and stays silent on the
    neighbor-offset equi-join rewrite that computes the same pairs."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), F.col("l_linenumber").alias("rn")
    )
    a = li.select("k", F.col("rn").alias("ra"))
    b = li.select("k", F.col("rn").alias("rb"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        band = a.join(b, "k").filter(
            (F.col("rb") > F.col("ra")) & (F.col("rb") <= F.col("ra") + 2)
        )
        assert "band-join" in _rules(band)
        # offset rewrite: the band is part of the equi-key — clean
        off = (
            a.withColumn("off", F.explode(F.array(F.lit(1), F.lit(2))))
            .withColumn("rb", F.col("ra") + F.col("off"))
            .join(b, ["k", "rb"])
        )
        assert "band-join" not in _rules(off)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bounded_key_window_flagged(spark, sf_dir):
    """The rule fires on the pre-fix q217/q222 shape (window partitioned
    only by a bounded-domain key over a fact table — one sort task owns
    ~corpus/|domain| rows) and stays silent on every genuinely bounded or
    fact-keyed window."""
    e = load_table(spark, sf_dir, "events")
    d = load_table(spark, sf_dir, "documents")
    # the hostile shape: rank all events within each of ~5 event types
    w_bad = Window.partitionBy("event_type").orderBy("value", "event_id")
    assert "bounded-key-window" in _rules(
        e.withColumn("r", F.row_number().over(w_bad))
    )
    # fact-scaled partition key: partitions stay small, clean
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    assert "bounded-key-window" not in _rules(
        e.withColumn("r", F.row_number().over(w_user))
    )
    # mixed key including a non-bounded column (tie-block window): clean
    w_tie = Window.partitionBy("source", "n_chars").orderBy("doc_id")
    assert "bounded-key-window" not in _rules(
        d.withColumn("r", F.row_number().over(w_tie))
    )
    # bounded input: grouped by (bounded domain x calendar bucket) —
    # |types| x |days| rows, alias-through-Aggregate resolved
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    w_daily = Window.partitionBy("event_type").orderBy("day")
    assert "bounded-key-window" not in _rules(
        daily.withColumn("r", F.row_number().over(w_daily))
    )
    # bounded input: explicit limit
    assert "bounded-key-window" not in _rules(
        e.limit(100).withColumn("r", F.row_number().over(w_bad))
    )
    # NOT bounded: grouped by (bounded domain x fact key) — per-user
    # totals scale with the corpus even though the window key is bounded
    per_user = e.groupBy("event_type", "user_id").agg(F.sum("value").alias("x"))
    w_gini = Window.partitionBy("event_type").orderBy("x", "user_id")
    assert "bounded-key-window" in _rules(
        per_user.withColumn("r", F.row_number().over(w_gini))
    )


def test_per_key_topk_matches_window_spelling(spark, sf_dir):
    """sampling.per_key_topk (salted pre-trim + bounded merge) returns
    row-for-row what the naive bounded-key window returns, including the
    rank column — while its own plan carries no bounded-key-window."""
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.sampling import (
        per_key_topk,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "user_id", "value"
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    naive = (
        e.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 7)
        .select("event_type", "event_id", "user_id", "value", "rank")
    )
    fast = per_key_topk(
        e, ["event_type"], ["value", "event_id"], 7, n_salts=5, rank_col="rank"
    ).select("event_type", "event_id", "user_id", "value", "rank")
    assert naive.exceptAll(fast).count() == 0
    assert fast.exceptAll(naive).count() == 0
    assert "bounded-key-window" not in _rules(fast)
    # keys with fewer than k rows keep everything (k > group size)
    few = per_key_topk(
        e.limit(3), ["event_type"], ["value", "event_id"], 100, rank_col="rank"
    )
    assert few.count() == 3


def test_assert_scalable_contract(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    bad = a.crossJoin(b)  # compiles to BNLJ at this size
    with pytest.raises(AssertionError, match="nested-loop-join"):
        assert_scalable(bad)
    allowed = assert_scalable(bad, allow={"nested-loop-join"})
    assert [f["rule"] for f in allowed] == ["nested-loop-join"]
    assert assert_scalable(a.join(b, a.id == b.id2)) == []


def test_headline_queries_lint_clean(spark, sf_dir):
    """The bench's production-path queries carry no scale-hostile plan
    shapes at all — the generic linter agrees with the per-query plan
    audits in tests/test_plans.py."""
    from etl_pipeline_for_elasticsearch_json_document_spark.queries import all_queries

    q = all_queries()
    # q113's corpus stats are a broadcast 1-ROW aggregate crossJoined onto
    # the postings — a BNLJ by plan shape, bounded by contract (the
    # documented broadcast-scalar pattern). The decontamination family and
    # q113's query-term postings broadcast contract-bounded probe/vocab
    # relations scanned from fact tables — the fact-scaled-broadcast rule
    # flags them by design; the contracts are documented in
    # tests/test_plan_lint_all.py's ALLOWANCES. Everything else is clean.
    allowances = {
        "q113_bm25_topk": {"nested-loop-join", "fact-scaled-broadcast"},
        "q100_decontaminate": {"fact-scaled-broadcast"},
        "q110_fuzzy_decontaminate": {"fact-scaled-broadcast"},
    }
    for name in (
        "q01_pricing_summary",
        "q03_revenue_topn",
        "q26_asof_join",
        "q30_dedup_exact",
        "q32_minhash_lsh",
        "q77_latest_by_key",
        "q100_decontaminate",
        "q110_fuzzy_decontaminate",
        "q113_bm25_topk",
    ):
        assert_scalable(q[name].fn(spark, sf_dir), allow=allowances.get(name, set()))
