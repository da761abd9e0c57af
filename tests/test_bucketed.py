"""Bucketed-layout contract: writing two tables bucketed on the join key
pre-pays the shuffle — the join plan carries NO Exchange on either side,
and results are identical to the plain (shuffling) join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.operators.layout import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(
        orders, "t_orders_b", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=str(base / "orders"),
    )
    write_bucketed(
        lineitem, "t_lineitem_b", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"], path=str(base / "lineitem"),
    )
    yield "t_orders_b", "t_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def _joined(spark, bucketed_tables):
    to, tl = bucketed_tables
    return (
        spark.table(to)
        .join(spark.table(tl), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            _joined(spark, bucketed_tables)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert "SelectedBucketsCount" in plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = {tuple(r) for r in _joined(spark, bucketed_tables).collect()}
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want = {
        tuple(r)
        for r in orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        )
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    assert got == want


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    to, _ = bucketed_tables
    plan = (
        spark.table(to)
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
