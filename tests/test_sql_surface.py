"""The spark.sql text surface: a reference user who works in SQL (not the
DataFrame API) gets the same engine. register_views exposes every testdata
table; representative queries written as ANSI-ish Spark SQL must produce
exactly the DataFrame registry's results. Also covers sink format breadth
(ORC/JSON round-trips alongside the TSV/parquet paths tested elsewhere)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.queries import all_queries
from etl_pipeline_for_elasticsearch_json_document_spark.sources.tables import (
    load_table,
    register_views,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def views(spark):
    register_views(spark, SF_DIR)
    return spark


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_sql_aggregation_matches_dataframe(views, spark):
    sql = views.sql("""
        SELECT l_returnflag, l_linestatus,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """)
    df = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double"), 2).alias(
                "sum_qty"
            ),
            F.count("*").alias("count_order"),
        )
    )
    assert _rows(sql) == _rows(df)


def test_sql_join_window_matches_dataframe(views, spark):
    sql = views.sql("""
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders WHERE o_custkey < 50
    """).filter("rn <= 2")
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    df = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_custkey") < 50)
        .select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 2)
    )
    assert _rows(sql) == _rows(df)


def test_sql_lateral_explode_matches_registry_query(views, spark):
    """The LLM-surface ops are reachable from SQL too: sentence-segment
    dedup written as plain Spark SQL equals the registry's q38 plan."""
    sql = views.sql("""
        WITH segs AS (
          SELECT doc_id,
                 explode(transform(sequence(0, CAST(ceil(size(split(text, ' ')) / 12.0) AS INT) - 1),
                         i -> array_join(slice(split(text, ' '), i * 12 + 1, 12), ' '))) AS raw
          FROM documents
        ),
        f AS (SELECT doc_id, md5(trim(lower(raw))) AS fp
              FROM segs WHERE length(trim(lower(raw))) > 20)
        SELECT fp, count(*) AS n, min(doc_id) AS first_doc
        FROM f GROUP BY fp HAVING count(*) > 1
    """)
    df = all_queries()["q38_sentence_dedup"].fn(spark, SF_DIR)
    assert _rows(sql) == _rows(df)


def test_orc_round_trip(spark, tmp_path):
    src = load_table(spark, SF_DIR, "nation")
    p = str(tmp_path / "nation_orc")
    src.write.mode("overwrite").orc(p)
    back = spark.read.orc(p)
    assert _rows(back) == _rows(src)


def test_json_round_trip_preserves_nested(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": [1, 2]}), (2, {"a": 3, "b": []})],
        "id long, payload struct<a:long, b:array<long>>",
    )
    p = str(tmp_path / "nested_json")
    df.write.mode("overwrite").json(p)
    back = spark.read.json(p).select("id", "payload")
    assert _rows(back) == _rows(df)


def test_sql_group_by_all_order_by_all(views, spark):
    """GROUP BY ALL / ORDER BY ALL (Spark 3.4+ sugar) resolve to exactly
    the explicit forms."""
    sugar = spark.sql(
        """SELECT lang, source, count(*) AS n, sum(n_chars) AS chars
           FROM documents GROUP BY ALL ORDER BY ALL"""
    )
    explicit = spark.sql(
        """SELECT lang, source, count(*) AS n, sum(n_chars) AS chars
           FROM documents GROUP BY lang, source ORDER BY lang, source, n, chars"""
    )
    assert [tuple(r) for r in sugar.collect()] == [
        tuple(r) for r in explicit.collect()
    ]


def test_sql_broadcast_hint_shapes_the_join(views, spark):
    """A /*+ BROADCAST */ hint in SQL text reaches the physical plan."""
    df = spark.sql(
        """SELECT /*+ BROADCAST(n) */ n.n_name, count(*) AS n_cust
           FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY n.n_name"""
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert df.count() > 0


def test_sql_tablesample_repeatable_is_deterministic(views, spark):
    """TABLESAMPLE ... REPEATABLE(seed): same seed, same sample — and the
    sample is a genuine subset of the table."""
    q = (
        "SELECT doc_id FROM documents "
        "TABLESAMPLE (20 PERCENT) REPEATABLE (42)"
    )
    a = {r["doc_id"] for r in spark.sql(q).collect()}
    b = {r["doc_id"] for r in spark.sql(q).collect()}
    assert a == b
    total = spark.table("documents").count()
    assert 0 < len(a) < total
    all_ids = {r["doc_id"] for r in spark.table("documents").select("doc_id").collect()}
    assert a <= all_ids


def test_sql_distribute_by_partitions_and_sort_by_orders(views, spark):
    """DISTRIBUTE BY co-locates keys (one partition per key's rows);
    SORT BY orders within partitions without a global sort."""
    df = spark.sql(
        "SELECT lang, doc_id FROM documents DISTRIBUTE BY lang SORT BY doc_id"
    )
    # each lang's rows land in exactly one partition
    from pyspark.sql.functions import spark_partition_id

    per = (
        df.withColumn("pid", spark_partition_id())
        .groupBy("lang")
        .agg(F.countDistinct("pid").alias("np"))
        .collect()
    )
    assert all(r["np"] == 1 for r in per)
    # and within each partition doc_id is non-decreasing
    def check(it):
        last = None
        for row in it:
            assert last is None or row.doc_id >= last
            last = row.doc_id
        yield
    list(df.rdd.mapPartitions(lambda it: check(it)).collect())
    # no global Sort: the plan must not contain a range-partitioned exchange
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
