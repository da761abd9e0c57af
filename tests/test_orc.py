"""ORC as an alternate columnar source/sink: write/read parity vs the
parquet original, predicate pushdown and column pruning reaching the ORC
scan, and partitioned layout with partition pruning.

The reference exports TSV only (`ElasticSearch ETL.py:170-199`); a
100 TB lake needs an interchange columnar format besides parquet — ORC is
the one Spark ships a native vectorized reader for with zero extra jars.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.sources.tables import load_table


def test_orc_roundtrip_parity(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    path = str(tmp_path / "lineitem_orc")
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == li.schema
    assert back.count() == li.count()
    # value parity via order-insensitive aggregate signature
    def sig(df):
        return df.agg(
            F.sum("l_quantity").alias("q"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("p"),
            F.sum(
                F.xxhash64("l_orderkey", "l_partkey", "l_returnflag").cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]

    assert sig(back) == sig(li)


def test_orc_scan_pushes_filters_and_prunes_columns(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_orc")
    li.write.mode("overwrite").orc(path)
    q = (
        spark.read.orc(path)
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_quantity")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]
    # pruned read schema: only the two referenced columns reach the scan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema


def test_orc_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    path = str(tmp_path / "li_orc_part")
    li.write.mode("overwrite").partitionBy("l_returnflag").orc(path)
    q = spark.read.orc(path).filter(F.col("l_returnflag") == "R")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition filter applied at planning: non-matching dirs never read
    assert "PartitionFilters: [" in plan
    assert plan.split("PartitionFilters")[1][:200].count("l_returnflag") >= 1
    expect = li.filter(F.col("l_returnflag") == "R").count()
    assert q.count() == expect


def test_avro_roundtrip_where_deployed(spark, tmp_path):
    """spark-avro is an EXTERNAL module (not in the pyspark wheel); this
    container has no jar, so the write raises and the test documents the
    gate — where the jar is deployed the roundtrip parity runs."""
    import pytest
    from pyspark.sql import functions as F

    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    path = str(tmp_path / "avro")
    try:
        df.write.mode("overwrite").format("avro").save(path)
    except Exception as e:
        assert "Failed to find data source: avro" in str(e)
        pytest.skip("spark-avro jar not deployed in this container (external module)")
    back = spark.read.format("avro").load(path)
    assert back.count() == 10
    assert sorted(r["v"] for r in back.collect()) == [i * 2 for i in range(10)]
