"""Small-file compaction: many batch dirs -> few right-sized files, same
rows; ordered compaction keeps files range-clustered."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.sinks.compact import compact_dir


def _write_fragmented(spark, path, n_rows=20_000, n_files=64):
    (
        spark.range(n_rows)
        .select(
            F.col("id"),
            (F.col("id") % 97).alias("k"),
            F.sha1(F.col("id").cast("string")).alias("payload"),
        )
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(path)
    )


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    _write_fragmented(spark, path)
    before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert before >= 32
    n = compact_dir(spark, path, target_mb=128)
    assert n < before
    after = spark.read.parquet(path)
    assert after.count() == 20_000
    assert after.agg(F.sum("id")).first()[0] == 20_000 * 19_999 // 2


def test_compact_ordered_keeps_clustering(spark, tmp_path):
    path = str(tmp_path / "frag2")
    _write_fragmented(spark, path)
    compact_dir(spark, path, order_by=["k", "id"])
    df = spark.read.parquet(path)
    assert df.count() == 20_000
    # every output file covers a disjoint k-range (range partitioning), so
    # per-file min/max stay tight for range-pruned scans
    per_file = (
        df.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2
