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


def test_compact_recovers_from_stale_dirs_and_nested_batches(spark, tmp_path):
    """Crash-safety + layout: leftover .__compact__/.__old__ dirs from a
    crashed run must not break a retry, and nested per-batch subdirs (the
    streaming export layout) must be read recursively."""
    path = str(tmp_path / "frag3")
    for b in ("batch=0", "batch=1"):  # nested leaf dirs, 1000 rows each
        (
            spark.range(1000)
            .select(F.col("id"), F.sha1(F.col("id").cast("string")).alias("payload"))
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(os.path.join(path, b))
        )
    # simulate debris from a previous crashed attempt
    os.makedirs(path + ".__compact__/junk", exist_ok=True)
    os.makedirs(path + ".__old__", exist_ok=True)
    compact_dir(spark, path, target_mb=128)
    assert not os.path.exists(path + ".__compact__")
    assert not os.path.exists(path + ".__old__")
    after = spark.read.parquet(path)
    assert after.count() == 2000
    assert all(not f.startswith("batch=") for f in os.listdir(path))


def test_compact_restores_backup_when_crash_left_no_live_dir(spark, tmp_path):
    """A crash between the two renames leaves data only at .__old__; the
    next run must restore it and complete."""
    path = str(tmp_path / "frag4")
    _write_fragmented(spark, path, n_rows=500, n_files=4)
    os.rename(path, path + ".__old__")  # mid-swap crash state
    compact_dir(spark, path, target_mb=128)
    assert spark.read.parquet(path).count() == 500


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


def test_backfill_overwrites_only_named_partitions(spark, tmp_path):
    """Dynamic-overwrite backfill: restating one day replaces exactly that
    day's partition; all other partitions stay byte-identical (same files,
    same mtimes) — the idempotent-restatement contract."""
    import glob
    import os

    from pyspark.sql import functions as F

    from etl_pipeline_for_elasticsearch_json_document_spark.sinks.backfill import (
        backfill_partitions,
        write_partitioned,
    )

    path = str(tmp_path / "days")
    full = spark.createDataFrame(
        [(d, i, float(i)) for d in ("2024-01-01", "2024-01-02", "2024-01-03") for i in range(5)],
        "day string, k int, v double",
    )
    write_partitioned(full, path, ["day"])

    def snapshot(day):
        return {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(path, f"day={day}", "*.parquet"))
        }

    before_d1, before_d3 = snapshot("2024-01-01"), snapshot("2024-01-03")

    restated = spark.createDataFrame(
        [("2024-01-02", i, float(i) * 10) for i in range(3)], "day string, k int, v double"
    )
    backfill_partitions(restated, path, ["day"])

    back = spark.read.parquet(path)
    assert back.filter("day = '2024-01-02'").count() == 3  # replaced, not appended
    assert back.filter("day = '2024-01-02'").agg(F.max("v")).first()[0] == 20.0
    assert back.filter("day != '2024-01-02'").count() == 10  # untouched rows
    assert snapshot("2024-01-01") == before_d1  # same files, same mtimes
    assert snapshot("2024-01-03") == before_d3
    # idempotent: re-running the same backfill converges to the same state
    backfill_partitions(restated, path, ["day"])
    assert spark.read.parquet(path).filter("day = '2024-01-02'").count() == 3
