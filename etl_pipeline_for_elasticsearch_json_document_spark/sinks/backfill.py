"""Idempotent partition backfill: restate a slice of a partitioned output
without touching the rest.

The 100 TB warehouse pattern the reference's per-batch TSV files cannot
express: outputs are partitioned (by day/source), and reprocessing a date
range must replace EXACTLY the partitions the new data covers —
`partitionOverwriteMode=dynamic` makes the overwrite scoped to partitions
present in the written DataFrame instead of truncating the whole table, so
backfills are idempotent (re-running a day converges to the same state)
and concurrent-reader-safe at the partition level.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def write_partitioned(df: DataFrame, path: str, partition_cols: Sequence[str]) -> None:
    """Initial full write of a partitioned parquet output."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def backfill_partitions(df: DataFrame, path: str, partition_cols: Sequence[str]) -> None:
    """Overwrite ONLY the partitions present in ``df`` (dynamic overwrite);
    every other partition of ``path`` is left byte-identical. Re-running
    the same backfill is a no-op state-wise (idempotent restatement)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
