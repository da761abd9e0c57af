"""Testdata table loaders (TESTDATA.md): one parquet per table.

Parquet is the engine's canonical batch source — columnar scans give free
column pruning and predicate pushdown (check ``.explain`` for
``PushedFilters`` / ``ReadSchema``). At 100 TB these tables would be
partitioned (e.g. orders/lineitem by date) and the same loaders apply.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize ts to TIMESTAMP(LTZ) whatever the parquet physical type:
        # TIMESTAMP(NANOS) reads as long nanos (truncate — the synthetic data
        # has no sub-microsecond component); TIMESTAMP(MICROS, NTZ) reads as
        # TIMESTAMP_NTZ (reinterpret wall time in the session's UTC, matching
        # DuckDB's naive-timestamp semantics). Downstream operators can then
        # rely on unix_micros()/window() without per-file type dispatch.
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.to_timestamp("ts"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register each table as a temp view (for the spark.sql query surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name + suffix)
