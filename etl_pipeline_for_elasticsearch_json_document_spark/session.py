"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]``; the config block is written for a real
multi-executor cluster: AQE handles skew/coalescing at runtime, Arrow makes
the few Pandas-UDF paths cheap, and shuffle partitions are sized for the
test scale (override ``spark.sql.shuffle.partitions`` upward on a cluster —
rule of thumb: 2-3× total cores, or rely on AQE coalescing from a high
initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "etl-pipeline-spark", master: str | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPARK_DRIVER_MEMORY", "12g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # Runtime re-planning: coalesce tiny shuffle partitions, split skewed
        # ones, switch sort-merge→broadcast when a side turns out small.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        # Arrow for the (rare) Pandas-UDF paths and toPandas previews.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The flatten operator emits 5k+ column selects; keep codegen from
        # giving up silently and cache more generated classes.
        .config("spark.sql.codegen.cache.maxEntries", "200")
        .config("spark.sql.session.timeZone", "UTC")
        # The events table carries TIMESTAMP(NANOS) parquet, which Spark
        # cannot read natively; read as long and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", mem)
        # Pin and pre-touch the heap: a large lazily-committed heap leaves
        # most pages cold, and kernels running proactive reclaim (DAMON /
        # memory compaction) evict them between stages — refault storms then
        # show up as 70%+ system time and 10× run-to-run variance on wide
        # projections. A right-sized, pre-touched heap stays resident.
        .config("spark.driver.extraJavaOptions", f"-Xms{mem} -XX:+AlwaysPreTouch")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
