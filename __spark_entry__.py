"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in
``etl_pipeline_for_elasticsearch_json_document_spark.queries`` (one entry
per operator from SURVEY.md §2); this module just adapts the registry to
the driver's interface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_pipeline_for_elasticsearch_json_document_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the engine's signature
    operation — flatten semi-structured events (JSON props) into the
    reference's wide all-string shape, executed as one Catalyst select."""
    from etl_pipeline_for_elasticsearch_json_document_spark.queries.registry import REGISTRY

    all_queries()
    return REGISTRY["q70_flatten_events"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in sorted(all_queries().items()) if q.oracle}
