"""Malformed-input handling for JSON ingestion: parse/quarantine split.

The reference pipeline assumes every fetched document parses
(``ElasticSearch ETL.py`` feeds ``res['hits']['hits']`` straight into
its row loop — one malformed payload kills the whole export). Real
crawled/bulk-exported NDJSON always carries some broken lines; at scale
the correct contract is: parse what parses, capture what doesn't
BYTE-EXACTLY into a dead-letter location, and never abort the job.

This module wraps Spark's three JSON parse modes into that contract:

- ``read_json_split``: PERMISSIVE parse with an explicit corrupt-record
  column; returns ``(good, bad)`` DataFrames — ``bad`` holds the raw
  un-parsed line so the quarantine is replayable after a parser fix.
- ``read_json_strict``: FAILFAST — the assert-clean mode for curated
  inputs where a malformed line means upstream corruption.
- ``quarantine_json``: the ETL wrapper — writes the bad raw lines to a
  dead-letter directory and returns only the good rows.

Spark quirk handled here: a query that references ONLY the internal
corrupt-record column is rejected by the parser ("referenced columns
only include the internal corrupt record column"), so the split caches
the parsed relation before filtering. At 100 TB that cache is the
correct plan anyway — one parse pass feeding both the good-path write
and the dead-letter write, instead of re-parsing the corpus twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _schema_with_corrupt(schema: StructType | str, spark: SparkSession) -> StructType:
    if isinstance(schema, str):
        schema = spark.createDataFrame([], schema).schema
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def read_json_split(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    multi_line: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE parse of ``path``: returns ``(good, bad)``.

    ``good`` carries exactly the caller's schema; ``bad`` is one column
    ``raw`` holding each malformed line verbatim (replayable). The parsed
    relation is cached: both halves come from ONE parse pass, and
    filtering on the corrupt column alone is legal against a cached plan.
    """
    full = (
        spark.read.schema(_schema_with_corrupt(schema, spark))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", multi_line)
        .json(path)
    ).cache()
    good_cols = [c for c in full.columns if c != CORRUPT_COL]
    good = full.filter(F.col(CORRUPT_COL).isNull()).select(*good_cols)
    bad = full.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, bad


def read_json_strict(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """FAILFAST read: any malformed line raises at action time."""
    return (
        spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    )


def read_json_drop(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """DROPMALFORMED read: silently discards broken lines (use only when
    the loss is acceptable AND unmeasured — prefer read_json_split)."""
    return (
        spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
    )


def quarantine_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    dead_letter_path: str,
) -> DataFrame:
    """Parse ``path``; write malformed raw lines to ``dead_letter_path``
    (text format — byte-exact replay) and return the good rows. The bad
    write happens eagerly so a downstream failure cannot lose the
    quarantine; good rows stay lazy for the caller's plan."""
    good, bad = read_json_split(spark, path, schema)
    bad.write.mode("append").text(dead_letter_path)
    return good
