"""Python UDTF tests: PathEnumerator lateral-view path discovery agrees
with the plan-time flatten on names and stringified values."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.functions.udtf import PathEnumerator
from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import flatten

DOC = {
    "claimRequestId": 123,
    "approved": True,
    "note": None,
    "amounts": [2250.0],
    "lines": [
        {"lineNumber": 1, "charge": 100.5},
        {"lineNumber": 2, "charge": 200.0},
    ],
}


def test_path_enumerator_lateral(spark):
    spark.udtf.register("enumerate_paths", PathEnumerator)
    docs = spark.createDataFrame([(1, json.dumps(DOC))], "id int, j string")
    docs.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        "SELECT id, p.path, p.value FROM udtf_docs, LATERAL enumerate_paths(j) p"
    )
    got = {(r.path, r.value) for r in out.collect()}
    assert ("ClaimRequestId", "123") in got
    assert ("Approved", "True") in got
    assert ("Note", "") in got
    assert ("Amounts", "[2250.0]") in got
    assert ("Lines_0_Charge", "100.5") in got
    assert ("Lines_1_LineNumber", "2") in got


def test_path_enumerator_matches_flatten_names(spark):
    """The UDTF's discovered path set equals the plan-time flatten's
    column set on the same document."""
    docs = spark.createDataFrame([(json.dumps(DOC),)], "j string")
    spark.udtf.register("enumerate_paths", PathEnumerator)
    docs.createOrReplaceTempView("udtf_docs2")
    udtf_paths = {
        r.path
        for r in spark.sql(
            "SELECT p.path FROM udtf_docs2, LATERAL enumerate_paths(j) p"
        ).collect()
    }
    typed = spark.read.json(spark.createDataFrame([(json.dumps(DOC),)], "v string").rdd.map(lambda r: r.v))
    flat_cols = set(flatten(typed).columns)
    assert udtf_paths == flat_cols
