"""Batch export job (reference E1) + keyset pagination + A23 column tools."""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.functions.columns import (
    columns_containing,
    select_columns_containing,
    transpose_preview,
)
from etl_pipeline_for_elasticsearch_json_document_spark.jobs import fetch_and_export_documents
from etl_pipeline_for_elasticsearch_json_document_spark.sinks.audit import AuditLog
from etl_pipeline_for_elasticsearch_json_document_spark.sources.keyset import Cursor, paginate
from etl_pipeline_for_elasticsearch_json_document_spark.sources.tables import load_table


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="etl_jobs_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_keyset_pagination_covers_everything_once(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    seen = []
    for page, cursor in paginate(events, ["ts", "event_id"], 300):
        ids = [r["event_id"] for r in page.select("event_id").collect()]
        seen.extend(ids)
        assert len(ids) <= 300
    assert len(seen) == events.count()
    assert len(set(seen)) == len(seen)  # no page overlap


def test_keyset_resume_from_cursor(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    pages = paginate(events, ["ts", "event_id"], 400)
    _, c1 = next(pages)
    resumed = list(paginate(events, ["ts", "event_id"], 400, start=c1))
    n_after = sum(p.count() for p, _ in resumed)
    assert n_after == events.count() - 400


def test_batch_export_job(spark, tmpdir):
    docs = [
        {
            "claimRequestId": i,
            "auditProcessedDateTimeUtc": f"2025-06-01T11:30:{i:02d}Z",
            "lines": [{"lineNumber": 1, "charge": float(i)}],
        }
        for i in range(25)
    ]
    src = spark.read.json(spark.sparkContext.parallelize([json.dumps(d) for d in docs]))
    out = os.path.join(tmpdir, "out")
    exported = fetch_and_export_documents(
        spark,
        src,
        out,
        audit_path=os.path.join(tmpdir, "audit"),
        batch_size=10,
    )
    assert exported == 25
    batches = glob.glob(os.path.join(out, "rta_claim_headers_*"))
    assert len(batches) == 3  # 10 + 10 + 5
    total = sum(
        spark.read.option("sep", "\t").option("header", True).csv(b).count() for b in batches
    )
    assert total == 25
    audit = AuditLog(spark, os.path.join(tmpdir, "audit")).read().collect()
    assert [r["job_status"] for r in audit] == ["SUCCESS"]
    assert audit[0]["record_count_loaded"] == 25


def test_batch_export_failure_audit(spark, tmpdir):
    src = load_table(spark, "/root/testdata/sf0.001", "events")
    with pytest.raises(Exception):
        fetch_and_export_documents(
            spark,
            src,
            os.path.join(tmpdir, "out"),
            audit_path=os.path.join(tmpdir, "audit"),
            sort_cols=("no_such_column", "event_id"),  # forces failure
        )
    audit = AuditLog(spark, os.path.join(tmpdir, "audit")).read().collect()
    assert [r["job_status"] for r in audit] == ["FAILED"]
    assert audit[0]["record_count_loaded"] is None  # omitted on failure (A20)
    assert "no_such_column" in audit[0]["error_desc"]


def test_column_search_a23(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, "x")], "Lines_0_BasePrice double, Lines_0_FinalPrice double, Name string"
    )
    assert columns_containing(df, "Price") == ["Lines_0_BasePrice", "Lines_0_FinalPrice"]
    assert select_columns_containing(df, "Price").columns == [
        "Lines_0_BasePrice",
        "Lines_0_FinalPrice",
    ]
    t = transpose_preview(df, n_cols=2)
    assert list(t.index) == ["Lines_0_BasePrice", "Lines_0_FinalPrice"]


def test_es_source_stub_gating(spark):
    from etl_pipeline_for_elasticsearch_json_document_spark.sources import elasticsearch as es

    assert not es.HAS_ES_CLIENT  # not installed here
    with pytest.raises(NotImplementedError, match="not installed"):
        next(es.scan_with_client(spark, "idx", {"query": {}}))
    # tier 1 works everywhere: the golden envelope
    df = es.read_search_response_json(spark, "/root/reference/ElasticSearch_Document.json")
    assert df.count() == 1 and "claimRequestId" in df.columns


@pytest.mark.slow
def test_cli_main_exports_golden_doc(tmp_path, capsys):
    """`python -m etl_pipeline_for_elasticsearch_json_document_spark IN OUT`
    — the reference's script entry point (E1): envelope in, per-batch TSV +
    audit out."""
    import glob

    from etl_pipeline_for_elasticsearch_json_document_spark.__main__ import main

    out = str(tmp_path / "cli_out")
    rc = main(["/root/reference/ElasticSearch_Document.json", out, "--bug-compat"])
    assert rc == 0
    assert "exported 1 documents" in capsys.readouterr().out
    tsvs = glob.glob(f"{out}/rta_claim_headers_*/*.csv")
    assert len(tsvs) == 1
    import pandas as pd

    df = pd.read_csv(tsvs[0], sep="\t")
    assert df.shape == (1, 5028)


def test_cli_main_reads_jsonl_fully(tmp_path, capsys):
    """JSONL input must export EVERY record — multiLine-first reading
    silently parsed only the first object of a JSONL file."""
    import json as _json

    from etl_pipeline_for_elasticsearch_json_document_spark.__main__ import main

    src = tmp_path / "docs.jsonl"
    with open(src, "w") as f:
        for i in range(5):
            f.write(_json.dumps({"claimRequestId": i, "v": f"x{i}"}) + "\n")
    rc = main([str(src), str(tmp_path / "out")])
    assert rc == 0
    assert "exported 5 documents" in capsys.readouterr().out


@pytest.mark.slow
def test_audit_jdbc_tier_round_trip(spark, tmpdir):
    """The reference's actual audit target is an RDBMS (log_to_sql_db,
    ElasticSearch ETL.py:271-299): the JDBC tier appends SUCCESS and
    FAILED rows through spark.write.jdbc and reads them back — exercised
    for real against Spark's bundled embedded-Derby driver, no installs."""
    import datetime

    from etl_pipeline_for_elasticsearch_json_document_spark.sinks.audit import (
        DERBY_DRIVER,
        AuditLog,
    )

    url = f"jdbc:derby:{tmpdir}/audit_db;create=true"
    audit = AuditLog(spark, jdbc_url=url, jdbc_driver=DERBY_DRIVER)
    t0 = datetime.datetime.now(datetime.timezone.utc)
    audit.success(t0, batch_id="b1", record_count=42)
    audit.failure(t0, batch_id="b2", error=RuntimeError("boom"))
    rows = {r["batch_id"]: r for r in audit.read().collect()}
    assert rows["b1"]["job_status"] == "SUCCESS"
    assert rows["b1"]["record_count_loaded"] == 42
    # failure rows omit the count, like the reference's except path
    assert rows["b2"]["job_status"] == "FAILED"
    assert rows["b2"]["record_count_loaded"] is None
    assert "boom" in rows["b2"]["error_desc"]


def test_audit_requires_exactly_one_storage_tier(spark):
    import pytest as _pytest

    from etl_pipeline_for_elasticsearch_json_document_spark.sinks.audit import AuditLog

    with _pytest.raises(ValueError, match="exactly one"):
        AuditLog(spark)
    with _pytest.raises(ValueError, match="exactly one"):
        AuditLog(spark, path="/tmp/x", jdbc_url="jdbc:derby:y")
