"""Continuous ES tailing (`es_tail` streaming source): micro-batches
advance the reference's search_after cursor exactly-once across separate
stream runs sharing a checkpoint, and crash replay via
readBetweenOffsets is byte-deterministic.

Reference contract: the batch export loop `ElasticSearch ETL.py:220-267`
(count → search_after pages → exit) — here kept always-on, with the
page cursor as the Spark streaming offset.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.sinks import elasticsearch as es_sink
from etl_pipeline_for_elasticsearch_json_document_spark.sources.es_stream import (
    EsTailDataSource,
    EsTailStreamReader,
)

from tests.fake_es import start_fake_es


@pytest.fixture()
def fake_es():
    server, base_url = start_fake_es()
    yield base_url
    server.shutdown()
    server.server_close()


def _bulk_docs(spark, fake_es, tmp_path, index, lo, hi, tag):
    docs = spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(f"{tag}-"), F.col("id").cast("string")).alias("payload"),
    )
    out = str(tmp_path / f"bulk_{tag}")
    es_sink.write_bulk_files(docs.coalesce(1), out, index, id_col="doc_id")
    es_sink.replay_bulk_files(out, fake_es)
    return docs


def _run_drain(spark, fake_es, index, sink, ckpt):
    q = (
        spark.readStream.format("es_tail")
        .option("url", fake_es)
        .option("index", index)
        .option("sort", "doc_id")
        .option("page_size", "16")  # several pages per batch
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination(timeout) RETURNS False on timeout (it does not
    # raise); proceeding then reads a partial sink and fails with a
    # confusing AnalysisException. Budget generously — a loaded machine
    # (parallel Spark JVMs) can stretch the drain well past 120 s.
    if not q.awaitTermination(600):
        q.stop()
        raise AssertionError("availableNow drain did not finish in 600 s")


def test_tail_reads_all_then_only_new(spark, fake_es, tmp_path):
    """Run 1 drains the initial corpus; docs added between runs; run 2 on
    the SAME checkpoint picks up exactly the new ones — no re-read, no
    gap (the cursor survives in the offset log, not in this process)."""
    spark.dataSource.register(EsTailDataSource)
    index = "tail_docs"
    _bulk_docs(spark, fake_es, tmp_path, index, 0, 53, "first")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    _run_drain(spark, fake_es, index, sink, ckpt)
    got1 = spark.read.parquet(sink)
    assert got1.count() == 53
    _bulk_docs(spark, fake_es, tmp_path, index, 100, 130, "second")
    _run_drain(spark, fake_es, index, sink, ckpt)
    got2 = spark.read.parquet(sink)
    assert got2.count() == 53 + 30
    ids = sorted(int(r["_id"]) for r in got2.select("_id").collect())
    assert ids == list(range(0, 53)) + list(range(100, 130))
    # payloads intact end-to-end
    second = got2.filter(F.get_json_object("source_json", "$.payload") == "second-100")
    assert second.count() == 1


def test_read_between_offsets_replays_identically(fake_es, tmp_path, spark):
    """Crash-replay determinism: readBetweenOffsets(start, end) returns
    exactly the rows read() emitted for that committed interval."""
    index = "replay_docs"
    _bulk_docs(spark, fake_es, tmp_path, index, 0, 40, "r")
    reader = EsTailStreamReader(
        {"url": fake_es, "index": index, "sort": "doc_id", "page_size": "7"}
    )
    start = reader.initialOffset()
    rows, end = reader.read(start)
    rows = list(rows)
    assert len(rows) == 40
    assert json.loads(end["after"]) == [39]
    replay = list(reader.readBetweenOffsets(start, end))
    assert replay == rows
    # a later batch replays only its own half-open interval
    mid = {"after": json.dumps([19])}
    tail = list(reader.readBetweenOffsets(mid, end))
    assert [json.loads(r[2]) for r in tail] == [[i] for i in range(20, 40)]
    # empty catch-up: read at the tip returns the same offset unchanged
    rows2, end2 = reader.read(end)
    assert list(rows2) == [] and end2 == end


def test_max_docs_per_batch_bounds_batch(fake_es, tmp_path, spark):
    """A huge backlog cannot build one boundless micro-batch: the cap
    cuts the batch at a page boundary and the NEXT batch resumes from
    the cut, losing nothing."""
    index = "cap_docs"
    _bulk_docs(spark, fake_es, tmp_path, index, 0, 60, "c")
    reader = EsTailStreamReader(
        {
            "url": fake_es,
            "index": index,
            "sort": "doc_id",
            "page_size": "10",
            "max_docs_per_batch": "25",
        }
    )
    rows1, off1 = reader.read(reader.initialOffset())
    rows1 = list(rows1)
    assert len(rows1) == 30  # cap rounds up to the page boundary
    rows2, off2 = reader.read(off1)
    rows2 = list(rows2)
    assert len(rows2) == 30
    ids = [json.loads(r[2])[0] for r in rows1 + rows2]
    assert ids == list(range(60))


def test_start_after_skips_bulk_backlog(fake_es, tmp_path, spark):
    """The documented es_live → es_tail handoff: bulk catch-up to a
    cutoff, then the tail starts strictly after it."""
    index = "cut_docs"
    _bulk_docs(spark, fake_es, tmp_path, index, 0, 30, "b")
    reader = EsTailStreamReader(
        {
            "url": fake_es,
            "index": index,
            "sort": "doc_id",
            "start_after": json.dumps([24]),
        }
    )
    rows, _ = reader.read(reader.initialOffset())
    assert [json.loads(r[2])[0] for r in rows] == [25, 26, 27, 28, 29]


@pytest.mark.slow
def test_es_tail_export_job_end_to_end(spark, fake_es, tmp_path):
    """The reference's full pipeline continuously: es_tail source →
    per-batch dynamic-schema parse → flatten → TSV + audit, exactly-once
    across two runs on one checkpoint (run 2 exports ONLY the new docs,
    each run leaves one SUCCESS audit row)."""
    import glob

    from etl_pipeline_for_elasticsearch_json_document_spark.sinks.audit import AuditLog
    from etl_pipeline_for_elasticsearch_json_document_spark.streaming.export_job import (
        run_es_tail_export_stream,
    )

    index = "etl_docs"
    _bulk_docs(spark, fake_es, tmp_path, index, 0, 21, "alpha")
    out = str(tmp_path / "tsv_out")
    ckpt = str(tmp_path / "etl_ckpt")
    audit_path = str(tmp_path / "audit")

    def run():
        q = run_es_tail_export_stream(
            spark,
            fake_es,
            index,
            out,
            ckpt,
            audit_path,
            sort="doc_id",
            id_col="doc_id",
            page_size=8,
        )
        assert q.awaitTermination(600), "stream drain timed out"

    run()
    dirs1 = sorted(glob.glob(out + "/*.tsv"))
    assert len(dirs1) == 1
    exported1 = spark.read.option("sep", "\t").option("header", True).csv(dirs1[0])
    assert exported1.count() == 21
    assert exported1.columns == ["Doc_id", "Payload"]  # flatten's naming

    _bulk_docs(spark, fake_es, tmp_path, index, 50, 62, "beta")
    run()
    dirs2 = sorted(glob.glob(out + "/*.tsv"))
    assert len(dirs2) == 2
    new_dir = [d for d in dirs2 if d not in dirs1][0]
    exported2 = spark.read.option("sep", "\t").option("header", True).csv(new_dir)
    assert exported2.count() == 12  # only the new docs — cursor held
    audit = AuditLog(spark, audit_path).read()
    ok = audit.filter(F.col("job_status") == "SUCCESS")
    assert ok.count() == 2
    counts = sorted(r["record_count_loaded"] for r in ok.collect())
    assert counts == [12, 21]
