"""Streaming near-dup bucket index (streaming/lsh_ingest.py): stream-vs-
batch component equivalence, per-doc classification, replay idempotence,
and anchor behavior when smaller ids arrive late."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.operators import dedup, graph
from etl_pipeline_for_elasticsearch_json_document_spark.streaming.lsh_ingest import (
    _committed_versions,
    _lsh_batch_processor,
    run_lsh_ingest_stream,
)

SCHEMA = "doc_id long, text string"


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def _clusters(spark, edges, docs):
    return {
        (r["doc_id"], r["cluster_id"])
        for r in graph.dedup_clusters(edges, docs, id_col="doc_id")
        .select("doc_id", "cluster_id")
        .collect()
    }


def test_streamed_edges_close_to_batch_clusters(spark, sf_dir, tmp_path):
    """Two micro-batches split by id PARITY (so the second batch holds
    ids smaller than already-indexed anchors — the hard case): the union
    of streamed star edges closes to EXACTLY the clusters the batch
    operator finds on the full corpus."""
    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "lsh")
    out = str(tmp_path / "out")
    proc = _lsh_batch_processor(idx, out, "lineageA")
    proc(docs.filter(F.col("doc_id") % 2 == 1), 0)  # odd ids first
    proc(docs.filter(F.col("doc_id") % 2 == 0), 1)  # then even (smaller mins)
    assert _committed_versions(idx) == [0, 1]

    streamed_edges = spark.read.parquet(
        os.path.join(out, "batch=lineageA-0", "edges"),
        os.path.join(out, "batch=lineageA-1", "edges"),
    )
    batch_edges = dedup.lsh_bucket_edges(docs, "doc_id", "text")
    assert _clusters(spark, streamed_edges, docs) == _clusters(
        spark, batch_edges, docs
    )


def test_classification_and_replay(spark, tmp_path):
    t = "the quick brown fox jumps over the lazy dog again and again"
    b1 = spark.createDataFrame([(10, t), (11, t), (12, "completely different words here nothing shared at all")], SCHEMA)
    b2 = spark.createDataFrame([(20, t), (21, "another fully distinct document with its own vocabulary")], SCHEMA)
    idx = str(tmp_path / "lsh")
    out = str(tmp_path / "out")
    proc = _lsh_batch_processor(idx, out, "lin")
    proc(b1, 0)
    proc(b2, 1)

    s1 = {
        r["doc_id"]: r["status"]
        for r in spark.read.parquet(os.path.join(out, "batch=lin-0", "status")).collect()
    }
    assert s1[10] == "unique"
    assert s1[11] == "near_dup_batch"  # shares buckets with smaller id 10
    assert s1[12] == "unique"
    s2 = {
        r["doc_id"]: (r["status"], r["corpus_anchor"])
        for r in spark.read.parquet(os.path.join(out, "batch=lin-1", "status")).collect()
    }
    assert s2[20] == ("near_dup_corpus", 10)  # anchored to the indexed min
    assert s2[21][0] == "unique"

    # replay batch 1: same base version, index does not advance, outputs
    # are overwritten byte-equivalently
    v_before = _committed_versions(idx)
    rows_before = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(out, "batch=lin-1", "status")).collect()
    }
    proc(b2, 1)
    assert _committed_versions(idx) == v_before
    rows_after = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(out, "batch=lin-1", "status")).collect()
    }
    assert rows_after == rows_before
    # the ledger pinned base version 0 for the replayed batch
    with open(os.path.join(idx, "_ledger", "lin-1")) as f:
        assert int(f.read()) == 0


def test_stream_entry_point_end_to_end(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir).limit(60)
    src = str(tmp_path / "src")
    docs.coalesce(1).write.mode("append").json(src)
    idx = str(tmp_path / "lsh")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    q = run_lsh_ingest_stream(stream, idx, out, ckpt)
    q.awaitTermination(180)
    assert _committed_versions(idx) == [0]
    n_status = (
        spark.read.parquet(os.path.join(out, "batch=*", "status")).count()
    )
    assert n_status == 60
    # anchors in the committed index are real doc ids, one per bucket
    committed = spark.read.parquet(os.path.join(idx, "v=0"))
    assert committed.groupBy("band", "bucket").count().agg(
        F.max("count")
    ).collect()[0][0] == 1


def test_prune_versions_gc_interop(spark, tmp_path):
    """The shared v=N GC works on this store: prune to keep_last=2, a
    replay of the last batch still reads its pinned base version and
    converges; the pruned version is gone from disk."""
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.index_maintenance import (
        prune_versions,
    )

    t = "some shared text repeated across every batch for bucket overlap"
    idx = str(tmp_path / "lsh")
    out = str(tmp_path / "out")
    proc = _lsh_batch_processor(idx, out, "gc")
    proc(spark.createDataFrame([(1, t)], SCHEMA), 0)   # v=0
    proc(spark.createDataFrame([(2, t)], SCHEMA), 1)   # v=1 (base 0)
    proc(spark.createDataFrame([(3, t)], SCHEMA), 2)   # v=2 (base 1)
    assert prune_versions(idx, keep_last=2) == [0]
    assert _committed_versions(idx) == [1, 2]
    before = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(out, "batch=gc-2", "status")).collect()
    }
    proc(spark.createDataFrame([(3, t)], SCHEMA), 2)  # replay reads base v=1
    after = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(out, "batch=gc-2", "status")).collect()
    }
    assert after == before
    assert _committed_versions(idx) == [1, 2]


def test_live_es_tail_feeds_near_dup_index(spark, tmp_path):
    """The switch-from-the-reference showcase: tail a LIVE (fake) ES
    index with the es_tail streaming source, parse _source per batch,
    and maintain the near-dup bucket index — run 2 on the same
    checkpoint reads ONLY the new docs (the search_after cursor holds)
    and classifies a re-posted text as near_dup_corpus against run 1's
    memory."""
    import json

    from etl_pipeline_for_elasticsearch_json_document_spark.sinks import (
        elasticsearch as es_sink,
    )
    from etl_pipeline_for_elasticsearch_json_document_spark.sources.es_stream import (
        EsTailDataSource,
    )
    from tests.fake_es import start_fake_es

    server, base_url = start_fake_es()
    try:
        spark.dataSource.register(EsTailDataSource)
        index = "live_docs"
        t = "a shared template text that will recur across separate ingests"

        def seed(rows, tag):
            df = spark.createDataFrame(rows, SCHEMA)
            out = str(tmp_path / f"bulk_{tag}")
            es_sink.write_bulk_files(df.coalesce(1), out, index, id_col="doc_id")
            es_sink.replay_bulk_files(out, base_url)

        idx = str(tmp_path / "lsh")
        outp = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def run():
            stream = (
                spark.readStream.format("es_tail")
                .option("url", base_url)
                .option("index", index)
                .option("sort", "doc_id")
                .load()
            )
            parsed = stream.select(
                F.from_json("source_json", SCHEMA).alias("s")
            ).select("s.doc_id", "s.text")
            q = run_lsh_ingest_stream(parsed, idx, outp, ckpt)
            q.awaitTermination(120)

        seed([(1, t), (2, "an unrelated document about something else entirely")], "r1")
        run()
        seed([(3, t)], "r2")  # near-dup of doc 1, posted AFTER run 1
        run()

        batches = sorted(os.listdir(outp))
        assert len(batches) == 2  # run 2 drained only the new doc
        statuses = {
            r["doc_id"]: (r["status"], r["corpus_anchor"])
            for b in batches
            for r in spark.read.parquet(os.path.join(outp, b, "status")).collect()
        }
        assert statuses[1][0] == "unique"
        assert statuses[2][0] == "unique"
        assert statuses[3] == ("near_dup_corpus", 1)  # remembered across runs
        assert len(_committed_versions(idx)) == 2
    finally:
        server.shutdown()
        server.server_close()
