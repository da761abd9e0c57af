"""Streaming ANN-store maintenance: per-micro-batch assignment against
the pre-batch store version, one version advance per batch, replay
safety (marker-first ledger), and stream-vs-batch equivalence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.operators.ann_index import (
    ivf_build,
    read_ann_index,
    _committed_versions,
)
from etl_pipeline_for_elasticsearch_json_document_spark.operators.similarity import (
    kmeans_assign,
)
from etl_pipeline_for_elasticsearch_json_document_spark.streaming.ann_ingest import (
    _ann_batch_processor,
    run_ann_ingest_stream,
)

SCHEMA = "vec_id long, embedding array<float>"


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _write_batch(df, path):
    df.coalesce(1).write.mode("append").json(path)


def test_stream_advances_store_and_matches_batch_upsert(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    idx = str(tmp_path / "ivf")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    build = emb.filter(F.col("vec_id") < 30)
    ivf_build(spark, idx, build, k=4)
    # one json file per micro-batch (maxFilesPerTrigger=1)
    b1 = emb.filter((F.col("vec_id") >= 30) & (F.col("vec_id") < 45))
    b2 = emb.filter(F.col("vec_id") >= 45)
    _write_batch(b1, src)
    _write_batch(b2, src)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    )
    q = run_ann_ingest_stream(stream, idx, out, ckpt)
    q.awaitTermination(180)

    cents, postings = read_ann_index(spark, idx)
    assert postings.count() == emb.count()
    # two micro-batches => two version advances past the build's v=0
    assert _committed_versions(idx)[-1] == 2
    # stream result == one-shot assignment against the SAME codebook
    oneshot = kmeans_assign(
        emb,
        cents.select(F.col("cid").alias("vec_id"), F.col("centroid").alias("embedding")),
    )
    assert {tuple(r) for r in postings.collect()} == {
        tuple(r) for r in oneshot.collect()
    }
    # per-batch outputs landed in deterministic dirs
    assert spark.read.parquet(out).count() == b1.count() + b2.count()


def test_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    idx = str(tmp_path / "ivf")
    out = str(tmp_path / "out")
    ivf_build(spark, idx, emb.filter(F.col("vec_id") < 30), k=4)
    batch = emb.filter(F.col("vec_id") >= 30)
    proc = _ann_batch_processor(idx, out, "lineageA")
    proc(batch, 0)
    n1 = read_ann_index(spark, idx)[1].count()
    v1 = _committed_versions(idx)
    proc(batch, 0)  # foreachBatch replay: same lineage, same batch id
    assert read_ann_index(spark, idx)[1].count() == n1
    assert _committed_versions(idx) == v1
    # the marker pinned the base version
    marker = os.path.join(idx, "_ledger", "lineageA-0")
    assert os.path.exists(marker)
    with open(marker) as f:
        assert int(f.read()) == 0


def test_stream_without_build_fails_fast(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    proc = _ann_batch_processor(str(tmp_path / "missing"), str(tmp_path / "out"), "x")
    try:
        proc(emb.limit(3), 0)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "ivf_build" in str(e)
