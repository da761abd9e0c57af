"""Continuous NEAR-duplicate detection: a persistent LSH band-bucket
index driven by a document stream — the streaming twin of the q103
bucket-star dedup, completing the maintenance family next to the exact
fingerprint index (streaming/index_ingest.py) and the ANN store
(streaming/ann_ingest.py).

Store: versioned ``index_path/v=N/`` parquet of ``(band, bucket,
anchor_id)`` — per band bucket, the minimum doc id ever seen (the star
anchor). Each micro-batch:

1. buckets its docs with EXACTLY the batch operator's banding
   (:func:`operators.dedup.lsh_band_buckets` — shared substrate, so
   streamed and batch candidates can never disagree);
2. classifies each doc against the index as it stood BEFORE the batch:
   ``near_dup_corpus`` (some bucket already indexed), else
   ``near_dup_batch`` (shares a bucket with a smaller-id doc in the same
   batch), else ``unique``;
3. emits STAR EDGES ``(a_id, b_id)`` — each doc to its bucket's anchor
   (the stored anchor if the bucket exists, the batch minimum otherwise).
   The union of all batches' edges spans EXACTLY the components the batch
   operator finds on the full corpus (pinned in tests/test_lsh_ingest.py):
   when a later, smaller id arrives, its edge to the OLD anchor keeps the
   chain connected, so min-label closure yields identical clusters;
4. advances the index one version: per-bucket ``min(old anchor, batch
   min)``.

Exactly-once under foreachBatch's at-least-once: the marker-first ledger
of streaming/index_ingest.py verbatim — the marker pins the BASE version
per (checkpoint-lineage, batch) before any write; replays re-classify
against the SAME retained version, skip the commit if it landed, and
overwrite their own deterministic output dirs.

GC: :func:`operators.index_maintenance.prune_versions` (default
``marker='_SUCCESS'``) garbage-collects this store unchanged — keep
``keep_last >= 2`` so a crash-replayed batch can still read its pinned
base version (the same contract as the fingerprint index).

Scale: per batch, the classification side is |batch| × bands rows
joining a 20-byte-row bucket relation; the version commit rewrites the
full bucket relation (one row per distinct bucket ever seen — bounded by
docs × bands, deduplicating as the corpus repeats itself). At 100 TB
swap the rewrite for the same partitioned/bucketed append the ANN store
documents (:mod:`operators.ann_index` / :func:`operators.layout.
write_bucketed` — hash-partition by ``bucket``, append only changed
partitions); the classify join and the ledger protocol are unchanged.

Reference analog: the reference re-exports whole pages with no memory of
prior content (`ElasticSearch ETL.py:220-267`); index_ingest.py added
exact memory, this adds NEAR-duplicate memory at stream pace.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.operators.dedup import (
    lsh_band_buckets,
)
from etl_pipeline_for_elasticsearch_json_document_spark.streaming.identity import (
    checkpoint_identity,
)
from etl_pipeline_for_elasticsearch_json_document_spark.streaming.index_ingest import (
    _write_marker,
)

BUCKET_SCHEMA = "band int, bucket long, anchor_id long"


def _committed_versions(index_path: str) -> list[int]:
    if not os.path.isdir(index_path):
        return []
    out = []
    for name in os.listdir(index_path):
        if name.startswith("v=") and os.path.exists(
            os.path.join(index_path, name, "_SUCCESS")
        ):
            out.append(int(name[2:]))
    return sorted(out)


def _read_version(spark, index_path: str, version: int) -> DataFrame:
    if version < 0:
        return spark.createDataFrame([], BUCKET_SCHEMA)
    return spark.read.schema(BUCKET_SCHEMA).parquet(
        os.path.join(index_path, f"v={version}")
    )


def _lsh_batch_processor(
    index_path: str,
    out_path: str,
    ckpt_id: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
):
    """The per-batch body, exposed for direct replay testing."""

    ledger = os.path.join(index_path, "_ledger")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(ledger, exist_ok=True)
        marker = os.path.join(ledger, f"{ckpt_id}-{batch_id}")
        if os.path.exists(marker):
            with open(marker) as f:
                base_v = int(f.read())
        else:
            versions = _committed_versions(index_path)
            base_v = versions[-1] if versions else -1
            _write_marker(marker, base_v)

        idx = _read_version(spark, index_path, base_v)
        bb = lsh_band_buckets(batch_df, id_col, text_col, num_hashes, bands)
        batch_min = bb.groupBy("band", "bucket").agg(
            F.min("doc_id").alias("batch_min")
        )
        # ONE materialization of the joined relation: edges, status, and
        # the version merge all derive from it lazily — without this pin
        # each consumer would recompute the minhash signatures, tripling
        # the per-batch cost, and the pin also freezes the batch's view
        # before the index advances (replay safety rides the marker, this
        # is cost + isolation)
        j = (
            bb.join(idx, ["band", "bucket"], "left")
            .join(batch_min, ["band", "bucket"])
            .localCheckpoint(eager=True)
        )
        # star target per (doc, bucket): the stored anchor if the bucket
        # exists, else the batch's own minimum for that bucket
        target = F.coalesce("anchor_id", "batch_min")
        edges = j.filter(F.col("doc_id") != target).select(
            target.alias("a_id"), F.col("doc_id").alias("b_id")
        )
        status = (
            j.groupBy("doc_id")
            .agg(
                F.min("anchor_id").alias("corpus_anchor"),
                F.min("batch_min").alias("min_batch_peer"),
            )
            .select(
                "doc_id",
                F.when(F.col("corpus_anchor").isNotNull(), "near_dup_corpus")
                .when(F.col("min_batch_peer") < F.col("doc_id"), "near_dup_batch")
                .otherwise("unique")
                .alias("status"),
                "corpus_anchor",
            )
        )

        next_v = base_v + 1
        if next_v not in _committed_versions(index_path):
            j_min = (
                j.groupBy("band", "bucket")
                .agg(F.min("batch_min").alias("batch_min"))
            )
            merged = (
                idx.join(j_min, ["band", "bucket"], "full")
                .select(
                    "band",
                    "bucket",
                    F.least(
                        F.coalesce("anchor_id", "batch_min"),
                        F.coalesce("batch_min", "anchor_id"),
                    ).alias("anchor_id"),
                )
            )
            merged.write.mode("overwrite").parquet(
                os.path.join(index_path, f"v={next_v}")
            )
        # deterministic per-(lineage, batch) dirs + overwrite = idempotent
        base = os.path.join(out_path, f"batch={ckpt_id}-{batch_id}")
        edges.write.mode("overwrite").parquet(os.path.join(base, "edges"))
        status.write.mode("overwrite").parquet(os.path.join(base, "status"))

    return process_batch


def run_lsh_ingest_stream(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    trigger_available_now: bool = True,
):
    """Attach the near-dup bucket index to a streaming DataFrame of
    documents. Returns the StreamingQuery (caller awaits termination)."""
    ckpt_id = checkpoint_identity(checkpoint_dir)
    writer = (
        stream.writeStream.foreachBatch(
            _lsh_batch_processor(
                index_path, out_path, ckpt_id, id_col, text_col, num_hashes, bands
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
