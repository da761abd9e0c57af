"""Persistent content-fingerprint index for incremental ingestion dedup.

q158 computes the new-batch-vs-corpus classification when the corpus is
re-derivable; a real continuously-fed pipeline instead MAINTAINS the
fingerprint set as its own versioned table and updates it per batch —
this module is that index.

Layout: ``index_path/v=N/`` parquet dirs, one per committed version.
A version counts only when Spark's ``_SUCCESS`` marker landed (the
atomic-commit signal of the parquet writer), so a crashed update leaves
a dangling uncommitted dir that readers skip and the next update
overwrites — the same staged-commit discipline as sinks/compact.py.

Scale: the index is (16-byte fp, first_doc_id) — orders of magnitude
smaller than the corpus; the update is one broadcast-or-shuffle left
join of the batch against it plus a distinct union of the genuinely new
fingerprints. Each version rewrites the full index; at 100 TB swap the
rewrite for partitioned appends bucketed by fp prefix (same keys, same
classification plan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INDEX_SCHEMA = "fp string, first_doc_id long"


def _committed_versions(index_path: str, marker: str = "_SUCCESS") -> list[int]:
    if not os.path.isdir(index_path):
        return []
    out = []
    for name in os.listdir(index_path):
        if name.startswith("v=") and os.path.exists(
            os.path.join(index_path, name, marker)
        ):
            out.append(int(name[2:]))
    return sorted(out)


def prune_versions(path: str, keep_last: int = 2, marker: str = "_SUCCESS") -> list[int]:
    """Garbage-collect old committed versions of a ``v=N/`` store (this
    index, a rollup, or the ANN store — same layout; the ANN store's
    commit marker is ``_COMMITTED``), keeping the newest ``keep_last``.

    ``keep_last`` must be >= 2 for streams: a crash-replayed micro-batch
    re-reads its BASE version, which is one behind the latest. Dangling
    uncommitted dirs are untouched (the next writer overwrites them).
    Returns the removed version numbers.
    """
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = _committed_versions(path, marker)
    doomed = versions[:-keep_last]
    for v in doomed:
        shutil.rmtree(os.path.join(path, f"v={v}"))
    return doomed


def read_fingerprint_index(spark: SparkSession, index_path: str) -> DataFrame:
    """The current committed index (empty with the right schema if none)."""
    versions = _committed_versions(index_path)
    if not versions:
        return spark.createDataFrame([], INDEX_SCHEMA)
    return spark.read.schema(INDEX_SCHEMA).parquet(
        os.path.join(index_path, f"v={versions[-1]}")
    )


def ingest_with_index(
    spark: SparkSession,
    index_path: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classify ``docs`` against the current index, then commit a new
    index version that includes the batch's genuinely-new fingerprints.

    Returns the classification (materialized BEFORE the index advances,
    so a failed write never half-applies): columns ``doc_id``, ``fp``,
    ``status`` ∈ {'duplicate_corpus', 'duplicate_batch', 'ingested'} —
    corpus match outranks within-batch (q158's precedence), first
    occurrence (min id) wins within a batch.
    """
    idx = read_fingerprint_index(spark, index_path)
    h = docs.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("fp")
    )
    first = h.groupBy("fp").agg(F.min("doc_id").alias("first_in_batch"))
    cls = (
        h.join(idx.withColumnRenamed("first_doc_id", "idx_first"), "fp", "left")
        .join(first, "fp")
        .select(
            "doc_id",
            "fp",
            F.when(F.col("idx_first").isNotNull(), "duplicate_corpus")
            .when(F.col("doc_id") != F.col("first_in_batch"), "duplicate_batch")
            .otherwise("ingested")
            .alias("status"),
        )
    )
    result = cls.localCheckpoint(eager=True)  # pin the pre-update view
    new_fps = (
        result.filter(F.col("status") == "ingested")
        .select("fp", F.col("doc_id").cast("long").alias("first_doc_id"))
    )
    versions = _committed_versions(index_path)
    next_v = (versions[-1] + 1) if versions else 0
    merged = idx.unionByName(new_fps)
    merged.write.mode("overwrite").parquet(os.path.join(index_path, f"v={next_v}"))
    return result
