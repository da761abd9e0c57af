"""Streaming incremental sketch maintenance: a count-min sketch kept
up-to-date over an unbounded stream via ``foreachBatch`` merge.

This is the streaming face of the mergeable-summary story
(operators/sketches.py): each micro-batch builds its own depth×width
sketch (shuffle volume = sketch size), merges it with the persisted one by
SUMMING buckets (associative + commutative), and atomically swaps the
state file. Because the merge is exact, the streamed sketch after any
drain equals the batch sketch over all data seen — pinned in
tests/test_streaming.py — which is also the restart/backfill guarantee:
replay order cannot change the result.

Delivery/crash semantics: foreachBatch is at-least-once, so every state
row carries the last merged ``batch_id`` and a replayed batch is detected
and SKIPPED (merging it twice would double-count — exactly-once at the
state level). The swap keeps a ``.__old__`` backup until the new state is
in place, and ``read_sketch`` falls back to the backup, so a crash at any
point between the renames loses at most the in-flight batch (which then
replays), never the history.

At 100 TB/day the same shape runs per shard/hour and the global sketch is
one more bucket-sum rollup; raw data is never re-read. The reference has
no analog (it re-scans for every count, ``ElasticSearch ETL.py:214``).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.operators.sketches import (
    count_min_build,
)


def merge_sketches(*sketches: DataFrame) -> DataFrame:
    """Exact mergeable-summary merge: bucket-wise count sums."""
    out = sketches[0].select("d", "bucket", "cnt")
    for s in sketches[1:]:
        out = out.unionByName(s.select("d", "bucket", "cnt"))
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def read_sketch(spark: SparkSession, state_path: str) -> DataFrame | None:
    """Current sketch state; falls back to the ``.__old__`` backup if a
    crash landed between the swap renames (state momentarily absent)."""
    for p in (state_path, state_path + ".__old__"):
        if os.path.exists(p):
            return spark.read.parquet(p)
    return None


def run_cms_stream(
    stream: DataFrame,
    item_col: str,
    state_path: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 256,
    trigger_available_now: bool = True,
):
    """Maintain a count-min sketch of ``item_col`` over a stream.

    Per micro-batch: build the batch's sketch, merge with the persisted
    sketch (bucket sums), write to a staging dir, swap. The state is at
    most depth×width rows, so the merge is a broadcast-sized job no matter
    how large the stream gets. Replayed batches (at-least-once delivery)
    are detected via the ``last_batch`` column and skipped, so the merge
    is idempotent. Returns the StreamingQuery.
    """
    spark = stream.sparkSession

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        prev = read_sketch(spark, state_path)
        if prev is not None and "last_batch" in prev.columns:
            done = prev.agg(F.max("last_batch")).first()[0]
            if done is not None and done >= batch_id:
                return  # replay of an already-merged batch: skip, don't double-count
        batch_sketch = count_min_build(
            batch_df.select(item_col), item_col, depth=depth, width=width
        )
        merged = batch_sketch if prev is None else merge_sketches(prev, batch_sketch)
        merged = merged.withColumn("last_batch", F.lit(batch_id).cast("long"))
        staging = state_path + ".__next__"
        if os.path.exists(staging):  # stale staging from a crashed attempt
            shutil.rmtree(staging)
        # materialize BEFORE touching state_path (merged reads from it)
        merged.coalesce(1).write.mode("overwrite").parquet(staging)
        old = state_path + ".__old__"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(state_path):
            os.rename(state_path, old)
        os.rename(staging, state_path)
        if os.path.exists(old):
            shutil.rmtree(old)

    writer = stream.writeStream.foreachBatch(on_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
