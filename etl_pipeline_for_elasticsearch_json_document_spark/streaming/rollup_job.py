"""Always-on incremental rollup: the materialized aggregate of
operators/rollup_maintenance.py maintained by a stream.

Same exactly-once protocol as streaming/index_ingest.py (marker-first,
checkpoint-lineage-scoped ledger): each micro-batch's marker pins the
BASE rollup version before any write, so a foreachBatch crash-replay
merges the SAME batch against the SAME retained base version — or skips
entirely when the advance already committed — and the standing rollup
never double-counts a replayed batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from etl_pipeline_for_elasticsearch_json_document_spark.operators.rollup_maintenance import (
    _aggregate,
    _committed_versions,
    _merge,
)
from etl_pipeline_for_elasticsearch_json_document_spark.streaming.identity import (
    checkpoint_identity,
)


def _rollup_batch_processor(
    rollup_path: str, ckpt_id: str, keys: list[str], measures: dict[str, tuple]
):
    """Per-batch body, exposed for direct replay testing."""
    ledger = os.path.join(rollup_path, "_ledger")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(ledger, exist_ok=True)
        marker = os.path.join(ledger, f"{ckpt_id}-{batch_id}")
        if os.path.exists(marker):
            with open(marker) as f:
                base_v = int(f.read())
        else:
            versions = _committed_versions(rollup_path)
            base_v = versions[-1] if versions else -1
            tmp = marker + ".tmp"
            with open(tmp, "w") as f:
                f.write(str(base_v))
            os.replace(tmp, marker)
        next_v = base_v + 1
        if next_v in _committed_versions(rollup_path):
            return  # replay of a fully-applied batch: nothing to do
        delta = _aggregate(batch_df, keys, measures)
        if base_v >= 0:
            standing = spark.read.parquet(os.path.join(rollup_path, f"v={base_v}"))
            new = _merge(standing, delta, keys, measures)
        else:
            new = delta
        new.write.mode("overwrite").parquet(os.path.join(rollup_path, f"v={next_v}"))

    return process_batch


def run_rollup_stream(
    stream: DataFrame,
    rollup_path: str,
    checkpoint_dir: str,
    keys: list[str],
    measures: dict[str, tuple],
    trigger_available_now: bool = True,
):
    """Attach the incremental rollup to a streaming DataFrame. Returns
    the StreamingQuery (caller awaits termination)."""
    ckpt_id = checkpoint_identity(checkpoint_dir)
    writer = (
        stream.writeStream.foreachBatch(
            _rollup_batch_processor(rollup_path, ckpt_id, keys, measures)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
