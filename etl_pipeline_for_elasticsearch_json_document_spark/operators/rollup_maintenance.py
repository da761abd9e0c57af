"""Incremental materialized rollup: an exact aggregate table maintained
batch by batch instead of recomputed from the full corpus.

The reference recomputes everything per scheduler tick; at 100 TB the
only viable shape for a standing aggregate (events per day/type, token
counts per source, ...) is merge-in-the-delta: aggregate ONLY the new
batch (tiny), then combine it with the standing rollup on the group
keys. That works exactly when every measure is an associative partial
aggregate — so this operator supports the decomposable set
``count / sum / min / max`` (avg = sum/count at read time) and refuses
anything else loudly.

Layout mirrors operators/index_maintenance.py: ``rollup_path/v=N/``
parquet versions, a version counting only once its ``_SUCCESS`` marker
landed, dangling crashed versions invisible and overwritten by the next
update. The merge is one union + groupBy over (standing rollup ∪ batch
aggregate) — the standing side is |groups| rows, NOT the corpus, so an
update costs O(batch + groups) regardless of history size.

Equivalence contract (pinned in tests/test_rollup_maintenance.py):
applying batches B1..Bn through ``update_rollup`` yields byte-identical
rows to aggregating B1 ∪ ... ∪ Bn in one shot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.operators.index_maintenance import (
    prune_versions,  # noqa: F401  (same v=N/ layout — re-exported for rollups)
)

#: measure -> (per-batch aggregate, merge aggregate). count merges as sum.
_MEASURES = {
    "count": (lambda c: F.count(c).cast("bigint"), F.sum),
    "sum": (lambda c: F.sum(c).cast("long"), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def _committed_versions(rollup_path: str) -> list[int]:
    if not os.path.isdir(rollup_path):
        return []
    return sorted(
        int(name[2:])
        for name in os.listdir(rollup_path)
        if name.startswith("v=")
        and os.path.exists(os.path.join(rollup_path, name, "_SUCCESS"))
    )


def _aggregate(batch: DataFrame, keys: list[str], measures: dict[str, tuple]) -> DataFrame:
    aggs = []
    for out_col, (kind, in_col) in measures.items():
        if kind not in _MEASURES:
            raise ValueError(
                f"measure {kind!r} is not decomposable (supported: "
                f"{sorted(_MEASURES)}); express avg as sum/count at read time"
            )
        aggs.append(_MEASURES[kind][0](in_col).alias(out_col))
    return batch.groupBy(*keys).agg(*aggs)


def _merge(standing: DataFrame, delta: DataFrame, keys: list[str],
           measures: dict[str, tuple]) -> DataFrame:
    merged = standing.unionByName(delta)
    aggs = []
    for out_col, (kind, _) in measures.items():
        merge_fn = F.sum if kind in ("count", "sum") else _MEASURES[kind][1]
        col = merge_fn(out_col)
        if kind in ("count", "sum"):
            col = col.cast("long")
        aggs.append(col.alias(out_col))
    return merged.groupBy(*keys).agg(*aggs)


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame | None:
    """The current committed rollup, or None before the first update."""
    versions = _committed_versions(rollup_path)
    if not versions:
        return None
    return spark.read.parquet(os.path.join(rollup_path, f"v={versions[-1]}"))


def update_rollup(
    spark: SparkSession,
    rollup_path: str,
    batch: DataFrame,
    keys: list[str],
    measures: dict[str, tuple],
) -> DataFrame:
    """Fold ``batch`` into the standing rollup and commit a new version.

    ``measures`` maps output column -> (kind, input column), e.g.
    ``{"n_events": ("count", "*"), "total": ("sum", "value")}``.
    Returns the new standing rollup (also persisted as ``v=N+1``).
    """
    delta = _aggregate(batch, keys, measures)
    standing = read_rollup(spark, rollup_path)
    new = delta if standing is None else _merge(standing, delta, keys, measures)
    versions = _committed_versions(rollup_path)
    next_v = (versions[-1] + 1) if versions else 0
    target = os.path.join(rollup_path, f"v={next_v}")
    new.write.mode("overwrite").parquet(target)
    return spark.read.parquet(target)
