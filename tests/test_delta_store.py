"""Shared delta-store protocol (operators/delta_store.py) unit tests —
the store-agnostic behaviors its three consumers (fingerprint index,
LSH bucket index, ANN postings) all rely on: persisted _META wins,
touched-partition pruning is exact, resolution chains pick the latest
snapshot, GC respects the snapshot floor and the keep_last guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.operators import delta_store as ds

SCHEMA = "k long, v long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _resolve(union):
    return union.groupBy("k").agg(F.min("v").alias("v"))


def test_meta_persists_and_wins(tmp_path):
    path = str(tmp_path / "store")
    assert ds.load_or_init_meta(path, 16) == {"n_partitions": 16}
    # a later caller with a different ask gets the PERSISTED value
    assert ds.load_or_init_meta(path, 64) == {"n_partitions": 16}


def test_write_read_union_and_pruning(spark, tmp_path):
    path = str(tmp_path / "store")
    ds.load_or_init_meta(path, 8)
    rows = [(i, i * 10) for i in range(50)]
    ds.write_version(_df(spark, rows), path, 0, ["k"], 8, snapshot=True)
    assert ds.committed_versions(path) == [0]
    full = ds.read_union(spark, path, 0, SCHEMA)
    assert {tuple(r) for r in full.collect()} == set(rows)
    # pruning to the partitions of a probe set returns every probed key
    # (exactness) and strictly fewer rows than the full relation
    probes = _df(spark, [(3, 0), (17, 0)])
    touched = ds.touched_partitions(probes, ["k"], 8)
    pruned = ds.read_union(spark, path, 0, SCHEMA, touched_p=touched)
    got = {r["k"] for r in pruned.collect()}
    assert {3, 17} <= got
    assert len(got) < 50


def test_source_versions_snapshot_chain(spark, tmp_path):
    path = str(tmp_path / "store")
    ds.load_or_init_meta(path, 4)
    ds.write_version(_df(spark, [(1, 1)]), path, 0, ["k"], 4)            # delta
    ds.write_version(_df(spark, [(2, 2)]), path, 1, ["k"], 4)            # delta
    ds.write_version(_df(spark, [(1, 1), (2, 2)]), path, 2, ["k"], 4,
                     snapshot=True)                                       # snapshot
    ds.write_version(_df(spark, [(3, 3)]), path, 3, ["k"], 4)            # delta
    assert ds.source_versions(path, 1) == [0, 1]   # pre-snapshot chain
    assert ds.source_versions(path, 2) == [2]      # snapshot alone
    assert ds.source_versions(path, 3) == [2, 3]   # snapshot + tail
    with pytest.raises(ValueError, match="not committed"):
        ds.source_versions(path, 9)


def test_compact_and_prune_floor(spark, tmp_path):
    path = str(tmp_path / "store")
    ds.load_or_init_meta(path, 4)
    ds.write_version(_df(spark, [(1, 5)]), path, 0, ["k"], 4)
    ds.write_version(_df(spark, [(1, 3), (2, 7)]), path, 1, ["k"], 4)
    # no snapshot floor: nothing deletable regardless of keep_last
    assert ds.prune(path, keep_last=1) == []
    assert ds.compact(spark, path, SCHEMA, ["k"], _resolve) == 2
    resolved = _resolve(ds.read_union(spark, path, 2, SCHEMA))
    assert {tuple(r) for r in resolved.collect()} == {(1, 3), (2, 7)}
    ds.write_version(_df(spark, [(3, 9)]), path, 3, ["k"], 4)
    assert ds.prune(path, keep_last=2) == [0, 1]
    assert ds.committed_versions(path) == [2, 3]
    with pytest.raises(ValueError, match="keep_last"):
        ds.prune(path, keep_last=0)


def test_uncommitted_version_is_invisible(spark, tmp_path):
    path = str(tmp_path / "store")
    ds.load_or_init_meta(path, 4)
    ds.write_version(_df(spark, [(1, 1)]), path, 0, ["k"], 4, snapshot=True)
    os.makedirs(os.path.join(path, "v=1"))  # crashed write: no _COMMITTED
    assert ds.committed_versions(path) == [0]
    assert ds.source_versions(path, 0) == [0]
