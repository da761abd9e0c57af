"""Property tests for the incremental operators: for ANY corpus and ANY
split of it into batches, (a) the fingerprint index converges to the
one-shot dedup answer and (b) the incremental rollup equals the one-shot
aggregate — batch boundaries must be semantically invisible."""

from __future__ import annotations

import pytest

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.operators.index_maintenance import (
    ingest_with_index,
    read_fingerprint_index,
)
from etl_pipeline_for_elasticsearch_json_document_spark.operators.rollup_maintenance import (
    read_rollup,
    update_rollup,
)

# small alphabet => guaranteed collisions within and across batches
_texts = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_corpora = st.lists(_texts, min_size=1, max_size=14)
_cuts = st.lists(st.integers(min_value=1, max_value=13), max_size=3)


def _batches(rows, cuts):
    bounds = sorted({c for c in cuts if c < len(rows)})
    out, prev = [], 0
    for b in bounds:
        out.append(rows[prev:b])
        prev = b
    out.append(rows[prev:])
    return [b for b in out if b]


@settings(max_examples=8, deadline=None)
@given(texts=_corpora, cuts=_cuts)
@pytest.mark.slow
def test_index_converges_to_one_shot_dedup(spark, tmp_path_factory, texts, cuts):
    rows = [(i, t) for i, t in enumerate(texts)]
    idx_path = str(tmp_path_factory.mktemp("fpidx"))
    statuses: dict[int, str] = {}
    for batch in _batches(rows, cuts):
        df = spark.createDataFrame(batch, "doc_id long, text string")
        for r in ingest_with_index(spark, idx_path, df).collect():
            statuses[r["doc_id"]] = r["status"]
    # (a) the index is exactly the distinct-content set
    idx = read_fingerprint_index(spark, idx_path)
    assert idx.count() == len({t for _, t in rows})
    # (b) each fingerprint remembers the globally FIRST doc (batches are
    # fed in doc_id order, so global first == first-ingested)
    first_by_text = {}
    for i, t in rows:
        first_by_text.setdefault(t, i)
    fps = {r["fp"]: r["first_doc_id"] for r in idx.collect()}
    got_firsts = sorted(fps.values())
    assert got_firsts == sorted(first_by_text.values())
    # (c) statuses: exactly the global first occurrences ingested;
    # everything else is a duplicate of SOMETHING earlier
    for i, t in rows:
        if first_by_text[t] == i:
            assert statuses[i] == "ingested", (i, t, statuses)
        else:
            assert statuses[i] in ("duplicate_batch", "duplicate_corpus")


_vals = st.lists(
    st.tuples(
        st.sampled_from(["d1", "d2"]),
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=1,
    max_size=14,
)

_MEASURES = {
    "n": ("count", "*"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


@settings(max_examples=8, deadline=None)
@given(rows=_vals, cuts=_cuts)
@pytest.mark.slow
def test_rollup_split_invariance(spark, tmp_path_factory, rows, cuts):
    path = str(tmp_path_factory.mktemp("rollup"))
    for batch in _batches(rows, cuts):
        update_rollup(
            spark,
            path,
            spark.createDataFrame(batch, "day string, typ string, v long"),
            ["day", "typ"],
            _MEASURES,
        )
    standing = sorted(tuple(r) for r in read_rollup(spark, path).collect())
    oneshot = sorted(
        tuple(r)
        for r in spark.createDataFrame(rows, "day string, typ string, v long")
        .groupBy("day", "typ")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("v").cast("long").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    )
    assert standing == oneshot
