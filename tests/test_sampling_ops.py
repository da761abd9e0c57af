"""Sampling operators' scale spellings: the hierarchical grouped prefix
sum equals the single-window cumsum row-for-row (inclusive and
exclusive), sequence_packing's chunked path is byte-identical to its
window path, and the chunk decomposition really bounds window tasks to
chunks (plan-level)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_for_elasticsearch_json_document_spark.operators.sampling import (
    grouped_prefix_sum,
    sequence_packing,
)
from etl_pipeline_for_elasticsearch_json_document_spark.sources.tables import load_table


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("event_id").cast("long").alias("event_id"),
        F.col("value").cast("long").alias("v"),
    )


def test_grouped_prefix_sum_matches_window(spark, sf_dir):
    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    naive = e.withColumn("run", F.sum("v").over(w))
    fast = grouped_prefix_sum(
        e, "event_type", "event_id", "v", "run", chunk_width=257
    ).select("event_type", "event_id", "v", "run")
    naive = naive.select("event_type", "event_id", "v", "run")
    assert naive.exceptAll(fast).count() == 0
    assert fast.exceptAll(naive).count() == 0


def test_grouped_prefix_sum_exclusive_form(spark, sf_dir):
    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = e.withColumn("run", F.coalesce(F.sum("v").over(w), F.lit(0)))
    fast = grouped_prefix_sum(
        e, "event_type", "event_id", "v", "run", chunk_width=100, inclusive=False
    )
    cols = ["event_type", "event_id", "v", "run"]
    assert naive.select(cols).exceptAll(fast.select(cols)).count() == 0
    assert fast.select(cols).exceptAll(naive.select(cols)).count() == 0


def test_sequence_packing_chunked_path_identical(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("nt")
    )
    base = sequence_packing(d, "lang", "doc_id", "nt", capacity=512)
    chunked = sequence_packing(
        d, "lang", "doc_id", "nt", capacity=512, chunk_width=64
    )
    assert base.exceptAll(chunked).count() == 0
    assert chunked.exceptAll(base).count() == 0


def test_prefix_sum_windows_are_chunk_bounded(spark, sf_dir):
    """Plan pin: the hierarchical form's data-sized window partitions by
    (group, chunk) — the only window keyed by the bare group runs over
    the per-chunk TOTALS aggregate (the carry relation), so no task ever
    sorts a whole group's corpus slice."""
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.plan_lint import (
        _ROW_BOUND_PRESERVING,
        _jchildren,
        _jwalk,
    )

    e = _events(spark, sf_dir)
    df = grouped_prefix_sum(e, "event_type", "event_id", "v", "run", 1000)
    analyzed = df._jdf.queryExecution().analyzed()
    bare_group_windows = 0
    for node in _jwalk(analyzed):
        if node.nodeName() != "Window":
            continue
        spec = node.partitionSpec()
        keys = [spec.apply(i).toString().split("#")[0] for i in range(spec.size())]
        if keys == ["event_type"]:
            bare_group_windows += 1
            child = _jchildren(node)[0]
            while (
                child.nodeName() in _ROW_BOUND_PRESERVING
                and len(_jchildren(child)) == 1
            ):
                child = _jchildren(child)[0]
            assert child.nodeName() == "Aggregate", (
                f"carry window must read the per-chunk totals aggregate, "
                f"got {child.nodeName()}"
            )
        else:
            assert "__chunk" in keys  # the local window is chunk-bounded
    assert bare_group_windows == 1
