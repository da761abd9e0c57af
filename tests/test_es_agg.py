"""Source-side aggregation pushdown (sources/es_agg.py): the pushed
terms+metric aggregation returns EXACTLY the buckets a full scan +
Spark groupBy computes — the pushdown-vs-scan equivalence — plus cap
and error behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.sinks import elasticsearch as es_sink
from etl_pipeline_for_elasticsearch_json_document_spark.sources.es_agg import (
    es_composite_agg,
    es_terms_agg,
)
from tests.fake_es import start_fake_es


@pytest.fixture()
def fake_es():
    server, base_url = start_fake_es()
    yield base_url
    server.shutdown()
    server.server_close()


def _seed(spark, sf_dir, fake_es, tmp_path, index="agg_docs"):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars"
    )
    out = str(tmp_path / "bulk")
    es_sink.write_bulk_files(docs.coalesce(2), out, index, id_col="doc_id")
    es_sink.replay_bulk_files(out, fake_es)
    return docs


def test_pushed_agg_equals_scan_groupby(spark, sf_dir, fake_es, tmp_path):
    docs = _seed(spark, sf_dir, fake_es, tmp_path)
    pushed = es_terms_agg(
        spark,
        fake_es,
        "agg_docs",
        field="lang",
        metrics={
            "total_chars": ("sum", "n_chars"),
            "max_chars": ("max", "n_chars"),
            "n_vals": ("value_count", "n_chars"),
        },
    )
    scanned = docs.groupBy(F.col("lang").alias("key")).agg(
        F.count("*").alias("doc_count"),
        F.sum("n_chars").cast("double").alias("total_chars"),
        F.max("n_chars").cast("double").alias("max_chars"),
        F.count("n_chars").alias("n_vals"),
    )
    assert {tuple(r) for r in pushed.collect()} == {
        tuple(r) for r in scanned.collect()
    }


def test_terms_size_caps_buckets_by_count(spark, sf_dir, fake_es, tmp_path):
    docs = _seed(spark, sf_dir, fake_es, tmp_path)
    top2 = es_terms_agg(spark, fake_es, "agg_docs", field="lang", size=2)
    want = (
        docs.groupBy("lang")
        .count()
        .orderBy(F.col("count").desc(), "lang")
        .limit(2)
        .collect()
    )
    got = sorted(top2.collect(), key=lambda r: (-r["doc_count"], r["key"]))
    assert [(r["key"], r["doc_count"]) for r in got] == [
        (r["lang"], r["count"]) for r in want
    ]


def test_unsupported_metric_rejected(spark, fake_es):
    with pytest.raises(ValueError, match="unsupported metric"):
        es_terms_agg(
            spark, fake_es, "x", field="lang", metrics={"p": ("percentiles", "n")}
        )


def test_query_filter_applies_before_buckets(spark, sf_dir, fake_es, tmp_path):
    docs = _seed(spark, sf_dir, fake_es, tmp_path)
    pushed = es_terms_agg(
        spark, fake_es, "agg_docs", field="lang",
        metrics={"total_chars": ("sum", "n_chars")},
        query={"term": {"source": "web"}},
    )
    scanned = (
        docs.filter(F.col("source") == "web")
        .groupBy(F.col("lang").alias("key"))
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("n_chars").cast("double").alias("total_chars"),
        )
    )
    assert {tuple(r) for r in pushed.collect()} == {
        tuple(r) for r in scanned.collect()
    }


def test_unmodeled_query_shape_is_loud(spark, sf_dir, fake_es, tmp_path):
    """The fake refuses query shapes it does not model instead of
    silently aggregating everything."""
    import urllib.error

    _seed(spark, sf_dir, fake_es, tmp_path)
    with pytest.raises(urllib.error.HTTPError):
        es_terms_agg(
            spark, fake_es, "agg_docs", field="lang",
            query={"range": {"n_chars": {"gte": 100}}},
        )


def test_composite_agg_pages_through_all_groups(spark, sf_dir, fake_es, tmp_path):
    """page_size far below the group count forces the after-key cursor
    to walk multiple pages; the accumulated relation equals a scan +
    multi-key groupBy."""
    docs = _seed(spark, sf_dir, fake_es, tmp_path)
    pushed = es_composite_agg(
        spark, fake_es, "agg_docs",
        fields=["lang", "source"],
        metrics={"total_chars": ("sum", "n_chars")},
        page_size=3,
    )
    scanned = docs.groupBy(
        F.col("lang").cast("string").alias("lang"),
        F.col("source").cast("string").alias("source"),
    ).agg(
        F.count("*").alias("doc_count"),
        F.sum("n_chars").cast("double").alias("total_chars"),
    )
    assert {tuple(r) for r in pushed.collect()} == {
        tuple(r) for r in scanned.collect()
    }


def test_composite_agg_page_cap_is_loud(spark, sf_dir, fake_es, tmp_path):
    _seed(spark, sf_dir, fake_es, tmp_path)
    with pytest.raises(RuntimeError, match="scan path"):
        es_composite_agg(
            spark, fake_es, "agg_docs", fields=["lang", "source"],
            page_size=1, max_pages=2,
        )


def test_histogram_pushdown_equals_scan(spark, sf_dir, fake_es, tmp_path):
    docs = _seed(spark, sf_dir, fake_es, tmp_path)
    from etl_pipeline_for_elasticsearch_json_document_spark.sources.es_agg import (
        es_histogram_agg,
    )

    pushed = es_histogram_agg(
        spark, fake_es, "agg_docs", field="n_chars", interval=100,
        metrics={"avg_chars": ("avg", "n_chars")},
    )
    scanned = docs.groupBy(
        (F.floor(F.col("n_chars") / 100) * 100).cast("double").alias("bucket")
    ).agg(
        F.count("*").alias("doc_count"),
        F.avg("n_chars").alias("avg_chars"),
    )
    assert {tuple(r) for r in pushed.collect()} == {
        tuple(r) for r in scanned.collect()
    }
