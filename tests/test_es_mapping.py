"""ES mapping → Spark schema: the static type map on a hand-written
real-ES mapping, envelope tolerance, array overrides, and the live path
(fake-ES dynamic mapping → discover_schema → typed from_json parse)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_for_elasticsearch_json_document_spark.sources.es_http import HttpEsClient
from etl_pipeline_for_elasticsearch_json_document_spark.sources.es_mapping import (
    discover_schema,
    mapping_to_schema,
    typed_source,
)

# the shape GET /idx/_mapping actually returns, with one of everything
REAL_MAPPING = {
    "articles": {
        "mappings": {
            "properties": {
                "title": {
                    "type": "text",
                    "fields": {"keyword": {"type": "keyword", "ignore_above": 256}},
                },
                "views": {"type": "long"},
                "score": {"type": "scaled_float", "scaling_factor": 100},
                "rating": {"type": "half_float"},
                "published": {"type": "date"},
                "active": {"type": "boolean"},
                "ip": {"type": "ip"},
                "geo": {"type": "geo_point"},  # unknown → string passthrough
                "author": {
                    "properties": {
                        "name": {"type": "keyword"},
                        "age": {"type": "integer"},
                    }
                },
                "comments": {
                    "type": "nested",
                    "properties": {
                        "user": {"type": "keyword"},
                        "stars": {"type": "byte"},
                    },
                },
            }
        }
    }
}


def test_mapping_to_schema_type_map():
    s = mapping_to_schema(REAL_MAPPING)
    by_name = {f.name: f.dataType for f in s.fields}
    assert by_name["title"] == T.StringType()
    assert by_name["views"] == T.LongType()
    assert by_name["score"] == T.DoubleType()  # scaled_float stores a double
    assert by_name["rating"] == T.FloatType()
    assert by_name["published"] == T.TimestampType()
    assert by_name["active"] == T.BooleanType()
    assert by_name["ip"] == T.StringType()
    assert by_name["geo"] == T.StringType()  # graceful unknown-type fallback
    author = by_name["author"]
    assert isinstance(author, T.StructType)
    assert {f.name: f.dataType for f in author.fields} == {
        "age": T.IntegerType(),
        "name": T.StringType(),
    }
    comments = by_name["comments"]
    assert isinstance(comments, T.ArrayType)  # nested IS an object array
    assert isinstance(comments.elementType, T.StructType)
    # deterministic (sorted) column order
    assert [f.name for f in s.fields] == sorted(f.name for f in s.fields)


def test_envelope_tolerance_and_array_override():
    inner = REAL_MAPPING["articles"]["mappings"]
    assert mapping_to_schema(REAL_MAPPING) == mapping_to_schema(inner)
    assert mapping_to_schema(REAL_MAPPING) == mapping_to_schema(
        {"properties": inner["properties"]}
    )
    # mappings carry no array info: the caller declares multivalued paths
    s = mapping_to_schema(REAL_MAPPING, array_fields=["views", "author.name"])
    by_name = {f.name: f.dataType for f in s.fields}
    assert by_name["views"] == T.ArrayType(T.LongType())
    author = {f.name: f.dataType for f in by_name["author"].fields}
    assert author["name"] == T.ArrayType(T.StringType())


def test_discover_and_parse_live(spark, tmp_path):
    """Round trip against the fake cluster: bulk docs in, dynamic mapping
    out, _source parsed into typed columns by the discovered schema."""
    from etl_pipeline_for_elasticsearch_json_document_spark.sinks import (
        elasticsearch as es_sink,
    )
    from tests.fake_es import start_fake_es

    server, base_url = start_fake_es()
    try:
        docs = spark.createDataFrame(
            [
                (1, "alpha", 3.5, True, {"city": "x", "zip": 7}),
                (2, "beta", 1.25, False, {"city": "y", "zip": 9}),
            ],
            "doc_id long, name string, score double, ok boolean, "
            "addr struct<city string, zip long>",
        )
        out = str(tmp_path / "bulk")
        es_sink.write_bulk_files(docs.coalesce(1), out, "typed_docs", id_col="doc_id")
        es_sink.replay_bulk_files(out, base_url)

        client = HttpEsClient(base_url)
        schema = discover_schema(client, "typed_docs")
        by_name = {f.name: f.dataType for f in schema.fields}
        assert by_name["doc_id"] == T.LongType()
        assert by_name["name"] == T.StringType()
        assert by_name["score"] == T.FloatType()  # JSON decimal → float
        assert by_name["ok"] == T.BooleanType()
        assert isinstance(by_name["addr"], T.StructType)

        # scan envelope (as es_live/es_tail emit it) → typed columns
        raw = docs.select(
            F.col("doc_id").cast("string").alias("_id"),
            F.to_json(F.struct("doc_id", "name", "score", "ok", "addr")).alias(
                "source_json"
            ),
        )
        typed = typed_source(raw, schema)
        assert typed.columns == ["_id", "addr", "doc_id", "name", "ok", "score"]
        assert dict(typed.dtypes)["score"] == "float"
        rows = {r["doc_id"]: r for r in typed.collect()}
        assert rows[1]["addr"]["zip"] == 7 and rows[2]["name"] == "beta"
    finally:
        server.shutdown()
        server.server_close()


def test_scan_typed_one_call(spark, tmp_path):
    """scan_typed = discover mapping + sliced live scan + typed parse in
    one call — the index arrives as a typed DataFrame."""
    from etl_pipeline_for_elasticsearch_json_document_spark.sinks import (
        elasticsearch as es_sink,
    )
    from etl_pipeline_for_elasticsearch_json_document_spark.sources.es_mapping import (
        scan_typed,
    )
    from tests.fake_es import start_fake_es

    server, base_url = start_fake_es()
    try:
        docs = spark.createDataFrame(
            [(i, f"name-{i}", float(i) / 4, i % 2 == 0) for i in range(37)],
            "doc_id long, name string, score double, ok boolean",
        )
        out = str(tmp_path / "bulk")
        es_sink.write_bulk_files(docs.coalesce(1), out, "typed_scan", id_col="doc_id")
        es_sink.replay_bulk_files(out, base_url)

        typed = scan_typed(
            spark, base_url, "typed_scan", slices="3", sort="doc_id", page_size="16"
        )
        assert set(typed.columns) == {"_index", "_id", "doc_id", "name", "score", "ok"}
        dt = dict(typed.dtypes)
        assert dt["doc_id"] == "bigint" and dt["ok"] == "boolean"
        rows = {r["doc_id"]: (r["name"], r["ok"]) for r in typed.collect()}
        assert len(rows) == 37
        assert rows[6] == ("name-6", True) and rows[7] == ("name-7", False)
    finally:
        server.shutdown()
        server.server_close()
