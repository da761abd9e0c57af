"""Elasticsearch source adapters.

Three tiers, matching what this environment can actually run:

1. ``read_search_response_json`` — parse ES search-response JSON files
   (the envelope shape in ``ElasticSearch_Document.json``) into one row
   per ``hits.hits[*]._source``. Works everywhere; this is how the golden
   document is consumed.
2. ``read_es_connector`` — the official ``elasticsearch-spark`` DataSource
   (``format("org.elasticsearch.spark.sql")``), used on clusters where the
   connector jar is deployed; scan pushdown and shard-parallel reads come
   from the connector.
3. ``scan_with_client`` — driver-side ``search_after`` pagination with the
   ``elasticsearch`` Python client (the reference's exact strategy,
   ``ElasticSearch ETL.py:220-267``), parallelized by handing each page to
   Spark as JSON. The official client is gated behind an import-try, but
   any duck-typed client works — in particular
   :class:`~.es_http.HttpEsClient`, the zero-dependency urllib shim, runs
   this tier end-to-end (exercised against a loopback fake cluster in
   tests/test_es_roundtrip.py).
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import unwrap_envelope

try:  # pragma: no cover - not installed in this environment
    from elasticsearch import Elasticsearch  # type: ignore

    HAS_ES_CLIENT = True
except ImportError:
    Elasticsearch = None  # type: ignore
    HAS_ES_CLIENT = False


def read_search_response_json(spark: SparkSession, path: str, multiLine: bool = True) -> DataFrame:
    """ES search-response JSON file(s) → one row per hit ``_source``."""
    return unwrap_envelope(spark.read.option("multiLine", multiLine).json(path))


def read_es_connector(
    spark: SparkSession,
    index: str,
    nodes: str = "localhost",
    port: int = 9200,
    query: Optional[str] = None,
) -> DataFrame:
    """Read via the elasticsearch-hadoop Spark connector (requires the
    connector jar on the cluster; raises AnalysisException otherwise)."""
    reader = (
        spark.read.format("org.elasticsearch.spark.sql")
        .option("es.nodes", nodes)
        .option("es.port", str(port))
    )
    if query:
        reader = reader.option("es.query", query)
    return reader.load(index)


def scan_with_client(
    spark: SparkSession,
    index: str,
    base_query: dict[str, Any],
    sort_fields: tuple[str, str] = ("auditProcessedDateTimeUtc", "claimRequestId"),
    es_client: Optional["Elasticsearch"] = None,
) -> Iterator[DataFrame]:
    """search_after pagination via the Python client, one DataFrame per
    page (reference ``fetch_and_export_documents`` source side)."""
    import copy
    import json

    if es_client is None:
        if not HAS_ES_CLIENT:
            raise NotImplementedError(
                "the `elasticsearch` client is not installed in this "
                "environment; pass es_client explicitly or use "
                "read_search_response_json / read_es_connector"
            )
        es_client = Elasticsearch()

    search_after = None
    while True:
        query = copy.deepcopy(base_query)
        if search_after:
            query["search_after"] = search_after
        result = es_client.search(index=index, body=query)
        hits = result["hits"]["hits"]
        if not hits:
            return
        sources = [hit["_source"] for hit in hits]
        yield spark.read.json(
            spark.sparkContext.parallelize([json.dumps(s) for s in sources])
        )
        last = hits[-1]["_source"]
        search_after = [last[sort_fields[0]], last[sort_fields[1]]]
