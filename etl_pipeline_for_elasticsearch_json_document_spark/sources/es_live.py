"""Distributed LIVE Elasticsearch scan: a Python DataSource whose
partitions are ES slices, each paged by ``search_after`` on an executor.

The reference's scan (``ElasticSearch ETL.py:220-267``) is a sequential
driver-side ``search_after`` loop — one cursor, one page in flight, every
document funneled through one process. That shape is kept (faithfully)
in ``sources/keyset.py`` / ``sources/elasticsearch.py::scan_with_client``
for export pagination; THIS source is its 100 TB form: the index is
partitioned with ES's native ``slice: {id, max}`` request parameter (the
same mechanism the official elasticsearch-hadoop connector and sliced
scrolls use), one Spark input partition per slice, and each executor task
runs its own independent keyset loop over its slice via the
zero-dependency :class:`~.es_http.HttpEsClient`. No driver involvement in
the data path, N concurrent cursors, linear speedup until the cluster
caps out::

    spark.dataSource.register(EsLiveDataSource)
    df = (spark.read.format("es_live")
          .option("url", "http://es-host:9200")
          .option("index", "claims")
          .option("slices", 16)
          .option("sort", "auditProcessedDateTimeUtc,claimRequestId")
          .load())
    # columns: _index, _id, sort_json, source_json

``source_json`` feeds the flatten planner exactly like the envelope
reader's column; byte-parity of the two paths is pinned in
tests/test_es_live.py.

Operational notes for a real cluster: ES requires ``slice`` on a
point-in-time or scroll context for strict snapshot isolation — the
request body here carries the identical shape, so wiring a PIT id in is
one extra option; the loopback fake accepts ``slice`` on plain
``_search``. Each slice's ``search_after`` cursor restarts independently,
so a failed/speculated task re-reads only its own slice (idempotent:
hits are keyed by ``_id``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from etl_pipeline_for_elasticsearch_json_document_spark.sources.es_http import HttpEsClient

SCHEMA = "_index string, _id string, sort_json string, source_json string"


@dataclass
class _SlicePartition(InputPartition):
    slice_id: int
    n_slices: int


class EsLiveReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.url = options.get("url")
        if not self.url:
            raise ValueError("es_live requires .option('url', 'http://host:9200')")
        self.index = options.get("index")
        if not self.index:
            raise ValueError("es_live requires .option('index', <es index name>)")
        self.n_slices = int(options.get("slices", "1"))
        if self.n_slices < 1:
            raise ValueError("slices must be >= 1")
        self.page_size = int(options.get("page_size", "1000"))
        self.sort_fields = [
            s.strip()
            for s in options.get("sort", "auditProcessedDateTimeUtc,claimRequestId").split(",")
            if s.strip()
        ]
        self.query = json.loads(options.get("query", '{"match_all": {}}'))

    def partitions(self):
        # one Spark task per ES slice — the unit of read parallelism
        return [_SlicePartition(i, self.n_slices) for i in range(self.n_slices)]

    def read(self, partition: _SlicePartition):
        # executor-side: an independent search_after loop over ONE slice.
        # The client is constructed here (per task), never serialized.
        client = HttpEsClient(self.url)
        base = {
            "query": self.query,
            "sort": [{f: "asc"} for f in self.sort_fields],
            "size": self.page_size,
        }
        if partition.n_slices > 1:
            base["slice"] = {"id": partition.slice_id, "max": partition.n_slices}
        after = None
        while True:
            body = dict(base)
            if after is not None:
                body["search_after"] = after
            hits = client.search(index=self.index, body=body)["hits"]["hits"]
            if not hits:
                return
            for hit in hits:
                yield (
                    hit.get("_index"),
                    str(hit.get("_id")) if hit.get("_id") is not None else None,
                    json.dumps(hit.get("sort")),
                    json.dumps(hit.get("_source")),
                )
            after = hits[-1]["sort"]
            if len(hits) < self.page_size:
                return


class EsLiveDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "es_live"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> EsLiveReader:
        return EsLiveReader(self.options)
