"""Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) for
Elasticsearch search-envelope JSON files.

The reference's scanner (``ElasticSearch ETL.py:220-267``) pages
``search_after`` batches out of ES and hand-unwraps ``hits.hits[]._source``.
This DataSource makes that a first-class Spark source instead of driver
code: every envelope file is a partition (scales to a directory of
per-batch exports with one task per file), each hit becomes a row carrying
its identity/cursor fields plus the raw ``_source`` JSON. Downstream, the
document column feeds the flatten planner or ``from_json``/``parse_json``.

Usage::

    spark.dataSource.register(EsEnvelopeDataSource)
    df = spark.read.format("es_envelope").load("/path/to/envelopes")
    # columns: _index, _id, sort_ts, sort_id, source_json

Spark serializes the reader to executors, so the per-partition work (JSON
parse + yield) runs distributed; file listing happens once at planning.
A real ES-backed variant would implement ``DataSourceStreamReader`` with
``search_after`` cursors as stream offsets — the checkpointed rebuild of
the reference's hand-rolled cursor (A19); the file form below is its
replayable test double.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "_index string, _id string, sort_ts string, sort_id string, source_json string"


@dataclass
class _FilePartition(InputPartition):
    path: str


def _iter_hits(path: str):
    with open(path) as f:
        data = json.load(f)
    hits = data.get("hits", {}).get("hits", []) if isinstance(data, dict) else []
    for hit in hits:
        src = hit.get("_source", {})
        yield (
            hit.get("_index"),
            hit.get("_id"),
            # the reference's search_after cursor fields (A19)
            str(src.get("auditProcessedDateTimeUtc", "")) or None,
            str(src.get("claimRequestId", "")) or None,
            json.dumps(src),
        )


class EsEnvelopeReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("es_envelope requires a path: .load('/dir/or/file.json')")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".json")
            )
        else:
            files = [self.path]
        return [_FilePartition(p) for p in files]

    def read(self, partition):
        yield from _iter_hits(partition.path)


class EsEnvelopeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "es_envelope"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return EsEnvelopeReader(self.options)
