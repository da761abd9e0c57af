"""Elasticsearch mapping → Spark schema discovery.

The reference never declares a schema: it discovers structure by
recursively walking each fetched document (``ElasticSearch ETL.py``'s
flatten loop), which means the schema is only as complete as the batch
at hand. Elasticsearch itself already knows the full field-type map of
an index — ``GET /{index}/_mapping`` — and this module turns that
mapping into a Spark ``StructType``, so scans can parse ``_source``
into TYPED columns up front (predicate pushdown and column pruning then
apply to the parsed relation) instead of string-wrangling JSON per row.

Type map (the same choices the public elasticsearch-hadoop connector
makes, re-derived for from_json parsing):

    keyword/text/ip/wildcard  → string        long      → long
    integer                   → int           short     → short
    byte                      → byte          double    → double
    float/half_float          → float         scaled_float → double
    boolean                   → boolean       date      → timestamp
    binary                    → binary        object    → struct (recursed)
    nested                    → array<struct> (ES nested IS an object array)

ES quirk handled explicitly: mappings carry NO array information — any
field may hold one value or a list of them. ``array_fields`` lets the
caller wrap known-multivalued paths (dotted for depth) in ``ArrayType``;
everything else parses as scalar, which matches ES's own single-value
reads.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCALARS: dict[str, T.DataType] = {
    "keyword": T.StringType(),
    "text": T.StringType(),
    "ip": T.StringType(),
    "wildcard": T.StringType(),
    "constant_keyword": T.StringType(),
    "long": T.LongType(),
    "integer": T.IntegerType(),
    "short": T.ShortType(),
    "byte": T.ByteType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "half_float": T.FloatType(),
    "scaled_float": T.DoubleType(),
    "unsigned_long": T.DecimalType(20, 0),
    "boolean": T.BooleanType(),
    "date": T.TimestampType(),
    "binary": T.BinaryType(),
}


def _field_type(
    spec: dict[str, Any], path: str, array_fields: set[str]
) -> T.DataType:
    es_type = spec.get("type")
    if es_type == "nested":
        # ES 'nested' is by definition an array of objects
        return T.ArrayType(
            _struct_of(spec.get("properties", {}), path, array_fields)
        )
    if es_type is None and "properties" in spec:
        dt: T.DataType = _struct_of(spec["properties"], path, array_fields)
    elif es_type in _SCALARS:
        dt = _SCALARS[es_type]
    else:
        # forward-compatible: unknown types (search_as_you_type, ranges,
        # geo_*) degrade to their JSON string form rather than failing
        dt = T.StringType()
    if path in array_fields:
        return T.ArrayType(dt)
    return dt


def _struct_of(
    properties: dict[str, Any], prefix: str, array_fields: set[str]
) -> T.StructType:
    fields = []
    for name in sorted(properties):  # deterministic column order
        path = f"{prefix}.{name}" if prefix else name
        fields.append(
            T.StructField(path.rsplit(".", 1)[-1],
                          _field_type(properties[name], path, array_fields))
        )
    return T.StructType(fields)


def mapping_to_schema(
    mapping: dict[str, Any], array_fields: Iterable[str] = ()
) -> T.StructType:
    """Convert one index's ``_mapping`` response (or its ``mappings``
    sub-dict, or bare ``properties``) into a ``StructType``.

    Accepts any of the envelope shapes ES returns:
    ``{index: {"mappings": {"properties": ...}}}``,
    ``{"mappings": {"properties": ...}}``, or ``{"properties": ...}``.
    """
    body = mapping
    if "properties" not in body and "mappings" not in body and len(body) == 1:
        body = next(iter(body.values()))  # strip the index-name envelope
    if "mappings" in body:
        body = body["mappings"]
    properties = body.get("properties", {})
    return _struct_of(properties, "", set(array_fields))


def discover_schema(
    client: Any, index: str, array_fields: Iterable[str] = ()
) -> T.StructType:
    """Fetch ``GET /{index}/_mapping`` via the client and convert it."""
    return mapping_to_schema(client.mapping(index), array_fields)


def scan_typed(
    spark: Any,
    url: str,
    index: str,
    array_fields: Iterable[str] = (),
    **scan_options: str,
) -> DataFrame:
    """One-call typed live scan: discover the index's mapping, run the
    sliced ``es_live`` scan, and parse ``source_json`` into typed columns
    — the reader a user of the reference actually wants ("give me this
    index as a typed DataFrame"). ``scan_options`` pass through to the
    es_live DataSource (``slices``, ``pit``, ``page_size``, ``sort``...).
    """
    from etl_pipeline_for_elasticsearch_json_document_spark.sources.es_http import (
        HttpEsClient,
    )
    from etl_pipeline_for_elasticsearch_json_document_spark.sources.es_live import (
        EsLiveDataSource,
    )

    schema = discover_schema(HttpEsClient(url), index, array_fields)
    spark.dataSource.register(EsLiveDataSource)
    reader = spark.read.format("es_live").option("url", url).option("index", index)
    for k, v in scan_options.items():
        reader = reader.option(k, v)
    return typed_source(reader.load(), schema)


def typed_source(
    df: DataFrame,
    schema: T.StructType,
    source_col: str = "source_json",
    keep: Iterable[str] = ("_index", "_id"),
) -> DataFrame:
    """Parse a scan's raw ``_source`` JSON column into typed top-level
    columns using the discovered schema — one JVM-side ``from_json``,
    no Python in the loop. Keeps the hit-metadata columns listed in
    ``keep`` (those present) in front of the parsed fields."""
    kept = [c for c in keep if c in df.columns]
    parsed = df.withColumn("_parsed", F.from_json(F.col(source_col), schema))
    return parsed.select(*kept, "_parsed.*")
