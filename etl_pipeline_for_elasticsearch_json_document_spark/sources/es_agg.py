"""Source-side aggregation pushdown: ship the groupBy to the cluster.

The reference pushes exactly one aggregate to Elasticsearch — COUNT
(`ElasticSearch ETL.py:214`: ``ES.count(...)["count"]``) — and computes
nothing else source-side. This operator generalizes that idea to the ES
aggregations DSL: a ``terms`` bucket aggregation with metric sub-aggs
(sum/avg/min/max/value_count) runs ON the cluster, and only the
bucket relation — |buckets| rows, not |documents| — crosses the wire
into a DataFrame.

When to push vs scan: pushing wins when the bucket cardinality is small
relative to the corpus (the usual facet/rollup shape) and the cluster
has capacity; scanning into parquet (sources/es_live.py) wins when many
different aggregations will run over the same data. The parity of the
two paths is pinned in tests/test_es_agg.py — same buckets either way.

Driver-boundedness: the single ``_search`` call returns at most
``size`` buckets (ES's own cap per terms agg), so this is a plan-time
bounded fetch exactly like the keyset page reads (sources/keyset.py) —
the corpus itself never flows through the driver. For >size-bucket
group-bys, use the scan path; composite-agg pagination is the ES-side
extension point (same response shape, cursored).
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_for_elasticsearch_json_document_spark.sources.es_http import HttpEsClient

#: metric name -> Spark SQL type of the returned value column
_METRICS = {"sum": "double", "avg": "double", "min": "double", "max": "double",
            "value_count": "long"}


def es_terms_agg(
    spark: SparkSession,
    base_url: str,
    index: str,
    field: str,
    metrics: Optional[dict[str, tuple[str, str]]] = None,
    size: int = 1000,
    query: Optional[dict[str, Any]] = None,
) -> DataFrame:
    """Terms aggregation on ``field`` pushed to ES; returns a DataFrame
    ``(key string, doc_count long, <metric columns...>)``.

    ``metrics`` maps an output column to ``(agg_type, field)``, e.g.
    ``{"total": ("sum", "amount"), "peak": ("max", "amount")}``.
    """
    metrics = metrics or {}
    for name, (mtype, _) in metrics.items():
        if mtype not in _METRICS:
            raise ValueError(f"unsupported metric {mtype!r} for {name!r}")
    body: dict[str, Any] = {
        "size": 0,
        "aggs": {
            "g": {
                "terms": {"field": field, "size": size},
                **(
                    {
                        "aggs": {
                            name: {mtype: {"field": mfield}}
                            for name, (mtype, mfield) in metrics.items()
                        }
                    }
                    if metrics
                    else {}
                ),
            }
        },
    }
    if query is not None:
        body["query"] = query
    resp = HttpEsClient(base_url).search(index, body)
    buckets = resp["aggregations"]["g"]["buckets"]
    def coerce(name: str, v):
        if v is None:
            return None
        # ES renders integral sums/extrema as ints; our schema is typed
        return float(v) if _METRICS[metrics[name][0]] == "double" else int(v)

    rows = [
        tuple(
            [str(b["key"]), int(b["doc_count"])]
            + [coerce(name, b[name]["value"]) for name in metrics]
        )
        for b in buckets
    ]
    schema = "key string, doc_count long" + "".join(
        f", {name} {_METRICS[mtype]}" for name, (mtype, _) in metrics.items()
    )
    return spark.createDataFrame(rows, schema)


def es_composite_agg(
    spark: SparkSession,
    base_url: str,
    index: str,
    fields: list[str],
    metrics: Optional[dict[str, tuple[str, str]]] = None,
    page_size: int = 500,
    max_pages: int = 10_000,
) -> DataFrame:
    """Multi-key group-by pushed down via ES *composite* aggregation —
    the UNBOUNDED-cardinality path ``es_terms_agg`` documents as its
    extension point: buckets stream out in after-key-cursored pages
    (exactly the keyset discipline of sources/keyset.py, applied to
    groups instead of documents), so the bucket count never has to fit
    one response.

    Returns ``(<field columns...> string, doc_count long,
    <metric columns...>)``. Each page is a bounded driver fetch; the
    accumulated relation is |groups| rows. ``max_pages`` is the runaway
    guard — a group-by whose cardinality approaches the corpus size
    should be a scan (sources/es_live.py), not a pushdown; that is a
    query-planning decision, and this cap makes the wrong choice loud
    instead of slow.
    """
    metrics = metrics or {}
    for name, (mtype, _) in metrics.items():
        if mtype not in _METRICS:
            raise ValueError(f"unsupported metric {mtype!r} for {name!r}")
    client = HttpEsClient(base_url)
    sources = [{f: {"terms": {"field": f}}} for f in fields]
    rows: list[tuple] = []
    after: Optional[dict[str, Any]] = None
    for _ in range(max_pages):
        comp: dict[str, Any] = {"sources": sources, "size": page_size}
        if after is not None:
            comp["after"] = after
        body: dict[str, Any] = {
            "size": 0,
            "aggs": {
                "g": {
                    "composite": comp,
                    **(
                        {
                            "aggs": {
                                name: {mtype: {"field": mfield}}
                                for name, (mtype, mfield) in metrics.items()
                            }
                        }
                        if metrics
                        else {}
                    ),
                }
            },
        }
        resp = client.search(index, body)
        agg = resp["aggregations"]["g"]
        for b in agg["buckets"]:
            vals = []
            for name in metrics:
                v = b[name]["value"]
                if v is not None:
                    v = float(v) if _METRICS[metrics[name][0]] == "double" else int(v)
                vals.append(v)
            rows.append(
                tuple([str(b["key"][f]) for f in fields] + [int(b["doc_count"])] + vals)
            )
        after = agg.get("after_key")
        if after is None:
            break
    else:
        raise RuntimeError(
            f"composite agg exceeded {max_pages} pages — this group-by's "
            "cardinality wants the scan path, not a pushdown"
        )
    schema = (
        ", ".join(f"{f} string" for f in fields)
        + ", doc_count long"
        + "".join(f", {name} {_METRICS[mtype]}" for name, (mtype, _) in metrics.items())
    )
    return spark.createDataFrame(rows, schema)


def es_histogram_agg(
    spark: SparkSession,
    base_url: str,
    index: str,
    field: str,
    interval: float,
    metrics: Optional[dict[str, tuple[str, str]]] = None,
) -> DataFrame:
    """Numeric histogram pushed to ES: fixed-``interval`` buckets keyed by
    ``floor(value/interval)*interval`` (ES's own bucket key), with the
    same metric sub-aggs as :func:`es_terms_agg`. Returns
    ``(bucket double, doc_count long, <metrics...>)`` — the distribution
    sketch (q79's histogram shape) computed where the data lives; only
    range/interval buckets cross the wire."""
    metrics = metrics or {}
    for name, (mtype, _) in metrics.items():
        if mtype not in _METRICS:
            raise ValueError(f"unsupported metric {mtype!r} for {name!r}")
    body: dict[str, Any] = {
        "size": 0,
        "aggs": {
            "g": {
                "histogram": {"field": field, "interval": interval},
                **(
                    {
                        "aggs": {
                            name: {mtype: {"field": mfield}}
                            for name, (mtype, mfield) in metrics.items()
                        }
                    }
                    if metrics
                    else {}
                ),
            }
        },
    }
    resp = HttpEsClient(base_url).search(index, body)
    rows = []
    for b in resp["aggregations"]["g"]["buckets"]:
        vals = []
        for name in metrics:
            v = b[name]["value"]
            if v is not None:
                v = float(v) if _METRICS[metrics[name][0]] == "double" else int(v)
            vals.append(v)
        rows.append(tuple([float(b["key"]), int(b["doc_count"])] + vals))
    schema = "bucket double, doc_count long" + "".join(
        f", {name} {_METRICS[mtype]}" for name, (mtype, _) in metrics.items()
    )
    return spark.createDataFrame(rows, schema)
