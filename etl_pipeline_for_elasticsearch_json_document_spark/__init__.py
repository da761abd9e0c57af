"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL pipeline
(Pvss2807/ETL-Pipeline-for-ElasticSearch-JSON-document).

The reference is a single-file Python/pandas pipeline that pages JSON
documents out of Elasticsearch, flattens arbitrarily nested JSON into one
wide all-string row per document, and writes per-batch TSV files plus a SQL
audit record (see SURVEY.md). This package re-expresses that capability —
and a full relational + LLM-data-pipeline operator surface — Spark-first:

- ``plans.flatten``    schema-driven flatten plan generator (the one real
                       custom component; pure DataFrame API, no custom
                       Catalyst rules)
- ``sources``          envelope unwrap, keyset-paginated scans, testdata
                       table loaders
- ``operators``        dedup (exact/MinHash-LSH/SimHash/Jaccard/embedding),
                       similarity search, text analysis, multimodal columns
- ``streaming``        Structured Streaming rebuild of the export job
- ``sinks``            TSV batch sink + job-audit log

Everything is built on public PySpark APIs only.
"""

from etl_pipeline_for_elasticsearch_json_document_spark.local import json_to_tsv_in_memory
from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import (
    flatten,
    flatten_families,
    unwrap_envelope,
    write_families,
)
from etl_pipeline_for_elasticsearch_json_document_spark.session import get_spark

__all__ = [
    "flatten",
    "flatten_families",
    "write_families",
    "unwrap_envelope",
    "get_spark",
    "json_to_tsv_in_memory",
]

__version__ = "0.1.0"
