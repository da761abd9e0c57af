from etl_pipeline_for_elasticsearch_json_document_spark.queries.registry import (
    REGISTRY,
    Query,
    all_queries,
    query,
)

__all__ = ["REGISTRY", "Query", "all_queries", "query"]
