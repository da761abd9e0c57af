"""Batch export job: the reference's ``fetch_and_export_documents``
(``ElasticSearch ETL.py:201-300``) as a Spark batch pipeline.

Differences by design (documented, not accidental):
- the pagination loop pages a DataFrame with a keyset cursor predicate
  instead of HTTP calls (sources/keyset.py); at cluster scale you usually
  skip paging entirely and let one distributed write handle the whole
  batch — pagination survives for byte-level parity with the reference's
  file layout and for bounded-memory single-node runs;
- per-batch TSV naming and SUCCESS/FAILED audit rows match A16-A21;
- the flatten plan is generated once and reused across pages (same
  within-run schema union as the reference's per-call discovery, but paid
  once).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import apply_flatten_stages, flatten_stages, unwrap_envelope
from etl_pipeline_for_elasticsearch_json_document_spark.sinks.audit import AuditLog
from etl_pipeline_for_elasticsearch_json_document_spark.sinks.tsv import batch_tsv_path, write_tsv
from etl_pipeline_for_elasticsearch_json_document_spark.sources.keyset import paginate


def fetch_and_export_documents(
    spark: SparkSession,
    source: DataFrame,
    output_dir: str,
    audit_path: str,
    sort_cols: tuple[str, str] = ("auditProcessedDateTimeUtc", "claimRequestId"),
    id_col: str = "claimRequestId",
    batch_size: int = 1000,
    bug_compat: bool = False,
) -> int:
    """Export ``source`` documents as flattened per-batch TSVs + audit row.
    Returns the number of documents exported."""
    start_ts = datetime.datetime.now(datetime.timezone.utc)
    batch_id = start_ts.strftime("%Y%m%d%H%M%S")  # A21 run-id scheme
    audit = AuditLog(spark, audit_path)
    try:
        docs = unwrap_envelope(source)
        total = docs.count()  # A1 count
        # Staged cascade (r5): one plan generation for the whole export,
        # ~1 s less per-batch action overhead on 5k-column documents
        stages = flatten_stages(docs, bug_compat=bug_compat)
        exported = 0
        for page, cursor in paginate(docs, sort_cols, batch_size):
            flat = apply_flatten_stages(page, stages)
            n = page.count()
            if n == 0:  # A18 guard
                continue
            last_id = page.agg(F.max(id_col)).first()[0]
            write_tsv(flat, batch_tsv_path(output_dir, last_id), coalesce=1)
            exported += n
        audit.success(start_ts, batch_id=batch_id, record_count=total)
        return exported
    except Exception as e:
        audit.failure(start_ts, batch_id=batch_id, error=e)
        raise
