"""Command-line entry point — the analog of running the reference script
(``python "ElasticSearch ETL.py"``, ``ElasticSearch ETL.py:306-317``):

    python -m etl_pipeline_for_elasticsearch_json_document_spark \\
        INPUT_JSON OUTPUT_DIR [--audit PATH] [--batch-size N] [--bug-compat]

INPUT_JSON is an ES search-response envelope (or bare documents) as
JSON/JSONL; the job unwraps, flattens (one generated Catalyst select),
writes per-batch TSVs named ``rta_claim_headers_{lastId}_{utcTs}`` and a
SUCCESS/FAILED audit row — the reference's E1 flow end to end.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m etl_pipeline_for_elasticsearch_json_document_spark",
        description="Flatten ES-envelope JSON documents to per-batch TSV + audit log.",
    )
    ap.add_argument("input", help="envelope/JSONL input path (file or directory)")
    ap.add_argument("output_dir", help="directory for per-batch TSV exports")
    ap.add_argument("--audit", default=None, help="audit-table path (default: OUTPUT_DIR/_audit)")
    ap.add_argument("--batch-size", type=int, default=1000)
    ap.add_argument("--sort-col", default="claimRequestId",
                    help="total-order/cursor column (reference: claimRequestId)")
    ap.add_argument("--bug-compat", action="store_true",
                    help="byte-compatible output incl. the reference's parser quirks")
    args = ap.parse_args(argv)

    from etl_pipeline_for_elasticsearch_json_document_spark.jobs import (
        fetch_and_export_documents,
    )
    from etl_pipeline_for_elasticsearch_json_document_spark.session import get_spark

    spark = get_spark("etl-pipeline-export")
    # Try line-delimited FIRST: JSONL read in multiLine mode silently
    # parses only the first object (no error — data loss), while a
    # pretty-printed envelope read line-delimited fails LOUDLY with a
    # _corrupt_record column — so this order detects both formats safely.
    src = spark.read.json(args.input)
    if not src.columns or set(src.columns) == {"_corrupt_record"}:
        src = spark.read.option("multiLine", True).json(args.input)
    n = fetch_and_export_documents(
        spark,
        src,
        args.output_dir,
        audit_path=args.audit or f"{args.output_dir}/_audit",
        sort_cols=(args.sort_col,),
        id_col=args.sort_col,
        batch_size=args.batch_size,
        bug_compat=args.bug_compat,
    )
    print(f"exported {n} documents to {args.output_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
