"""Reproduce the driver's Spark-vs-DuckDB oracle comparison for named queries.

Usage: python scripts/compare_oracle.py q22_case_when q50_token_stats ...
Prints per-query row/schema/value diffs (first few differing rows).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main(names: list[str]) -> None:
    from etl_pipeline_for_elasticsearch_json_document_spark.queries import all_queries
    from etl_pipeline_for_elasticsearch_json_document_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    reg = all_queries()
    for name in names:
        q = reg[name]
        sdf = q.fn(spark, SF_DIR).toPandas()
        odf = con.execute(q.oracle).fetchdf()
        scols = sorted(sdf.columns)
        ocols = sorted(odf.columns)
        print(f"== {name}: spark {len(sdf)} rows, oracle {len(odf)} rows")
        if scols != ocols:
            print(f"  SCHEMA MISMATCH: spark={scols} oracle={ocols}")
            continue
        s = sdf[scols].sort_values(scols).reset_index(drop=True)
        o = odf[scols].sort_values(scols).reset_index(drop=True)
        s = s.astype(str)
        o = o.astype(str)
        if len(s) != len(o):
            print("  ROWCOUNT MISMATCH")
            continue
        neq = (s != o).any(axis=1)
        if not neq.any():
            print("  OK: identical after string-normalize")
            continue
        print(f"  {int(neq.sum())} differing rows; first 5:")
        for i in s.index[neq][:5]:
            for c in scols:
                if s.loc[i, c] != o.loc[i, c]:
                    print(f"    row {i} col {c}: spark={s.loc[i, c]!r} oracle={o.loc[i, c]!r}")


if __name__ == "__main__":
    main(sys.argv[1:])
