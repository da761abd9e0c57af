"""Local replica of the driver's t2 correctness gate: run every registered
query on Spark AND its DuckDB oracle at sf0.001, compare row count, column
names, and an order-insensitive multiset of stringified rows."""

from __future__ import annotations

import math

import duckdb
import pytest

from etl_pipeline_for_elasticsearch_json_document_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and floating noise already handled by query-side round
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    return str(v)


def row_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in idx) for r in rows)


QUERIES = all_queries()
ORACLED = [n for n, q in sorted(QUERIES.items()) if q.oracle]
ROWS_ONLY = [n for n, q in sorted(QUERIES.items()) if not q.oracle]


@pytest.mark.parametrize("name", ORACLED)
def test_query_vs_oracle(spark, duck, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(q.oracle)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sm = row_multiset(s_cols, s_rows)
    dm = row_multiset(d_cols, d_rows)
    if sm != dm:
        diff = [(a, b) for a, b in zip(sm, dm) if a != b][:5]
        pytest.fail(f"{name}: value mismatch, e.g. {diff}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_DIR)
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns == sorted(df.columns)
