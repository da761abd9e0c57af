"""One-off repro: diff q22/q50/q52 Spark-vs-DuckDB at sf0.01 via pandas frames,
mirroring the driver's hash path (sort columns by name, sort rows, stringify)."""
import sys

import duckdb
import pandas as pd

from etl_pipeline_for_elasticsearch_json_document_spark.queries import all_queries
from etl_pipeline_for_elasticsearch_json_document_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

names = sys.argv[1:] or ["q22_case_when", "q50_token_stats", "q52_lang_facet"]

spark = get_spark()
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

qs = all_queries()
for name in names:
    q = qs[name]
    spdf = q.fn(spark, SF_DIR).toPandas()
    ddf = con.sql(q.oracle).df()
    for df in (spdf, ddf):
        df.sort_index(axis=1, inplace=True)
    spdf = spdf.sort_values(list(spdf.columns)).reset_index(drop=True)
    ddf = ddf.sort_values(list(ddf.columns)).reset_index(drop=True)
    print(f"=== {name}: spark {spdf.shape} {list(spdf.dtypes)}")
    print(f"=== {name}: duck  {ddf.shape} {list(ddf.dtypes)}")
    s_str = spdf.astype(str)
    d_str = ddf.astype(str)
    if s_str.equals(d_str):
        print(f"=== {name}: MATCH (string-level)")
        continue
    neq = (s_str != d_str).any(axis=1)
    print(f"=== {name}: {neq.sum()} differing rows")
    print(pd.concat([spdf[neq].head(5).add_prefix("S_"),
                     ddf[neq].head(5).add_prefix("D_")], axis=1).to_string())
