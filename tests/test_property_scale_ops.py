"""Property tests for the r10 scale operators: for ANY small dataset,
ANY k / salt count / chunk width, (a) per_key_topk equals the naive
bounded-key window row-for-row including ranks, and (b)
grouped_prefix_sum equals the naive per-group cumsum — salting and
chunking must be semantically invisible, including under negative
order values, ties on the order column, and chunk widths of 1."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_for_elasticsearch_json_document_spark.operators.sampling import (
    grouped_prefix_sum,
    per_key_topk,
)

# few keys + narrow value range => dense groups with plenty of ties
_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),           # group key
        st.integers(min_value=-20, max_value=20),   # order / score value
        st.integers(min_value=0, max_value=9),      # summed value
    ),
    min_size=1,
    max_size=25,
)


def _df(spark, rows):
    # unique rid = the tiebreak every ranking contract requires
    return spark.createDataFrame(
        [(g, v, w, i) for i, (g, v, w) in enumerate(rows)],
        "g string, v long, w long, rid long",
    )


@settings(max_examples=8, deadline=None)
@given(rows=_rows, k=st.integers(1, 6), n_salts=st.integers(1, 5))
def test_per_key_topk_equals_window(spark, rows, k, n_salts):
    df = _df(spark, rows)
    w = Window.partitionBy("g").orderBy("v", "rid")
    naive = (
        df.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
    fast = per_key_topk(df, ["g"], ["v", "rid"], k, n_salts, rank_col="rank")
    cols = ["g", "v", "w", "rid", "rank"]
    assert sorted(map(tuple, naive.select(cols).collect())) == sorted(
        map(tuple, fast.select(cols).collect())
    )


@settings(max_examples=8, deadline=None)
@given(rows=_rows, width=st.integers(1, 9), inclusive=st.booleans())
def test_grouped_prefix_sum_equals_window(spark, rows, width, inclusive):
    df = _df(spark, rows)
    lo, hi = (0, 0) if inclusive else (0, -1)
    w = (
        Window.partitionBy("g")
        .orderBy("v", "rid")
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    run = F.sum("w").over(w)
    if not inclusive:
        run = F.coalesce(run, F.lit(0))
    naive = df.withColumn("run", run)
    fast = grouped_prefix_sum(
        df, "g", "v", "w", "run", chunk_width=width,
        inclusive=inclusive, tiebreak_cols=["rid"],
    )
    cols = ["g", "v", "w", "rid", "run"]
    assert sorted(map(tuple, naive.select(cols).collect())) == sorted(
        map(tuple, fast.select(cols).collect())
    )
