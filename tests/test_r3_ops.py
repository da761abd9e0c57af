"""Unit tests for the round-3 batch-2 operators: overlapping chunking,
count-min sketch, scalar quantization, dedup weights, SCD2 intervals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.operators import sketches, similarity, text


def _words(n):
    return " ".join(f"w{i}" for i in range(n))


@pytest.fixture(scope="module")
def chunk_df(spark):
    rows = [
        (0, _words(10)),  # < window: single chunk
        (1, _words(64)),  # == window: single chunk
        (2, _words(65)),  # window + 1: two chunks
        (3, _words(200)),  # several chunks
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_overlapping_chunks_counts_and_coverage(chunk_df):
    out = (
        chunk_df.select(
            "doc_id",
            F.explode(text.overlapping_chunks(F.col("text"), window=64, stride=48)).alias("c"),
        )
        .select("doc_id", "c.*")
        .collect()
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[0]) == 1 and by_doc[0][0]["n_words"] == 10
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_words"] == 64
    # 65 words: ceil((65-64)/48)+1 = 2 chunks; second covers words 49..65
    assert len(by_doc[2]) == 2
    assert by_doc[2][1]["start_word"] == 49 and by_doc[2][1]["n_words"] == 17
    # 200 words: ceil(136/48)+1 = 4 chunks; tail reached, every word covered
    c3 = sorted(by_doc[3], key=lambda r: r["chunk_idx"])
    assert len(c3) == 4
    assert c3[-1]["start_word"] + c3[-1]["n_words"] - 1 == 200
    # consecutive chunks overlap by window - stride = 16 words
    assert c3[1]["start_word"] == 49 and c3[0]["n_words"] == 64
    # chunk text round-trips the right slice
    assert c3[1]["chunk"].split(" ")[0] == "w48"  # 1-based word 49 == w48


def test_count_min_overestimates_only_and_is_mergeable(spark):
    rows = [(w,) for w in ["a"] * 50 + ["b"] * 20 + [f"x{i}" for i in range(100)]]
    df = spark.createDataFrame(rows, "w string")
    sk = sketches.count_min_build(df, "w", depth=4, width=16)
    assert sk.count() <= 4 * 16
    items = spark.createDataFrame([("a",), ("b",), ("x0",)], "w string")
    est = {
        r["item"]: r["est"]
        for r in sketches.count_min_estimate(sk, items, "w", depth=4, width=16).collect()
    }
    assert est["a"] >= 50 and est["b"] >= 20 and est["x0"] >= 1
    # merge of two half-sketches == sketch of the union (associative counts)
    h1, h2 = df.randomSplit([0.5, 0.5], seed=7)
    merged = (
        sketches.count_min_build(h1, "w", depth=4, width=16)
        .unionByName(sketches.count_min_build(h2, "w", depth=4, width=16))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = {(r["d"], r["bucket"]): r["cnt"] for r in sk.collect()}
    assert {(r["d"], r["bucket"]): r["cnt"] for r in merged.collect()} == full


def test_scalar_quantize_bounds_and_codes(spark):
    rows = [
        (0, [0.0, 1.0, -1.0]),
        (1, [0.5, 0.5, 0.0]),
        (2, [1.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in similarity.scalar_quantize(df, levels=255).collect()}
    # codes span [0, 255]; extremes hit the rails exactly
    assert out[0]["codes"][0] == 0 and out[2]["codes"][0] == 255
    assert out[0]["codes"][2] == 0 and out[2]["codes"][2] == 255
    # max reconstruction error bounded by half a quantization step per dim
    for r in out.values():
        # half a quantization step per dim, plus the output's round-to-6
        assert r["max_abs_err"] <= (2.0 / 255) / 2 + 1e-6
        assert float(r["sum_abs_err"]) >= 0


def test_scalar_quantize_error_independent_of_partitioning(spark):
    import random

    rnd = random.Random(3)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(1)
    df8 = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(8)
    a = {r["vec_id"]: (r["codes"], r["sum_abs_err"]) for r in similarity.scalar_quantize(df1).collect()}
    b = {r["vec_id"]: (r["codes"], r["sum_abs_err"]) for r in similarity.scalar_quantize(df8).collect()}
    assert a == b


def test_dedup_weights_preserve_probability_mass(spark, sf_dir):
    from etl_pipeline_for_elasticsearch_json_document_spark.queries import all_queries

    out = all_queries()["q109_dedup_weights"].fn(spark, sf_dir)
    agg = out.agg(
        F.count("*").alias("docs"),
        F.round(F.sum("weight"), 2).alias("mass"),
        F.sum(F.when(F.col("is_keeper"), 1).otherwise(0)).alias("keepers"),
    ).collect()[0]
    # sum of weights == number of distinct contents == number of keepers
    assert agg["mass"] == float(agg["keepers"])
    assert agg["keepers"] <= agg["docs"]


def test_scd2_intervals_are_contiguous_per_key(spark, sf_dir):
    from etl_pipeline_for_elasticsearch_json_document_spark.queries import all_queries

    rows = all_queries()["q108_scd2"].fn(spark, sf_dir).collect()
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    for cust, rs in by_cust.items():
        rs.sort(key=lambda r: r["valid_from_us"])
        # exactly one open (current) interval per key, and it is the last
        assert [r["is_current"] for r in rs].count(True) == 1
        assert rs[-1]["is_current"] and rs[-1]["valid_to_us"] is None
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]


def test_overlapping_chunks_properties(spark):
    """Property check across lengths 1..300: full coverage (every word in
    >=1 chunk), correct chunk count, exact overlap of window-stride words
    between consecutive chunks, and tail chunk reaching the last word."""
    window, stride = 64, 48
    rows = [(n, _words(n)) for n in list(range(1, 70)) + [95, 111, 112, 113, 160, 300]]
    df = spark.createDataFrame(rows, "n long, text string")
    out = (
        df.select(
            "n",
            F.explode(text.overlapping_chunks(F.col("text"), window, stride)).alias("c"),
        )
        .select("n", "c.*")
        .collect()
    )
    by_n = {}
    for r in out:
        by_n.setdefault(r["n"], []).append(r)
    for n, rs in by_n.items():
        rs.sort(key=lambda r: r["chunk_idx"])
        expected = 1 if n <= window else -(-(n - window) // stride) + 1
        assert len(rs) == expected, (n, len(rs), expected)
        assert rs[0]["start_word"] == 1
        assert rs[-1]["start_word"] + rs[-1]["n_words"] - 1 == n  # tail covered
        for a, b in zip(rs, rs[1:]):
            assert b["start_word"] - a["start_word"] == stride
            # every non-final chunk is full-width, so consecutive chunks
            # always overlap by exactly window - stride words
            assert a["n_words"] == window
            assert a["start_word"] + a["n_words"] - b["start_word"] == window - stride


def test_scalar_quantize_constant_dimension_no_crash(spark):
    """Zero-span (constant) dimensions — e.g. zero-padded embeddings —
    must quantize to code 0 with zero error, not divide by zero (a
    job-killing exception under ANSI mode)."""
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 3.0])], "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in similarity.scalar_quantize(df, levels=255).collect()}
    assert out[0]["codes"][0] == 0 and out[1]["codes"][0] == 0  # constant dim
    assert out[0]["codes"][1] == 0 and out[1]["codes"][1] == 255
    assert out[0]["max_abs_err"] == 0.0
