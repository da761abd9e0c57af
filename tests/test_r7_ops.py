"""Round-7 operator properties beyond the DuckDB oracles: numpy
cross-checks for the embedding QA / label-margin math, crafted-input
invariants for the Gopher gates and duplicate-n-gram mass, and DSIR
direction sanity (target-slice docs score above the rest on average)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return all_queries()


def test_embedding_qa_matches_numpy(spark, reg):
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    got = {r["dim"]: r for r in reg["q188_embedding_qa"].fn(spark, SF).collect()}
    assert set(got) == set(range(m.shape[1]))
    for d in range(m.shape[1]):
        col = m[:, d]
        # the query's DECIMAL-exact moments vs numpy float math: agree to
        # well under the 6-dp rounding the query applies
        assert got[d]["mean"] == pytest.approx(col.mean(), abs=2e-5)
        assert got[d]["variance"] == pytest.approx(col.var(), abs=2e-4)
        assert got[d]["vmin"] == pytest.approx(col.min(), abs=1e-6)
        assert got[d]["vmax"] == pytest.approx(col.max(), abs=1e-6)
        assert got[d]["n"] == m.shape[0]


def test_label_margin_matches_numpy(spark, reg):
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    labels = np.array([r["label"] for r in rows])
    cents = {l: m[labels == l].mean(axis=0) for l in np.unique(labels)}
    noisy = {l: 0 for l in cents}
    n = {l: 0 for l in cents}
    for v, l in zip(m, labels):
        d2 = {c: ((v - cv) ** 2).sum() for c, cv in cents.items()}
        own = d2[l]
        other = min(dv for c, dv in d2.items() if c != l)
        n[l] += 1
        if own > other:
            noisy[l] += 1
    got = {r["label"]: r for r in reg["q189_label_margin_audit"].fn(spark, SF).collect()}
    assert {l: got[l]["n_vecs"] for l in got} == n
    assert {l: got[l]["n_noisy"] for l in got} == noisy


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_gopher_rules_crafted(spark, tmp_path, reg):
    good = " ".join(["the", "and", "of"] * 20 + ["quality"] * 10)  # 70 words
    short = "the of tiny"  # fails word count
    nostop = " ".join(["zzz"] * 80)  # fails stop words
    longwords = " ".join(["x" * 12] * 60 + ["the", "the"])  # fails mean word len
    out = str(tmp_path / "d")
    _docs(spark, [good, short, nostop, longwords]).write.parquet(f"{out}/documents.parquet")
    r = {x["source"]: x for x in reg["q183_gopher_rules"].fn(spark, out).collect()}["src"]
    assert r["n_docs"] == 4
    assert r["pass_wordcount"] == 3  # all but `short`
    assert r["pass_stopwords"] == 3  # all but `nostop`
    assert r["pass_meanwordlen"] == 3  # all but `longwords`
    assert r["pass_all"] == 1  # only `good`


def test_dup_ngram_mass_bounds_and_extremes(spark, tmp_path, reg):
    looped = " ".join(["spam eggs"] * 30)  # 60 words, almost all dup bigrams
    unique = " ".join(f"w{i}" for i in range(60))  # zero dup n-grams
    out = str(tmp_path / "d")
    _docs(spark, [looped, unique]).write.parquet(f"{out}/documents.parquet")
    rows = reg["q184_dup_ngram_mass"].fn(spark, out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_docs"] == 2
    # looped doc: 59 bigrams, 2 distinct -> dup mass 57/59
    assert r["max_dup2"] == pytest.approx(57 / 59, abs=1e-6)
    # f3 <= f2 always (every dup 3-gram implies dup 2-grams)
    assert r["avg_dup3"] <= r["avg_dup2"] + 1e-9
    assert r["n_repetitive"] == 1


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=5, max_size=30),
        min_size=2,
        max_size=6,
    )
)
def test_dup_ngram_mass_in_unit_interval(spark_global, docs):
    spark = spark_global
    reg = all_queries()
    import tempfile

    out = tempfile.mkdtemp()
    _docs(spark, [" ".join(ws) for ws in docs]).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    for r in reg["q184_dup_ngram_mass"].fn(spark, out).collect():
        assert 0.0 <= r["avg_dup3"] <= r["avg_dup2"] <= 1.0


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


def test_dsir_importance_direction(spark, reg):
    """On the real table the English slice must out-score the rest on
    average — the defining property of an importance weight toward an
    English target."""
    rows = reg["q185_dsir_importance"].fn(spark, SF).collect()
    en = [r["importance"] for r in rows if r["lang"] == "en"]
    rest = [r["importance"] for r in rows if r["lang"] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_split_leakage_pairs_truly_straddle(spark, reg):
    """Every reported pair class names two DIFFERENT splits and the pair
    counts reconcile with the unfiltered q32 pair relation."""
    from etl_pipeline_for_elasticsearch_json_document_spark.operators import dedup, sampling

    rows = reg["q190_split_leakage"].fn(spark, SF).collect()
    for r in rows:
        a, b = r["split_pair"].split("|")
        assert a != b
    d = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(d, "doc_id", "text", 16, 4, threshold=0.5)
    sp = d.select("doc_id", sampling.split_label(F.col("doc_id")).alias("s"))
    cross = (
        pairs.join(sp.withColumnRenamed("doc_id", "a_id").withColumnRenamed("s", "sa"), "a_id")
        .join(sp.withColumnRenamed("doc_id", "b_id").withColumnRenamed("s", "sb"), "b_id")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert sum(r["n_pairs"] for r in rows) == cross
