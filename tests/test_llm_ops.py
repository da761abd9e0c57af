"""Positive-signal tests for the LLM-data operators: the sf tables contain
few true duplicates, so these build corpora with known dup structure and
assert the operators find it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.operators import dedup, multimodal, similarity, text
from etl_pipeline_for_elasticsearch_json_document_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base + " extra"),  # near dup of 0/1
        (3, "completely different words about spark query engines and shuffles"),
        (4, "completely different words about spark query engines and shuffles ok"),
        (5, "unrelated text with nothing in common whatsoever zebra xylophone"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(corpus):
    groups = dedup.exact_duplicates(corpus, "doc_id", "text").collect()
    dup = [g for g in groups if g["dup_count"] == 2]
    assert len(dup) == 1 and dup[0]["keep_id"] == 0


def test_dedup_exact_keeps_one(corpus):
    kept = dedup.dedup_exact(corpus, "doc_id", "text")
    assert kept.count() == 5
    assert kept.filter(F.col("doc_id") == 1).count() == 0  # doc 1 deduped away


def test_jaccard_finds_neardups(corpus):
    pairs = {(r["a_id"], r["b_id"]): r["jaccard"] for r in
             dedup.jaccard_pairs(corpus, "doc_id", "text", threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.8
    assert (3, 4) in pairs
    assert not any(5 in p for p in pairs)


def test_minhash_lsh_finds_neardups(corpus):
    pairs = {(r["a_id"], r["b_id"]): r["est_jaccard"] for r in
             dedup.minhash_lsh_pairs(corpus, "doc_id", "text", threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0  # identical docs always collide in every band
    assert (0, 2) in pairs  # near dup found by LSH
    assert not any(5 in p for p in pairs)


def test_simhash_identical_zero_hamming(corpus):
    pairs = {(r["a_id"], r["b_id"]): r["hamming"] for r in
             dedup.simhash_pairs(corpus, "doc_id", "text", max_hamming=16).collect()}
    assert pairs[(0, 1)] == 0
    assert pairs[(0, 2)] <= 3  # near dup → tiny hamming distance
    assert pairs[(0, 5)] > 3  # unrelated text → far


def test_embedding_neardup_positive(spark):
    v = [float(i) for i in range(8)]
    v2 = [float(i) + (0.001 if i == 0 else 0.0) for i in range(8)]
    far = [float(8 - i) for i in range(8)]
    df = spark.createDataFrame(
        [(0, v, 1), (1, v2, 1), (2, far, 1), (3, v, 2)],
        "vec_id long, embedding array<double>, label int",
    )
    pairs = dedup.embedding_neardup_pairs(df, "vec_id", "embedding", "label", 0.999)
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert (0, 2) not in got  # different direction
    assert (0, 3) not in got  # different label block


def test_knn_lsh_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = similarity.knn_bruteforce(emb, q, k=5)
    approx = similarity.knn_lsh(emb, q, dim=64, k=5)
    e = {(r["q_id"], r["n_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["n_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_multimodal_fake_decode(spark):
    df = spark.createDataFrame([(1, bytearray(b"hello"))], "doc_id long, payload binary")
    out = multimodal.decode_images(df, "payload").collect()[0]
    assert out["width"] == 16 + 5 % 64
    assert out["height"] == 16 + ord("h") % 64
    assert out["n_pixels"] == out["width"] * out["height"]


def test_multimodal_real_decode_is_stubbed(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, payload binary")
    with pytest.raises(Exception, match="NotImplementedError|image codec"):
        multimodal.decode_images_real(df, "payload").collect()


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, bytearray(b"v" * 95))], "vid_id long, payload binary")
    frames = multimodal.frame_sample_plan(df, "payload", every_n=30).collect()
    # 95 bytes → n_frames = 95 % 300 + 1 = 96 → samples at 0, 30, 60, 90
    assert [r["frame_idx"] for r in frames] == [0, 30, 60, 90]


def test_text_operator_sanity(spark):
    df = spark.createDataFrame([(1, "The quick the lazy the end")], "id long, t string")
    r = df.select(
        text.token_count(F.col("t")).alias("n"),
        F.round(text.stopword_ratio(F.lower(F.col("t"))), 4).alias("sw"),
        text.fingerprint(F.col("t")).alias("fp"),
        text.language_id(F.col("t")).alias("lang"),
        F.size(text.char_ngrams(F.col("t"), 3)).alias("n3"),
    ).collect()[0]
    assert r["n"] == 6
    assert r["sw"] == round(3 / 6, 4)
    assert len(r["fp"]) == 32
    assert r["lang"] == "en"
    assert r["n3"] == len("the quick the lazy the end") - 2
