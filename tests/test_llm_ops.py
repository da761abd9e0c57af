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


def test_multimodal_real_decode_codec():
    """Codec behavior, asserted WITHOUT a Spark action: a raising
    mapInPandas poisons the reused Python worker for the next test (the
    r2 order-dependent flake). With PIL absent the codec raises a clear
    NotImplementedError; with PIL present it decodes a real PNG."""
    if multimodal.real_codec_available():
        import io

        import PIL.Image

        buf = io.BytesIO()
        PIL.Image.new("RGB", (7, 5)).save(buf, format="PNG")
        assert multimodal._real_decode(buf.getvalue()) == (7, 5)
    else:
        with pytest.raises(NotImplementedError, match="image codec"):
            multimodal._real_decode(b"x")


def _make_png(width: int, height: int, rgb=(200, 10, 30)) -> bytes:
    """A valid 8-bit RGB PNG from the stdlib alone (no PIL): signature +
    IHDR + one zlib-compressed IDAT of filter-0 scanlines + IEND."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(rgb) * width for _ in range(height))
    return sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_image_source_real_decode(spark, tmp_path):
    """REAL (un-stubbed, un-skipped) image decode in this container:
    Spark's JVM image source (ImageIO) decodes actual PNG bytes — no PIL,
    no Python codec — and reports true width/height/channels."""
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a.png").write_bytes(_make_png(7, 5))
    (d / "b.png").write_bytes(_make_png(32, 16))
    got = {
        r["origin"].rsplit("/", 1)[-1]: r
        for r in multimodal.decode_image_files(spark, str(d)).collect()
    }
    assert got["a.png"]["width"] == 7 and got["a.png"]["height"] == 5
    assert got["b.png"]["width"] == 32 and got["b.png"]["height"] == 16
    assert all(r["n_channels"] == 3 for r in got.values())  # 8-bit RGB
    assert got["b.png"]["n_pixels"] == 32 * 16


def test_decode_embedded_images_parity_with_file_decode(spark, tmp_path):
    """The embedded-binary-column decode (stage-to-files → JVM image
    source; VERDICT r5 item 7) must report the same dimensions as decoding
    the same PNGs laid out as files — and drop undecodable payloads inside
    the scan, like the file path does."""
    pngs = {1: _make_png(7, 5), 2: _make_png(32, 16), 3: b"corrupt payload"}
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in pngs.items()], "doc_id long, payload binary"
    )
    got = {
        r["doc_id"]: r
        for r in multimodal.decode_embedded_images(
            df, "payload", stage_dir=str(tmp_path / "stage")
        ).collect()
    }
    assert sorted(got) == [1, 2]  # the corrupt payload is dropped in-scan
    assert (got[1]["width"], got[1]["height"]) == (7, 5)
    assert (got[2]["width"], got[2]["height"], got[2]["n_pixels"]) == (32, 16, 512)

    d = tmp_path / "files"
    d.mkdir()
    for i, p in pngs.items():
        (d / f"{i}.img").write_bytes(p)
    file_rows = {
        int(r["origin"].rsplit("/", 1)[-1].split(".")[0]): r
        for r in multimodal.decode_image_files(spark, str(d)).collect()
    }
    assert {
        i: (r["width"], r["height"]) for i, r in file_rows.items()
    } == {i: (got[i]["width"], got[i]["height"]) for i in got}


def test_image_source_drops_invalid_files(spark, tmp_path):
    """A crawled corpus always carries corrupt payloads: dropInvalid must
    skip them inside the scan rather than failing the job."""
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "ok.png").write_bytes(_make_png(4, 4))
    (d / "junk.png").write_bytes(b"this is not an image at all")
    rows = multimodal.decode_image_files(spark, str(d)).collect()
    assert len(rows) == 1 and rows[0]["origin"].endswith("ok.png")


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


# ---------------------------------------------------------------------------
# Connected components / dedup closure
# ---------------------------------------------------------------------------


def test_connected_components_chain_converges(spark):
    # A 6-node path graph needs several propagation rounds (diameter 5):
    # exercises the iteration + convergence check, not just one hop.
    edges = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (20, 21)],
        "a_id long, b_id long",
    )
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.graph import connected_components

    got = {r["id"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 15: 10, 20: 20, 21: 20}


@pytest.mark.slow
def test_connected_components_long_chain_log_rounds(spark):
    # Worst case for plain min-label propagation: a 128-node path graph
    # (diameter 127 would need 127 rounds). Pointer jumping halves the
    # remaining distance every round, so convergence must take O(log n)
    # rounds — ceil(log2(128)) + slack for the no-change confirmation.
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.graph import (
        connected_components,
    )

    n = 128
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id long, b_id long"
    )
    iters: list = []
    got = connected_components(edges, iteration_log=iters)
    assert got.filter("cluster_id <> 0").count() == 0
    assert got.count() == n
    assert len(iters) <= 10, iters


def test_dedup_clusters_includes_singletons(spark):
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.graph import dedup_clusters

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a_id long, b_id long")
    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    rows = {r["doc_id"]: r for r in dedup_clusters(pairs, docs).collect()}
    assert rows[2]["cluster_id"] == 1 and rows[3]["cluster_id"] == 1
    assert rows[0]["cluster_id"] == 0 and rows[4]["cluster_id"] == 4  # singletons
    keepers = [d for d, r in rows.items() if r["is_representative"]]
    assert sorted(keepers) == [0, 1, 4]


# ---------------------------------------------------------------------------
# Sampling / splits / redaction
# ---------------------------------------------------------------------------


def test_split_label_partitioning_invariant(spark):
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.sampling import split_label

    df = spark.range(1000).select(F.col("id").alias("k"))
    one = df.coalesce(1).select("k", split_label(F.col("k")).alias("s")).collect()
    many = df.repartition(16).select("k", split_label(F.col("k")).alias("s")).collect()
    assert {(r["k"], r["s"]) for r in one} == {(r["k"], r["s"]) for r in many}
    counts = {r["s"]: 0 for r in one}
    for r in one:
        counts[r["s"]] += 1
    # 75/12.5/12.5 within loose tolerance
    assert 650 < counts["train"] < 850
    assert 50 < counts["val"] < 200 and 50 < counts["test"] < 200


def test_deterministic_sample_fraction(spark):
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.sampling import deterministic_sample

    df = spark.range(2000).select(F.col("id").alias("k"))
    kept = deterministic_sample(df, "k", per_16=4)
    n = kept.count()
    assert 400 < n < 600  # ≈ 4/16 of 2000
    assert kept.count() == n  # repeatable


def test_redact_pii_spark(spark):
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [("mail a.b+c@x-corp.io or call 555-123-4567 now",)], "t string"
    )
    out = df.select(redact_pii(F.col("t")).alias("r")).first()["r"]
    assert out == "mail [EMAIL] or call [PHONE] now"


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame(
        [(0, "one two"), (1, "one two three"), (2, "a b c d")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["g"] for r in
            df.select("doc_id", text.word_ngrams(F.col("text"), 3).alias("g")).collect()}
    assert rows[0] == []  # < n tokens: empty, NOT a descending sequence
    assert rows[1] == ["one two three"]
    assert rows[2] == ["a b c", "b c d"]


def test_shingle_jaccard_catches_edit(corpus):
    pairs = {(r["a_id"], r["b_id"]) for r in
             dedup.jaccard_pairs(
                 corpus, "doc_id", "text", threshold=0.5,
                 token_expr=text.word_ngrams(F.col("text"), 3)).collect()}
    assert (0, 1) in pairs  # identical docs
    assert (0, 2) in pairs  # one-word suffix edit still shares most shingles
    assert not any(5 in p for p in pairs)


def test_knn_pq_shortlist_and_rerank_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    cb = emb.filter(F.col("vec_id") < 16)
    e = {(r["q_id"], r["n_id"]) for r in similarity.knn_bruteforce(emb, q, k=5).collect()}
    # ADC shortlist: quantization with an untrained 16-centroid codebook is
    # coarse, so judge it as a shortlist (recall@50), the way PQ is used
    short = {(r["q_id"], r["n_id"]) for r in
             similarity.knn_pq(emb, q, cb, k=50).collect()}
    short_recall = len(e & short) / len(e)
    assert short_recall >= 0.7, f"PQ shortlist recall too low: {short_recall}"
    # two-stage (shortlist -> exact cosine rerank) recovers nearly exact top-k
    rer = similarity.knn_pq_rerank(emb, q, cb, k=5, shortlist=50)
    a = {(r["q_id"], r["n_id"]) for r in rer.collect()}
    assert len(e & a) / len(e) >= 0.7
    assert rer.count() == 50  # full top-5 per query


def test_label_centroids_exact(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 3.0], 7), (1, [3.0, 5.0], 7), (2, [10.0, 20.0], 8)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {(r["label"], r["dim"]): (r["c"], r["n_vecs"])
            for r in similarity.label_centroids(df).collect()}
    assert rows[(7, 0)] == (2.0, 2)
    assert rows[(7, 1)] == (4.0, 2)
    assert rows[(8, 0)] == (10.0, 1)


def test_audio_chunk_plan_short_track_empty(spark):
    df = spark.createDataFrame(
        [(0, 15999), (1, 16000), (2, 40000)], "doc_id long, n_samples long"
    )
    out = multimodal.audio_chunk_plan(df, "n_samples").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_start"], r["chunk_end"]))
    assert 0 not in by_doc  # shorter than one window: no chunks
    assert by_doc[1] == [(0, 16000)]
    assert by_doc[2] == [(0, 16000), (8000, 24000), (16000, 32000), (24000, 40000)]


def test_cdc_chunks_short_text_single_chunk(spark):
    """Texts shorter than the hash window must yield exactly one whole-text
    chunk — not the phantom chunks a descending sequence(window, length)
    would produce (negative substr starts count from the string END)."""
    df = spark.createDataFrame(
        [(0, "abc"), (1, "exactly8"), (2, "a bit longer than the window " * 4)],
        "doc_id long, text string",
    )
    rows = {}
    for r in dedup.cdc_chunks(df, "doc_id", "text", window=8).collect():
        rows.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_len"]))
    assert rows[0] == [(0, 3)]  # < window: one chunk, the whole text
    total = sum(n for _, n in rows[2])
    assert total == len("a bit longer than the window " * 4)  # chunks cover the text


def test_sessionize_batch_gap_boundary(spark):
    from datetime import datetime

    from etl_pipeline_for_elasticsearch_json_document_spark.streaming.windows import sessionize_batch

    base = datetime(2024, 1, 1)
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (1, datetime(2024, 1, 1, 0, 30, 0), 1.0),   # < gap: same session
        (1, datetime(2024, 1, 1, 1, 30, 0), 1.0),   # EXACTLY gap after prev: merges
        (1, datetime(2024, 1, 1, 2, 30, 0, 1), 1.0),  # 1 us past gap: NEW session
        (2, datetime(2024, 1, 1, 5, 0, 0), 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sessionize_batch(df, gap="1 hour").collect()
    u1 = sorted([r for r in out if r["user_id"] == 1], key=lambda r: r["session_start_us"])
    assert len(u1) == 2, "only a gap STRICTLY greater than 1 h opens a session"
    assert u1[0]["n_events"] == 3 and u1[1]["n_events"] == 1
    # window is [min_ts, max_ts + gap]: 00:00 .. 01:30 + 1h = 150 min span
    assert u1[0]["session_end_us"] - u1[0]["session_start_us"] == 150 * 60 * 1_000_000
    assert len([r for r in out if r["user_id"] == 2]) == 1


# ---------------------------------------------------------------------------
# Winnowing fingerprints / BPE pre-tokenization
# ---------------------------------------------------------------------------


def _winnow_fps(spark, docs, k=5, window=4):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    g = df.select("doc_id", text.winnow_gram_hashes(F.col("text"), k=k).alias("hs"))
    out = g.select("doc_id", F.explode(text.winnow_select(F.col("hs"), window=window)).alias("fp"))
    fps = {}
    for r in out.collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    return fps


def test_winnowing_shared_substring_guarantee(spark):
    """The winnowing guarantee: any shared substring of length >= k+w-1
    (= 8 chars here) yields at least one shared fingerprint; disjoint
    texts share none."""
    shared = "identical stretch of text preserved verbatim in both documents"
    fps = _winnow_fps(
        spark,
        [
            (0, "intro alpha " + shared + " tail one"),
            (1, "other beginning " + shared + " different ending"),
            (2, "zzz qqq xxx vvv completely disjoint characters 91823"),
        ],
    )
    assert fps[0] & fps[1], "shared substring must produce a shared fingerprint"
    assert not (fps[0] & fps[2])
    assert not (fps[1] & fps[2])


def test_winnowing_samples_fraction_of_grams(spark):
    """The sketch must be much smaller than the full gram stream (~2/(w+1)
    of grams survive) and identical docs produce identical sketches."""
    t = "a reasonably long piece of text " * 8
    fps = _winnow_fps(spark, [(0, t), (1, t)])
    assert fps[0] == fps[1]
    n_grams = len(t.strip()) - 4  # k=5
    assert len(fps[0]) < 0.6 * n_grams


def test_winnowing_short_text_empty(spark):
    fps = _winnow_fps(spark, [(0, "abc"), (1, "abcdefgh")])
    assert 0 not in fps  # shorter than k -> no fingerprints
    assert 1 in fps


def test_bpe_pretokens_shape(spark):
    got = (
        spark.createDataFrame([("Hello world, 42 tokens!",)], "text string")
        .select(text.bpe_pretokens(F.col("text")).alias("t"))
        .collect()[0]["t"]
    )
    assert got == ["Hello", "world", ",", "4", "2", "tokens", "!"]


def test_minhash_cross_pairs_finds_edited_leak(spark):
    """A probe doc that is a light edit of a corpus doc must be flagged by
    the fuzzy cross-corpus check even though no long exact n-gram survives
    frequent word substitutions."""
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
            "kilo lima mike november oscar papa quebec romeo sierra tango").split()
    edited = list(base)
    for i in range(3, len(edited), 4):  # every 4th word changed: max run = 3
        edited[i] = f"X{i}"
    corpus = spark.createDataFrame(
        [(1, " ".join(base)), (2, "totally unrelated words " + " ".join(f"z{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame([(100, " ".join(edited))], "doc_id long, text string")
    # J(base, edited) = 15/25 = 0.6: 2-row bands make a collision near-
    # certain (1-(1-0.6^2)^8 ≈ 0.98) where 4-row bands would likely miss
    fuzzy = dedup.minhash_cross_pairs(
        corpus, probes, "doc_id", "text", num_hashes=16, bands=8, threshold=0.3
    )
    got = {(r["corpus_id"], r["probe_id"]) for r in fuzzy.collect()}
    assert (1, 100) in got and (2, 100) not in got
    # the exact 5-gram check misses this leak (no 5 consecutive words survive)
    exact = dedup.ngram_contamination(corpus, probes, "doc_id", "text", n=5)
    assert exact.count() == 0


def test_jaccard_pairs_construction_is_lazy(spark):
    """No Spark action may fire before an operator returns its DataFrame:
    building jaccard_pairs over a poisoned input (any row evaluation
    raises) must succeed; only the action may raise. The broadcast-vs-
    shuffle choice is AQE's at runtime, not an eager count()'s."""
    base = spark.createDataFrame([(1, "a b c"), (2, "a b d")], "doc_id long, text string")
    poison = base.select(
        "doc_id",
        F.when(F.col("doc_id") >= 0, F.raise_error("eager action fired"))
        .otherwise(F.lit(None))
        .cast("string")
        .alias("text"),
    )
    out = dedup.jaccard_pairs(poison, "doc_id", "text")  # lazy: must not raise
    with pytest.raises(Exception, match="eager action fired"):
        out.count()


@pytest.mark.slow
def test_minhash_ops_accept_any_id_column_name(spark):
    """id_col is honored, not assumed to be 'doc_id': minhash_signatures
    aliases it internally and every downstream LSH op must keep working
    when the caller's id column has a different name."""
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f"), (3, "x y z w v")],
        "my_id long, body string",
    )
    probes = spark.createDataFrame([(10, "a b c d e")], "my_id long, body string")
    cross = {
        (r["corpus_id"], r["probe_id"])
        for r in dedup.minhash_cross_pairs(df, probes, "my_id", "body").collect()
    }
    assert (1, 10) in cross and (3, 10) not in cross
    pairs = {
        (r["a_id"], r["b_id"])
        for r in dedup.minhash_lsh_pairs(df, "my_id", "body", threshold=0.5).collect()
    }
    assert pairs == {(1, 2)}


def test_triangle_counts_k4_plus_pendant(spark):
    """K4 has 4 triangles, every node in exactly 3; a pendant edge joins
    none. Duplicate/reversed input edges must not change counts."""
    from etl_pipeline_for_elasticsearch_json_document_spark.operators import graph

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]  # both directions
    edges = spark.createDataFrame(k4 + [(4, 9), (9, 4)], "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in graph.triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


@pytest.mark.slow
def test_triangle_orientation_kills_hub_wedges(spark):
    """The skew guarantee behind triangle_counts: a 2,000-leaf star hub
    produces ZERO wedges under degree-ordered orientation (every edge
    points INTO the hub), where naive per-node wedge counting would
    enumerate ~2M pairs at the hub. K4's wedge count is exactly 4."""
    from etl_pipeline_for_elasticsearch_json_document_spark.operators import graph

    star = spark.createDataFrame([(0, i) for i in range(1, 2001)], "src long, dst long")
    assert graph.oriented_wedges(graph.orient_edges(star)).count() == 0

    k4 = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)], "src long, dst long"
    )
    assert graph.oriented_wedges(graph.orient_edges(k4)).count() == 4


@pytest.mark.slow
def test_kmeans_fit_monotone_and_feeds_ivf(spark, sf_dir):
    """Lloyd's algorithm must not increase inertia with more iterations,
    the fit must be run-to-run deterministic, and its output table must
    slot directly into knn_ivf as the centroid codebook."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def inertia(iters):
        c = similarity.kmeans_fit(emb, k=4, iterations=iters)
        a = similarity.kmeans_assign(emb, c)
        return a.agg(F.sum("dist")).first()[0]

    i0, i1, i2 = inertia(0), inertia(1), inertia(2)
    assert i0 >= i1 >= i2  # Lloyd monotonicity
    c_a = similarity.kmeans_fit(emb, k=4, iterations=2).collect()
    c_b = similarity.kmeans_fit(emb, k=4, iterations=2).collect()
    assert sorted(map(tuple, c_a)) == sorted(map(tuple, c_b))  # deterministic

    cents = similarity.kmeans_fit(emb, k=4, iterations=2)
    out = similarity.knn_ivf(emb, emb.limit(3), cents, k=5, nprobe=2)
    got = out.groupBy("q_id").count().collect()
    assert len(got) == 3 and all(r["count"] == 5 for r in got)


def test_prefix_filter_jaccard_equals_naive_join(spark, sf_dir):
    """PPJoin-style prefix filtering is EXACT: its output must equal the
    naive inverted-index join on the real corpus, while generating
    strictly fewer candidate pairs (rare-token prefixes keep stopword
    postings out of the join)."""
    docs = load_table(spark, sf_dir, "documents")
    naive = {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in dedup.jaccard_pairs(docs, "doc_id", "text", threshold=0.6).collect()
    }
    pf = {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in dedup.prefix_filter_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.6
        ).collect()
    }
    assert pf == naive and len(pf) > 0


@pytest.mark.slow
def test_prefix_filter_jaccard_property_random_corpora(spark):
    """Property check on randomized corpora and thresholds: prefix
    filtering must give EXACTLY the naive join's pairs (the prefix lemma
    has off-by-one traps — floor vs ceil in the prefix length — that only
    adversarial sizes/overlaps expose)."""
    import random

    rng = random.Random(4217)
    vocab = [f"w{i}" for i in range(40)]
    for trial in range(6):
        t = rng.choice([0.5, 0.6, 0.75, 0.9])
        docs = []
        base = rng.sample(vocab, rng.randint(3, 12))
        for i in range(18):
            if rng.random() < 0.5 and docs:
                # mutate an earlier doc: keeps Jaccard near the threshold
                words = list(dict.fromkeys(docs[rng.randrange(len(docs))][1].split()))
                for _ in range(rng.randint(0, 2)):
                    if rng.random() < 0.5 and len(words) > 2:
                        words.pop(rng.randrange(len(words)))
                    else:
                        words.append(rng.choice(vocab))
            else:
                words = rng.sample(vocab, rng.randint(2, 14))
            docs.append((i, " ".join(dict.fromkeys(words))))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        naive = {
            (r["a_id"], r["b_id"], r["jaccard"])
            for r in dedup.jaccard_pairs(df, "doc_id", "text", threshold=t).collect()
        }
        pf = {
            (r["a_id"], r["b_id"], r["jaccard"])
            for r in dedup.prefix_filter_jaccard_pairs(
                df, "doc_id", "text", threshold=t
            ).collect()
        }
        assert pf == naive, f"trial {trial} t={t}: {pf ^ naive}"


def test_duplicated_spans_interval_merge(spark):
    """Pins duplicated_spans semantics on a hand-built corpus (k=3):
    overlapping duplicated-gram runs merge into one interval, adjacent
    intervals merge, isolated duplicated grams become k-wide spans, and
    docs with no duplicated gram produce no rows."""
    docs = spark.createDataFrame(
        [
            # doc 0 and 1 share the 5-token run "a b c d e" -> grams at
            # pos 0,1,2 overlap -> ONE merged span [0, 5) in each.
            (0, "a b c d e x y q r s"),
            (1, "a b c d e m n o p q"),
            # doc 2 repeats "u v w" twice within itself at pos 0 and 4
            # (separated by one token) -> two spans [0,3) and [4,7).
            (2, "u v w z u v w t1 t2 t3"),
            # doc 3: nothing shared, no rows.
            (3, "f1 f2 f3 f4 f5 f6 f7 f8"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in (
            dedup.duplicated_spans(docs, "doc_id", "text", k=3)
            .groupBy("doc_id", "n_tokens")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("span_start", "span_end"))
                ).alias("spans")
            )
            .collect()
        )
    }
    assert set(out) == {0, 1, 2}
    assert [(s["span_start"], s["span_end"]) for s in out[0]["spans"]] == [(0, 5)]
    assert [(s["span_start"], s["span_end"]) for s in out[1]["spans"]] == [(0, 5)]
    assert [(s["span_start"], s["span_end"]) for s in out[2]["spans"]] == [
        (0, 3),
        (4, 7),
    ]
    assert out[2]["n_tokens"] == 10


def test_contaminated_train_ids_matches_per_test_counts(spark):
    """The train-side hit set must be exactly the union of train docs the
    per-test-doc sweep counts: same postings substrate, opposite
    aggregation side. A doc sharing grams with TWO test docs appears ONCE."""
    corpus = spark.createDataFrame(
        [
            (1, "one two three four five six seven"),      # leaks test gram A
            (2, "eleven twelve thirteen fourteen fifteen sixteen"),  # leaks B
            (3, "completely different words with no overlap at all"),
            (4, "one two three four five eleven twelve thirteen fourteen fifteen"),  # leaks A and B
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [
            (100, "zzz one two three four five zzz"),          # gram A
            (200, "yyy eleven twelve thirteen fourteen fifteen"),  # gram B
        ],
        "doc_id long, text string",
    )
    hits = dedup.contaminated_train_ids(corpus, probes, "doc_id", "text", n=5)
    got = sorted(r["train_id"] for r in hits.collect())
    assert got == [1, 2, 4]  # doc 4 once despite matching both probes
    # cross-check against the per-test-doc aggregation over the same substrate
    per_test = dedup.ngram_contamination(corpus, probes, "doc_id", "text", n=5)
    assert {r["test_id"]: r["n_train_docs"] for r in per_test.collect()} == {
        100: 2,
        200: 2,
    }


def test_dedup_exact_null_text_passthrough(spark):
    """r10 review: NULL-text docs share no CONTENT — dedup_exact must not
    group them under one NULL fingerprint and delete all but one."""
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, None)],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in dedup.dedup_exact(df, "doc_id", "text").collect())
    assert kept == [1, 3, 4, 5]  # one of the dup pair + ALL null-text docs
    groups = dedup.exact_duplicates(df, "doc_id", "text").collect()
    assert len(groups) == 1 and groups[0]["dup_count"] == 2


def test_dedup_close_honors_low_threshold(spark):
    """r10 review: dedup_close(threshold=t) must pass t into the pair
    generator — its internal default (0.5) silently clamped lower asks,
    keeping docs apart that the caller asked to be clustered."""
    base = [f"w{i}" for i in range(16)]
    other = [f"w{i}" for i in range(10)] + [f"x{i}" for i in range(6)]
    # this pair's banded estimate is deterministically 0.3125 under
    # (num_hashes=16, bands=16): below the old silent 0.5 clamp, above
    # the caller's 0.25 ask
    df = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(other))], "doc_id long, text string"
    )
    out = dedup.dedup_close(df, threshold=0.25, num_hashes=16, bands=16)
    clusters = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert clusters[1] == clusters[2]  # clustered at the CALLER's threshold


def test_split_label_rejects_multi_char_thresholds(spark):
    """ADVICE r10 #3: the threshold guard used substring membership, so
    'ab', '45', and '' passed validation while silently breaking the
    n/16 bucket semantics — must be exactly one lowercase hex char."""
    import pytest

    from etl_pipeline_for_elasticsearch_json_document_spark.operators.sampling import split_label

    for train, val in [("ab", "e"), ("c", "45"), ("", "e"), ("C", "e"), ("e", "c")]:
        with pytest.raises(ValueError, match="SINGLE lowercase hex"):
            split_label(F.col("k"), train=train, val=val)
    split_label(F.col("k"))  # defaults still valid
