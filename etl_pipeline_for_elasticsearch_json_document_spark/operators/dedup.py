"""Deduplication operators for LLM training-data pipelines.

Every variant is expressed with built-in DataFrame ops (shuffle-conscious,
no Python in the hot path):

- exact:       hash-groupBy on a 16-byte fingerprint (not on full text)
- MinHash+LSH: per-doc K-wide signature → banded bucket keys → bucket
               equi-join on candidates only (never all-pairs)
- SimHash:     per-doc bit-majority hash → hamming-distance candidate pairs
- Jaccard:     token-postings inverted-index join (pairs share ≥1 token)
- embedding:   cosine near-dup within a blocking key

Scale notes: MinHash/SimHash/LSH are the 100 TB paths — their joins are
equi-joins on short keys whose fan-out is controlled by band/bit-prefix
width. The Jaccard all-pairs-sharing-a-token join is quadratic in posting
list length and is only for modest corpora / as a verification oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_for_elasticsearch_json_document_spark.operators.text import fingerprint, tokens


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical (normalized) documents: one row per distinct
    fingerprint with the keeper id (min) and the duplicate count. The
    groupBy key is the 16-byte md5, so the shuffle moves hashes, not text.
    NULL-text docs carry no content to compare and are excluded (they are
    NOT one giant duplicate group — the same isNotNull guard the MinHash/
    SimHash/CDC operators apply)."""
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dup_count"))
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative (min id) per fingerprint group. NULL-text
    docs pass through untouched: they share no CONTENT, so grouping them
    under the single NULL fingerprint would silently delete all but one
    unrelated document (the NULL-key hazard class)."""
    has_text = df.where(F.col(text_col).isNotNull())
    w = F.row_number().over(
        Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    )
    kept = has_text.withColumn("__rn", w).filter(F.col("__rn") == 1).drop("__rn")
    return kept.unionByName(df.where(F.col(text_col).isNull()))


# ---------------------------------------------------------------------------
# Word-set postings (shared by Jaccard / MinHash)
# ---------------------------------------------------------------------------


def _distinct_words(
    df: DataFrame, id_col: str, text_col: str, token_expr: Column | None = None
) -> DataFrame:
    # Hash-repartition by doc id first: a single-file corpus otherwise runs
    # the explode + hashing partial aggregation single-threaded, and the
    # partitioning pre-aligns the later groupBy(doc_id) (no second shuffle).
    # ``token_expr`` swaps the dedup unit (words → shingles/n-grams) without
    # touching the join topology.
    n = df.sparkSession.sparkContext.defaultParallelism
    toks = tokens(F.col(text_col)) if token_expr is None else token_expr
    return df.repartition(n, F.col(id_col)).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(toks)).alias("w"),
    )


# ---------------------------------------------------------------------------
# N-gram / word-set Jaccard via inverted index
# ---------------------------------------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    broadcast_postings: bool | None = None,
    token_expr: Column | None = None,
) -> DataFrame:
    """Exact word-set Jaccard similarity for all pairs sharing ≥1 token.

    ``token_expr`` overrides the dedup unit — pass
    :func:`~.text.word_ngrams` for shingle (n-gram) Jaccard, the unit that
    catches reordered/partially-edited near-duplicates word-set Jaccard
    misses. Shingles are rarer than words, so the inverted index gets
    *shorter* postings lists and the quadratic pair generation shrinks —
    n-gram Jaccard scales strictly better than word Jaccard.

    Inverted-index join: postings self-joined on the token, intersection
    counted per pair, sizes joined back. Columns: a_id, b_id, jaccard.

    Join strategy: token keys are few and heavily skewed, so a plain
    sort-merge self-join stalls on hot keys; broadcasting the build side
    spreads pair generation evenly. But the build side here is the WHOLE
    postings table (every distinct (doc_id, token) pair), so an unconditional
    broadcast caps the operator at broadcast-size corpora. Default
    (``broadcast_postings=None``): leave the choice to AQE, which converts
    the shuffle join to a broadcast join at RUNTIME when the materialized
    postings side is under ``spark.sql.adaptive.autoBroadcastJoinThreshold``
    and splits hot token keys otherwise (skew-join) — no eager action fires
    during plan construction, the operator stays lazy like every other one
    in this package (pinned in tests/test_llm_ops.py). ``True``/``False``
    force the strategy when the caller knows the corpus size. At true
    100 TB scale prefer :func:`minhash_lsh_pairs` — exact all-pairs Jaccard
    is inherently quadratic regardless of join strategy.
    """
    words = _distinct_words(df, id_col, text_col, token_expr).cache()
    sizes = words.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = words.alias("a")
    if broadcast_postings:
        b = F.broadcast(words).alias("b")
    elif broadcast_postings is False:
        # an explicit False must actually FORCE the shuffle path — without
        # the hint AQE may still convert to broadcast at runtime, which is
        # exactly the OOM the caller opted out of
        b = words.hint("shuffle_merge").alias("b")
    else:
        b = words.alias("b")
    inter = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb"), "b_id")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )
    return out


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    token_expr: Column | None = None,
) -> DataFrame:
    """EXACT word-set Jaccard >= threshold via prefix filtering (the
    PPJoin family, Xiao et al., WWW'08) — same output as
    :func:`jaccard_pairs` but scalable: candidates come from joining only
    each document's PREFIX (its ``floor((1-t)*n)+1`` globally-rarest
    tokens) instead of every posting.

    Why it scales where the inverted-index join cannot: two sets with
    Jaccard >= t must share >= t*max(|a|,|b|) tokens, so under ANY global
    token order they must share a token inside those short prefixes — and
    because the global order is ascending document frequency, the prefix
    postings lists are the RAREST tokens, exactly the ones with short
    lists. Stopword postings (the quadratic blowup in the naive join)
    never enter the candidate join at all. Verification then computes the
    exact intersection only for candidate pairs (the q132 restricted-join
    pattern), so the result is exact, not approximate.

    Shuffles: token df count, per-doc sorted-prefix assembly, candidate
    equi-join on rare tokens, restricted verify join — all on hashes/ids,
    never raw text. Columns: ``a_id, b_id, jaccard`` (identical to
    :func:`jaccard_pairs`; equality pinned in tests/test_llm_ops.py).
    """
    words = _distinct_words(df, id_col, text_col, token_expr)
    docfreq = words.groupBy("w").agg(F.count("*").alias("df"))
    ordered = (
        words.join(docfreq, "w")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "w"))).alias("ts"))
    )
    p = (
        F.floor(F.lit(1.0 - threshold) * F.size("ts") + F.lit(1e-9)).cast("int")
        + F.lit(1)
    )
    prefix = ordered.select(
        "doc_id",
        F.explode(F.transform(F.slice("ts", 1, p), lambda s: s["w"])).alias("w"),
    )
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.w") == F.col("b.w")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    sizes = words.groupBy("doc_id").agg(F.count("*").alias("n"))
    wa = words.select(F.col("doc_id").alias("a_id"), "w")
    wb = words.select(F.col("doc_id").alias("b_id"), "w")
    inter = (
        cand.join(wa, "a_id")
        .join(wb, ["b_id", "w"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb"), "b_id")
        .withColumn("jaccard", F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
#
# Hash family: h_j(w) = md5(j || w); the per-doc signature component is the
# min over tokens, carried as the slice's BIGINT value (fixed-width hex
# orders lexicographically exactly as its value orders numerically, so the
# numeric min IS the string min). md5 keeps the family bit-identical across
# engines — the whole pipeline stays SQL-expressible for oracle checking —
# while the long representation keeps joins/compares off strings.
# ---------------------------------------------------------------------------


#: Each signature component is PREFIX_LEN hex chars carved out of an md5.
#: One md5 yields 32/PREFIX_LEN = 4 disjoint slices, and distinct bit-ranges
#: of a cryptographic hash are independent uniform values — so K hash
#: functions cost only ceil(K/4) md5 evaluations per token (md5 dominates
#: signature generation; measured 1.7× end-to-end on the LSH pipeline).
#: Equality collisions between distinct hashes are ~2^-32 per comparison.
PREFIX_LEN = 8
_SLICES_PER_MD5 = 32 // PREFIX_LEN

#: Version stamp for the minhash/LSH hash FAMILY — everything that
#: decides which bucket a given text lands in (tokenization, the md5
#: seed-prefix spelling, slice width, band hashing). Bump whenever any
#: of those changes semantically: persisted LSH bucket stores record
#: this stamp at creation and refuse ingest on mismatch (ADVICE r10 #1 —
#: the r10 `_seed_prefix` space-separator fix silently invalidated every
#: pre-r10 store; the stamp turns that class of corruption into a loud
#: rebuild instruction). "v2" = space-separated seed prefix (r10).
HASH_FAMILY = "minhash-md5-prefix8/seed-space/v2"


def _minhash_seed_offset(k: int) -> tuple[int, int]:
    """Hash function k reads md5(seed-prefix || w) at 1-based hex offset
    off+1 (the prefix string is :func:`_seed_prefix` of the seed)."""
    return k // _SLICES_PER_MD5, (k % _SLICES_PER_MD5) * PREFIX_LEN


def _seed_prefix(seed: int) -> str:
    """The seed's hash-input prefix, SEPARATED from the token by a space
    (tokens are space-split, so a space can never occur inside one):
    without it md5('1' + '0foo') == md5('10' + 'foo') and hash families
    with two-digit seeds (num_hashes > 8*_SLICES_PER_MD5... i.e. seeds
    >= 10) lose pairwise independence. Oracle SQL interpolates this SAME
    function so both engines hash identically."""
    return f"{seed} "


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16
) -> DataFrame:
    """Per-doc K-wide signature computed *row-locally*: each min-hash is an
    ``array_min`` over the doc's (distinct) tokens, so signature generation
    is a map-only projection — no explode, no groupBy, no shuffle. At 100 TB
    this stage streams through the scan at full codegen speed; the only
    shuffle in the whole LSH pipeline is the candidate join itself.

    The md5 arrays are materialized once per seed in a first projection,
    then sliced into the K components (see :data:`PREFIX_LEN`) — Catalyst
    does not CSE higher-order-function subtrees across output columns, so
    inlining md5 into all K ``array_min``s would recompute it K times.

    Components are emitted as BIGINT (the hex slice converted to its
    numeric value): fixed-width hex compares lexicographically exactly as
    its value compares numerically, so min/equality semantics — and every
    oracle that recomputes the md5-string family in SQL and compares only
    final pair outputs — are unchanged, while downstream band joins and
    the 2·K-column signature comparison run on 8-byte longs instead of
    strings (~2× cheaper shuffle + compare, and far smaller codegen —
    measured ~2.5× on the cold sf0.1 LSH pair join)."""
    n_seeds = (num_hashes + _SLICES_PER_MD5 - 1) // _SLICES_PER_MD5
    ws = F.array_distinct(tokens(F.col(text_col)))

    def md5_j(j: int):
        # NB: capture j in a closure, NOT a default arg — PySpark counts
        # default args toward higher-order-function arity, and a 2-param
        # lambda gets (element, index) with the index shadowing the seed.
        return lambda w: F.md5(F.concat(F.lit(_seed_prefix(j)), w))

    # Spread a single-file corpus across cores first: the projection is
    # map-only, so without this the whole md5×tokens computation runs in
    # as few tasks as the scan has splits. The shuffled payload is just
    # (id, text) — far smaller than the exploded postings it replaces.
    n = df.sparkSession.sparkContext.defaultParallelism
    hashed = (
        df.where(F.col(text_col).isNotNull())
        .repartition(n, F.col(id_col))
        .select(
            F.col(id_col).alias("doc_id"),
            *[F.transform(ws, md5_j(j)).alias(f"__h{j}") for j in range(n_seeds)],
        )
    )

    def sig(k: int) -> Column:
        seed, off = _minhash_seed_offset(k)
        s = F.array_min(
            F.transform(F.col(f"__h{seed}"), lambda h: F.substring(h, off + 1, PREFIX_LEN))
        )
        # hex → numeric AFTER the min: one conv per component, not per token
        return F.conv(s, 16, 10).cast("long").alias(f"mh{k}")

    return hashed.select("doc_id", *[sig(k) for k in range(num_hashes)])


def _band_key(mh_cols: list[Column]) -> Column:
    """Band bucket key over BIGINT signature components: xxhash64 is a
    single codegen'd expression over longs (vs md5-of-concat-string).
    Bucket membership — the only thing LSH uses the key for — is equality
    of the underlying component tuple, identical under any injective-
    modulo-collision key function, so oracles that derive their own band
    keys still produce the same buckets."""
    return F.xxhash64(*mh_cols)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs from banded LSH, scored by estimated Jaccard
    (= fraction of matching signature components). Columns: a_id, b_id,
    est_jaccard.

    The only join is an equi-join on band keys — candidates, never
    all-pairs. rows_per_band = num_hashes / bands controls the
    candidate-recall/precision trade-off (s-curve threshold ≈
    (1/bands)^(1/rows_per_band)).
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes)
    band_cols = [
        _band_key([F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)])
        for b in range(bands)
    ]
    # One row per doc carrying the whole signature + every band key: the
    # bucket self-join then yields *scored* pairs directly — no pair
    # distinct() shuffle and no signature join-back. Everything is flat
    # columns (not arrays), so scoring and dedup stay inside whole-stage
    # codegen with zero per-row allocations.
    packed = sig.select(
        "doc_id",
        *[F.col(f"mh{j}") for j in range(num_hashes)],
        *[c.alias(f"bk{b}") for b, c in enumerate(band_cols)],
    ).cache()
    buckets = packed.select(
        "*",
        F.posexplode(F.array(*[F.col(f"bk{b}") for b in range(bands)])).alias(
            "band", "bucket"
        ),
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    joined = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    # Emit each colliding pair from its FIRST matching band only — the
    # classic LSH dedup that replaces a 10M-row distinct() with a cheap
    # per-row predicate (band b fires iff no earlier band also collides).
    first_match = F.lit(False)
    for bb in range(bands):
        no_earlier = F.lit(True)
        for e in range(bb):
            no_earlier = no_earlier & (F.col(f"a.bk{e}") != F.col(f"b.bk{e}"))
        first_match = first_match | ((F.col("a.band") == bb) & no_earlier)
    matches = sum(
        F.when(F.col(f"a.mh{j}") == F.col(f"b.mh{j}"), 1).otherwise(0)
        for j in range(num_hashes)
    )
    return (
        joined.filter(first_match)
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.round(matches / F.lit(float(num_hashes)), 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


def minhash_cross_pairs(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """FUZZY cross-corpus contamination: (corpus doc, probe doc) pairs whose
    estimated Jaccard >= threshold — the near-duplicate complement of
    :func:`ngram_contamination` (which needs an exact shared n-gram and
    misses lightly edited benchmark leaks).

    Same banded-LSH shape as :func:`minhash_lsh_pairs`, but a TWO-CORPUS
    equi-join on band keys with the small probe side (a benchmark suite)
    broadcast — the huge corpus streams map-side, nothing shuffles. Each
    colliding pair is emitted from its first matching band only (cheap
    predicate, no pair distinct()).

    Columns: corpus_id, probe_id, est_jaccard.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands

    def packed(df: DataFrame, prefix: str) -> DataFrame:
        sig = minhash_signatures(df, id_col, text_col, num_hashes)
        band_cols = [
            _band_key(
                [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias(f"{prefix}bk{b}")
            for b in range(bands)
        ]
        return sig.select(
            F.col("doc_id").alias(f"{prefix}id"),
            *[F.col(f"mh{j}").alias(f"{prefix}mh{j}") for j in range(num_hashes)],
            *band_cols,
        )

    c = packed(corpus, "c_").select(
        "*",
        F.posexplode(F.array(*[F.col(f"c_bk{b}") for b in range(bands)])).alias(
            "band", "bucket"
        ),
    )
    p = packed(probes, "p_").select(
        "*",
        F.posexplode(F.array(*[F.col(f"p_bk{b}") for b in range(bands)])).alias(
            "band", "bucket"
        ),
    )
    joined = c.join(F.broadcast(p), ["band", "bucket"])
    first_match = F.lit(False)
    for bb in range(bands):
        no_earlier = F.lit(True)
        for e in range(bb):
            no_earlier = no_earlier & (F.col(f"c_bk{e}") != F.col(f"p_bk{e}"))
        first_match = first_match | ((F.col("band") == bb) & no_earlier)
    matches = sum(
        F.when(F.col(f"c_mh{j}") == F.col(f"p_mh{j}"), 1).otherwise(0)
        for j in range(num_hashes)
    )
    return (
        joined.filter(first_match)
        .select(
            F.col("c_id").alias("corpus_id"),
            F.col("p_id").alias("probe_id"),
            F.round(matches / F.lit(float(num_hashes)), 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
#
# 16-bit simhash over word md5s: bit i of the doc hash is the majority vote
# of bit i across its words' hashes. Near-dup candidates = pairs with
# hamming distance ≤ k (bit_count(xor) — cross-join here; at scale, block on
# bit-prefix chunks: two sigs within distance k share an identical chunk
# when split into k+1 chunks).
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """Per-doc simhash as BIGINT column ``sh`` (lowest ``bits`` bits).

    Row-local like ``minhash_signatures``: word hashes come from one
    ``transform`` over the doc's distinct tokens, bit-majority votes from
    per-bit ``aggregate`` folds — a map-only projection with no shuffle."""
    assert bits <= 16  # 4 hex chars of md5; extend by slicing more below
    ws = F.array_distinct(tokens(F.col(text_col)))
    # word hash bits from the first 4 hex chars of md5(w)
    hs = F.transform(ws, lambda w: F.conv(F.substring(F.md5(w), 1, 4), 16, 10).cast("long"))

    def vote(i: int):
        # closure capture, not a default arg (see hash_j in minhash_signatures)
        return F.aggregate(
            hs, F.lit(0).cast("long"), lambda acc, h: acc + (F.shiftright(h, i) % 2) * 2 - 1
        )

    votes = [vote(i) for i in range(bits)]
    sh = sum(
        F.when(v > 0, F.lit(2 ** i)).otherwise(F.lit(0)) for i, v in enumerate(votes)
    )
    n = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.where(F.col(text_col).isNotNull())
        .repartition(n, F.col(id_col))  # spread single-file scans (see minhash)
        .select(F.col(id_col).alias("doc_id"), sh.cast("long").alias("sh"))
    )


def _chunk_bounds(bits: int, chunks: int) -> list[tuple[int, int]]:
    """(shift, mask) per chunk, splitting ``bits`` as evenly as possible."""
    base, extra = divmod(bits, chunks)
    bounds, pos = [], 0
    for c in range(chunks):
        width = base + (1 if c < extra else 0)
        bounds.append((pos, (1 << width) - 1))
        pos += width
    return bounds


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16, max_hamming: int = 3
) -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming. Columns: a_id, b_id, hamming.

    Pigeonhole blocking instead of an all-pairs cross join: split the
    signature into ``max_hamming + 1`` bit-chunks — two signatures within
    hamming k MUST agree exactly on at least one chunk — and equi-join on
    (chunk index, chunk value). Each pair is emitted from its first
    matching chunk only, so no distinct() is needed. This is the scale
    path: candidate fan-out is governed by chunk width, and the join is a
    plain equi-join Spark can shuffle/broadcast/AQE-skew-split.
    """
    chunks = max_hamming + 1
    bounds = _chunk_bounds(bits, chunks)

    def chunk(col: Column, c: int) -> Column:
        shift, mask = bounds[c]
        return F.shiftright(col, shift).bitwiseAND(F.lit(mask))

    sh = simhash(df, id_col, text_col, bits).cache()
    buckets = sh.select(
        "doc_id",
        "sh",
        F.posexplode(F.array(*[chunk(F.col("sh"), c) for c in range(chunks)])).alias(
            "c", "ck"
        ),
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    joined = a.join(
        b,
        (F.col("a.c") == F.col("b.c"))
        & (F.col("a.ck") == F.col("b.ck"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    first_match = F.lit(False)
    for c in range(chunks):
        no_earlier = F.lit(True)
        for e in range(c):
            no_earlier = no_earlier & (
                chunk(F.col("a.sh"), e) != chunk(F.col("b.sh"), e)
            )
        first_match = first_match | ((F.col("a.c") == c) & no_earlier)
    return (
        joined.filter(first_match)
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding near-dup (cosine within a blocking key)
# ---------------------------------------------------------------------------


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, computed in double
    precision JVM-side (zip_with + aggregate — no UDF)."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(db, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate vector pairs within a blocking key (equi-join on the
    block, cosine filter). Columns: a_id, b_id, cos. At scale the block is
    an LSH bucket / coarse quantizer cell instead of a label."""
    a = df.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("va"), F.col(block_col).alias("blk")
    )
    b = df.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("vb"), F.col(block_col).alias("blk")
    )
    return (
        a.join(b, ["blk"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", "cos")
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC)
# ---------------------------------------------------------------------------


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    boundary_hex: str = "0",
) -> DataFrame:
    """Content-defined chunking: split text at positions where the hash of
    the trailing ``window`` chars hits a boundary pattern, then fingerprint
    each chunk. Because boundaries depend only on local content, an
    insertion early in a document shifts chunk *offsets* but not chunk
    *contents* — downstream dedup still matches the unshifted chunks,
    which fixed-size blocking cannot do (the rsync/LBFS trick applied to
    corpus boilerplate extraction).

    Boundary = md5 of the trailing window ending at position i has final
    hex digit in ``boundary_hex`` (1 char → p=1/16 → ~16-char mean chunks;
    tune with more/fewer accepted digits). Engine-portable by construction
    (md5 + substring only), so the whole operator has an exact SQL oracle.
    Map-only: transform/filter/zip_with per row, explode at the end — no
    shuffle until the caller aggregates fingerprints. At 100 TB swap the
    per-position md5 for a gear rolling hash in an Arrow-batched
    ``mapInPandas`` (same chunk semantics, one pass per row).

    Columns: <id_col>, chunk_idx, chunk_fp, chunk_len.
    """
    t = F.col(text_col)
    # md5 renders lowercase hex: an uppercase boundary char would never
    # match, silently disabling chunking (every doc = one whole chunk)
    accepted = [F.lit(c) for c in boundary_hex.lower()]
    # Guard: for length(t) < window Spark's sequence(window, length) counts
    # DOWN (step -1) — phantom boundaries with negative-start substrings
    # (which count from the string END). Short texts are one whole chunk,
    # matching the oracle's empty range(window, n+1).
    idx = F.when(F.length(t) >= window, F.sequence(F.lit(window), F.length(t))).otherwise(
        F.array().cast("array<int>")
    )

    def is_boundary(i: Column) -> Column:
        h = F.md5(t.substr(i - F.lit(window - 1), F.lit(window)))
        tail = F.substring(h, 32, 1)
        cond = F.lit(False)
        for a in accepted:
            cond = cond | (tail == a)
        return cond

    bnd = F.filter(
        F.transform(idx, lambda i: F.when(is_boundary(i), i)), lambda x: x.isNotNull()
    )
    starts = F.concat(F.array(F.lit(0)), bnd)
    ends = F.concat(bnd, F.array(F.length(t)))
    chunks = F.filter(
        F.zip_with(starts, ends, lambda s, e: t.substr(s + 1, e - s)),
        lambda c: F.length(c) > 0,
    )
    return (
        df.where(t.isNotNull())
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            id_col,
            "chunk_idx",
            F.md5("chunk").alias("chunk_fp"),
            F.length("chunk").alias("chunk_len"),
        )
    )


# ---------------------------------------------------------------------------
# Train/test decontamination
# ---------------------------------------------------------------------------


def _gram_postings(
    df: DataFrame, id_col: str, text_col: str, n: int, out: str
) -> DataFrame:
    """``(out, gh)`` postings: per-doc DISTINCT word n-grams as 8-byte
    xxhash64 keys. Shared by :func:`ngram_contamination` (per-test-doc
    counts) and :func:`contaminated_train_ids` (the train-side hit set) —
    both sides of a contamination join must hash grams identically."""
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.text import word_ngrams

    src = df.select(F.col(id_col).alias(out), F.col(text_col).alias("__t"))
    # An under-split input (e.g. one parquet file with one row group)
    # would serialize the gram explode — the query's dominant cost —
    # on a single core. Fan the narrow (id, text) rows out to the
    # session's parallelism first: one shuffle of ~input bytes buys
    # cores× explode throughput. Gated so it never fires on properly
    # split inputs — at 100 TB the corpus arrives in thousands of
    # splits and this is a no-op decision, keeping the "text never
    # shuffles" posture where it matters.
    target = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < max(2, target // 2):
        src = src.repartition(target)
    return src.select(
        out,
        F.explode(F.array_distinct(word_ngrams(F.col("__t"), n))).alias("g"),
    ).select(out, F.xxhash64("g").alias("gh"))


def contaminated_train_ids(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """The TRAIN-side hit set of the contamination join: distinct train
    doc ids sharing at least one word ``n``-gram with ANY test document —
    the removal candidates a decontamination pass hands to the dedup
    layer (see q243's cascade: hits expand to their near-dup clusters).

    Same postings substrate as :func:`ngram_contamination` (which
    aggregates the other side), same broadcast posture: the test side is
    the small one, the train corpus streams map-side, and the semi-join
    emits each train id once without materializing per-pair rows.
    Column: ``train_id``.
    """
    tr = _gram_postings(train, id_col, text_col, n, "train_id")
    te = _gram_postings(test, id_col, text_col, n, "test_id")
    return tr.join(F.broadcast(te.select("gh").distinct()), "gh", "left_semi").select(
        "train_id"
    ).distinct()


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark-decontamination sweep: for each *test* document, count the
    distinct *train* documents sharing at least one word ``n``-gram — the
    GPT-3-style contamination check (there 13-grams; ``n`` is a knob).

    Shape (100 TB posture): both sides reduce to ``(doc_id, hash(ngram))``
    postings — 8-byte xxhash64 keys (non-crypto: ~20% faster end-to-end
    than md5 and half the shuffle width; the hash is internal, only the
    match COUNTS are emitted, and a 2^-64 collision rate is far below the
    false-match rate of 5-gram contamination itself), never raw text — and
    meet in ONE equi-join on the gram hash. The test side is the small one
    (a benchmark suite, not the corpus), so Spark broadcasts it and the
    train corpus streams map-side; output cardinality is bounded by
    matches, not the corpus. Skewed grams (boilerplate phrases) are
    exactly the contamination signal, so they are kept, and AQE splits any
    oversized reducer.

    Columns: ``test_id, n_train_docs, n_shared_grams``.
    """
    tr = _gram_postings(train, id_col, text_col, n, "train_id")
    te = _gram_postings(test, id_col, text_col, n, "test_id")
    return (
        tr.join(F.broadcast(te), "gh")
        .groupBy("test_id")
        .agg(
            F.countDistinct("train_id").alias("n_train_docs"),
            F.countDistinct("gh").alias("n_shared_grams"),
        )
    )


def lsh_band_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """The raw LSH band-bucket relation ``(doc_id, band, bucket)`` —
    bands of the MinHash signature hashed to bucket keys, one row per
    (doc, band). The shared substrate of :func:`lsh_bucket_edges` (batch
    star edges) and streaming/lsh_ingest.py's persistent bucket index;
    both must bucket IDENTICALLY or streamed and batch dedup would
    disagree on candidates."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes)
    band_cols = [
        _band_key([F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)])
        for b in range(bands)
    ]
    return sig.select(
        "doc_id",
        F.posexplode(F.array(*band_cols)).alias("band", "bucket"),
    )


def lsh_bucket_edges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Closure edges for *threshold-free* LSH dedup without pair explosion:
    every band bucket contributes a STAR to its minimum doc id instead of
    its full clique. Columns: ``a_id`` (bucket min), ``b_id``.

    A star spans exactly the same connected component as the bucket's
    clique, so feeding these edges to :func:`~.graph.dedup_clusters` yields
    IDENTICAL clusters to closing over all candidate pairs (pinned in
    tests/test_scale_shakeout.py) — but the edge count is O(docs × bands),
    not O(Σ bucket²). At 100 TB this is the difference between a linear
    edge relation and quadratic blowup on boilerplate-heavy buckets: a
    1M-doc bucket emits 1M edges, not 5·10¹¹ pairs. Use when band collision
    alone defines duplication (no est-Jaccard cut on candidates); keep
    :func:`minhash_lsh_pairs` when pairs must be scored and thresholded.

    Bucket minima come from a partial-aggregated ``groupBy`` + join-back
    (not a window), so hot buckets map-side combine and AQE can split the
    skewed join. The same (a_id, b_id) edge may repeat across bands —
    harmless for min-label closure (idempotent) and cheaper than a
    distinct shuffle.
    """
    buckets = lsh_band_buckets(df, id_col, text_col, num_hashes, bands)
    mins = buckets.groupBy("band", "bucket").agg(F.min("doc_id").alias("a_id"))
    return (
        buckets.join(mins, ["band", "bucket"])
        .filter(F.col("doc_id") != F.col("a_id"))
        .select("a_id", F.col("doc_id").alias("b_id"))
    )


def dedup_close(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.0,
) -> DataFrame:
    """The fuzzy-dedup closer end-to-end — THE production entry point:
    MinHash banding → closure edges → connected components → representative
    flag. Columns: ``(doc_id, cluster_id, is_representative)``; filter on
    ``is_representative`` for the deduplicated corpus.

    With ``threshold=0`` (default) duplication is defined by band collision
    alone, so candidates come from :func:`lsh_bucket_edges` — O(docs×bands)
    star edges, never a bucket clique. This is the 100 TB path: a 1M-doc
    boilerplate bucket contributes 1M edges instead of 5·10¹¹ pairs, and
    the closure result is IDENTICAL to closing over all candidate pairs
    (star spans the same components; equivalence pinned in
    tests/test_scale_shakeout.py). Measured 3× faster than the pair path
    at sf0.1 (bench.py ``dedup_close_e2e`` vs ``diag_allpairs_close_pairs``).

    A ``threshold`` > 0 additionally requires estimated Jaccard ≥ threshold
    on each candidate pair, which needs the scored pairs from
    :func:`minhash_lsh_pairs` — quadratic in hot-bucket size; prefer more
    bands/rows over a threshold at scale.
    """
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.graph import (
        dedup_clusters,
    )

    keyed = docs if id_col == "doc_id" else docs.withColumn("doc_id", F.col(id_col))
    if threshold > 0:
        # threshold must flow INTO the pair generator: its own default
        # (0.5) filters first, which would silently clamp a lower ask
        pairs = minhash_lsh_pairs(
            keyed, "doc_id", text_col, num_hashes=num_hashes, bands=bands,
            threshold=threshold,
        )
    else:
        pairs = lsh_bucket_edges(
            keyed, "doc_id", text_col, num_hashes=num_hashes, bands=bands
        )
    out = dedup_clusters(pairs, keyed)
    return out if id_col == "doc_id" else out.withColumnRenamed("doc_id", id_col)


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Exact-substring duplication spans — the distributed rendering of
    suffix-array training-data dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): every maximal token span of a
    document that also occurs elsewhere in the corpus (or again in the same
    document) as a run of duplicated ``k``-token grams, with overlapping
    gram hits merged into intervals.

    Returns one row per merged span: ``(doc_id, span_start, span_end,
    n_tokens)`` with token-index bounds (``span_end`` exclusive) and the
    document's total token count — callers roll up ``span_end - span_start``
    for the duplicated-token fraction, or slice the span text out for
    removal.

    How it scales (the suffix array itself is inherently sequential; this
    is the shuffle-native equivalent):

    1. map-only: explode each doc into ``(pos, xxhash64(k-gram))`` — 8-byte
       keys, never gram text;
    2. one partial-aggregated groupBy over gram hashes keeps hashes seen
       more than once (the duplicated-gram set is a tiny fraction of all
       grams in a real corpus);
    3. a semi-join marks duplicated positions, then a per-doc window pass
       (classic interval merge: running-max of span ends, new span when a
       gram starts past it) coalesces runs. The window partitions by
       doc_id — bounded by doc length, no global sort.

    The gram width ``k`` is the dedup resolution (Lee et al. use 50 BPE
    tokens); duplicated grams shorter than ``k`` are invisible by design.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("ws"),
    ).filter(F.size("ws") >= k)
    grams = toks.select(
        "doc_id",
        F.size("ws").alias("n_tokens"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(ws) - {k}), "
                f"i -> xxhash64(concat_ws(' ', slice(ws, i + 1, {k}))))"
            )
        ).alias("pos", "gh"),
    )
    dup_grams = grams.groupBy("gh").agg(F.count("*").alias("c")).filter(F.col("c") > 1)
    hits = grams.join(dup_grams.select("gh"), "gh").select(
        "doc_id",
        "n_tokens",
        F.col("pos").alias("s"),
        (F.col("pos") + k).alias("e"),
    )
    w = Window.partitionBy("doc_id").orderBy("s")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = hits.withColumn(
        "new_span",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
    )
    sid = flagged.withColumn(
        "span_id", F.sum("new_span").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sid.groupBy("doc_id", "n_tokens", "span_id")
        .agg(F.min("s").alias("span_start"), F.max("e").alias("span_end"))
        .select("doc_id", "span_start", "span_end", "n_tokens")
    )
