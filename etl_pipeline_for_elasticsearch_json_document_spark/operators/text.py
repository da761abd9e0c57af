"""Text-analysis operators for LLM training-data pipelines.

All hot-path logic is built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen-friendly) — no Python UDFs. Each operator takes a
DataFrame with a text column and returns per-document metrics; at 100 TB
these are embarrassingly parallel map-only transforms (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space split, matching the synthetic
    corpus; swap the pattern for real data)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_ratio(text: Column, stopwords=DEFAULT_STOPWORDS) -> Column:
    ws = tokens(text)
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(ws, lambda x: F.array_contains(sw, x))) / F.size(ws)


def avg_token_length(text: Column) -> Column:
    ws = tokens(text)
    total = F.aggregate(ws, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x))
    return total / F.size(ws)


def quality_score(text: Column, stopwords=DEFAULT_STOPWORDS) -> Column:
    """Toy composite quality score: rewards mid-length docs with a healthy
    stopword ratio — the *shape* of a production quality scorer (per-doc
    arithmetic over token stats; codegen-able, shuffle-free)."""
    n = token_count(text)
    sw = stopword_ratio(text, stopwords)
    len_term = F.least(n / F.lit(100.0), F.lit(1.0))
    sw_term = F.lit(1.0) - F.abs(sw - F.lit(0.1))
    return F.round(len_term * sw_term, 6)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the case/whitespace
    normalized text. Exact-dup detection at scale = one hash + groupBy on a
    16-byte key instead of comparing full documents."""
    normalized = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.md5(normalized)


def bigrams(text: Column) -> Column:
    """Word bigrams via zip_with over offset slices (no explode needed until
    the caller counts them)."""
    ws = tokens(text)
    n = F.size(ws)
    return F.zip_with(
        F.slice(ws, 1, n - 1), F.slice(ws, 2, n - 1), lambda a, b: F.concat_ws(" ", a, b)
    )


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined), the standard dedup unit for
    near-duplicate detection at corpus scale. Map-only: a ``transform`` over
    index positions, no explode until the caller needs rows. Documents with
    fewer than ``n`` tokens yield an empty array (never a descending
    ``sequence`` — Spark's sequence counts DOWN when start > stop)."""
    ws = tokens(text)
    cnt = F.size(ws)
    grams = F.transform(
        F.sequence(F.lit(1), cnt - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
    )
    return F.when(cnt >= n, grams).otherwise(F.array().cast("array<string>"))


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Character n-gram shingles (for MinHash / language-ID features)."""
    t = F.regexp_replace(F.lower(text), r"\s+", " ")
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - F.lit(n - 1), F.lit(1))),
        lambda i: F.substring(t, i, n),
    )


#: RE2-compatible patterns (work identically in Java regex and DuckDB's RE2,
#: so redaction queries stay oracle-checkable): no lookarounds, no backrefs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{2,6}"


def redact_pii(text: Column, patterns: dict[str, str] | None = None) -> Column:
    """Scrub PII-shaped spans: each pattern is replaced by its ``[TAG]``.

    Pure ``regexp_replace`` chain — map-only, shuffle-free, codegen-able;
    the patterns are deliberately RE2-safe so the same redaction is
    expressible in other engines for verification.
    """
    out = text
    for tag, pat in (patterns or {"EMAIL": EMAIL_RE, "PHONE": PHONE_RE}).items():
        out = F.regexp_replace(out, pat, f"[{tag}]")
    return out


def language_id(text: Column) -> Column:
    """Heuristic language ID over character classes / frequent-word hits.

    A real implementation scores char-n-gram profiles per language; the
    synthetic corpus has no language signal, so this demonstrates the
    operator shape (pure-expression scoring, no shuffle) with a tiny
    frequent-word profile table inlined as a CASE cascade.
    """
    t = F.lower(text)
    return (
        F.when(t.rlike(r"\b(der|die|das|und|ist)\b"), "de")
        .when(t.rlike(r"\b(le|la|les|et|est)\b"), "fr")
        .when(t.rlike(r"\b(el|los|las|es|y)\b"), "es")
        .when(t.rlike(r"[一-鿿]"), "zh")
        .otherwise("en")
    )


def normalized_chars(text: Column) -> Column:
    """Case/whitespace-normalized character stream (the winnowing and
    fingerprinting preprocessing step)."""
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def winnow_gram_hashes(text: Column, k: int = 5) -> Column:
    """Hashes of all character k-grams of the normalized text — the rolling-
    hash stream winnowing samples from. Map-only ``transform`` over substring
    positions (no explode); each hash is an 8-hex-char md5 prefix so the
    identical stream is expressible in any engine with md5.

    Texts shorter than k yield an empty array (guarding Spark's descending
    ``sequence`` when start > stop)."""
    t = normalized_chars(text)
    n = F.length(t)
    grams = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.substring(F.md5(t.substr(i, F.lit(k))), 1, 8),
    )
    return F.when(n >= k, grams).otherwise(F.array().cast("array<string>"))


def winnow_select(gram_hashes: Column, window: int = 4) -> Column:
    """Winnowing (Schleimer, Wilkerson & Aiken — the MOSS fingerprint): keep
    the minimum hash of every ``window`` consecutive k-gram hashes, then
    distinct. Guarantees any shared substring of length >= k + window - 1
    contributes at least one shared fingerprint, while keeping only
    ~2/(window+1) of the grams — the sampled sketch that replaces full
    shingle postings at corpus scale. Pure array ops, shuffle-free."""
    m = F.size(gram_hashes)
    wins = F.transform(
        F.sequence(F.lit(1), m - F.lit(window - 1)),
        lambda j: F.array_min(F.slice(gram_hashes, j, window)),
    )
    return F.when(m >= window, F.array_distinct(wins)).otherwise(
        F.array().cast("array<string>")
    )


#: Portable GPT-2-style pre-tokenizer: runs of letters, single digits, runs
#: of other non-space symbols. Deliberately RE2-safe (no \p classes, no
#: lookarounds) so token counts are reproducible in any RE2/Java-regex
#: engine for verification.
BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+"


def bpe_pretokens(text: Column) -> Column:
    """BPE-style pre-tokenization (the split-points a byte-pair encoder
    merges within): array of pretoken strings. regexp_extract_all is a
    single codegen-able JVM expression — no UDF, no explode."""
    return F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), 0)


def overlapping_chunks(text: Column, window: int = 64, stride: int = 48) -> Column:
    """RAG/context-window chunking: overlapping word-window chunks as an
    array of structs (chunk_idx, start_word, n_words, chunk) — the unit a
    retrieval or packing pipeline embeds/indexes instead of whole documents.

    Chunk i covers words [1 + i*stride, 1 + i*stride + window); the number
    of chunks is 1 for docs of <= ``window`` words, else
    ceil((n - window) / stride) + 1, so the final chunk always reaches the
    document tail and every word is covered. Map-only ``transform`` over
    chunk indices (no explode until the caller needs rows), so at 100 TB
    this is an embarrassingly parallel projection with zero shuffle.
    """
    ws = tokens(text)
    n = F.size(ws)
    n_chunks = F.when(
        n <= window, F.lit(1).cast("long")
    ).otherwise(F.ceil((n - F.lit(window)) / F.lit(float(stride))).cast("long") + 1)
    return F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0).cast("long"), n_chunks - 1),
            lambda i: F.struct(
                i.alias("chunk_idx"),
                (i * stride + 1).alias("start_word"),
                F.least(F.lit(window).cast("long"), n - i * stride).alias("n_words"),
                F.array_join(F.slice(ws, i * stride + 1, window), " ").alias("chunk"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<chunk_idx:long,start_word:long,n_words:long,chunk:string>>"
    ))
