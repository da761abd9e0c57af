"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (broadcast the query set, score
JVM-side, per-query Window top-k). Scale path: random-hyperplane LSH
bucketing so each query scores only its bucket's candidates, with
multi-probe via several independent hash tables.

All scoring is built-in expressions (zip_with/aggregate) in double
precision — no UDFs, fully codegen-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_for_elasticsearch_json_document_spark.operators.dedup import cosine


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is broadcast (it is small by construction); the corpus
    streams through one map-side scoring pass, then a per-query Window
    takes the top-k. Ties broken by neighbor id for determinism.
    Columns: q_id, n_id, cos, rank.
    """
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("nv")), 6))
        .select("q_id", "n_id", "cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 3,
) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the top-k
    most-similar vectors with a DIFFERENT label (the negatives a
    contrastive trainer most needs), alongside the query's best same-label
    cosine (its positive) and the pos-neg margin.

    One broadcast scoring pass over the corpus, one shuffle by query id:
    the positive's cosine is a conditional window max over the same scored
    relation, so negatives and positives never need separate scans. Ties
    broken by neighbor id for determinism. Columns: q_id, n_id, neg_cos,
    rank, pos_cos, margin.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
        F.col(label_col).alias("q_label"),
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("nv"),
        F.col(label_col).alias("n_label"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("nv")), 6))
        .select("q_id", "q_label", "n_id", "n_label", "cos")
    )
    per_q = Window.partitionBy("q_id")
    scored = scored.withColumn(
        "pos_cos",
        F.max(F.when(F.col("n_label") == F.col("q_label"), F.col("cos"))).over(per_q),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.filter(F.col("n_label") != F.col("q_label"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "n_id",
            F.col("cos").alias("neg_cos"),
            "rank",
            "pos_cos",
            F.round(F.col("pos_cos") - F.col("cos"), 6).alias("margin"),
        )
    )


def _hyperplane(dim: int, plane: int, table: int) -> list[float]:
    """Deterministic pseudo-random hyperplane components in [-1, 1), derived
    from md5 — reproducible across runs/engines with no RNG state."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(f"{table}:{plane}:{i}".encode()).hexdigest()[:8]
        out.append((int(h, 16) / float(2**31)) - 1.0)
    return out


def lsh_bucket_expr(vec_col, dim: int, planes: int, table: int):
    """Random-hyperplane LSH bucket id: one bit per plane = sign(v·h)."""
    bits = []
    for p in range(planes):
        h = _hyperplane(dim, p, table)
        harr = F.array(*[F.lit(x) for x in h])
        dot = F.aggregate(
            F.zip_with(vec_col, harr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(2**p)).otherwise(F.lit(0)))
    return sum(bits).cast("long")


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    planes: int = 4,
    tables: int = 8,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket with
    the query in any of ``tables`` independent hash tables.

    At 100 TB the corpus is written bucketed/partitioned by (table, bucket)
    so a query touches ~(corpus / 2^planes) rows per table — an equi-join
    on short keys instead of a full scan. Columns: q_id, n_id, cos, rank.
    """
    def bucketize(df, idc, out_id):
        parts = []
        for t in range(tables):
            parts.append(
                df.select(
                    F.col(idc).alias(out_id),
                    F.col(vec_col).alias(out_id + "_v"),
                    F.lit(t).alias("tbl"),
                    lsh_bucket_expr(F.col(vec_col), dim, planes, t).alias("bucket"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    qb = bucketize(queries, id_col, "q_id")
    cb = bucketize(corpus, id_col, "n_id")
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bucket"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "q_id_v", "n_id", "n_id_v")
        .distinct()
    )
    scored = cand.withColumn(
        "cos", F.round(cosine(F.col("q_id_v"), F.col("n_id_v")), 6)
    ).select("q_id", "n_id", "cos")
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Element-wise mean vector per label — the aggregation primitive under
    k-means / IVF codebook training and class-prototype embedding.

    ``posexplode`` fans each vector out to (label, dim, x) rows and a single
    hash aggregation computes every (label, dim) mean; Catalyst's partial
    (map-side) aggregation means the shuffle carries one partial sum per
    (label, dim) per task — ~labels × dim rows — not the exploded data, so
    this holds at any corpus size. Sums run in DECIMAL(18,9) (exact,
    associative) so the result is independent of partitioning/add order —
    float sums are not. Columns: label, dim, c (rounded mean), n_vecs.
    """
    ex = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    )
    return ex.groupBy("label", "dim").agg(
        F.round(
            F.sum(F.col("x").cast("double").cast("decimal(18,9)")).cast("double")
            / F.count("*"),
            6,
        ).alias("c"),
        F.count("*").alias("n_vecs"),
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    assign: str = "expr",
) -> DataFrame:
    """Deterministic Lloyd's k-means fit — the codebook trainer that
    produces :func:`knn_ivf`'s centroid table (and PQ sub-codebooks).

    ``assign`` picks the per-iteration assignment engine: ``'expr'``
    (default) inlines one distance expression per centroid — the
    oracle-checked small-k form whose plan grows O(k·dim); ``'pandas'``
    scores each Arrow batch against the broadcast codebook matrix with a
    BLAS matmul (see :func:`kmeans_assign_pandas`) — plan size O(1) in
    k, the only fittable form at real IVF cell counts (thousands). Both
    run the SAME exact-decimal centroid update; they can differ only
    where a vector is equidistant to two centroids at float precision.

    Unlike an operator, a FIT is an iterative algorithm: each Lloyd round
    runs one Spark job and syncs k×dim doubles to the driver (MLlib-style;
    the sync is centroids, never data). Every step is reproducible across
    runs, partitionings, and engines:

    - init = the first ``k`` vectors by id (no seeded sampling to disagree
      about),
    - assignment = argmin of an index-ordered left-fold L2 (``_l2sq``),
      ties broken on centroid id via struct comparison,
    - update = per-dim DECIMAL(18,9) sums (exact, associative — float
      partial sums would make the fit partition-order-dependent) divided
      in IEEE double.

    An emptied cluster keeps its previous centroid. Returns a k-row
    DataFrame ``(id_col, vec_col array<double>)`` ready for ``knn_ivf``.
    """
    spark = df.sparkSession
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    init = v.orderBy(id_col).limit(k).collect()
    centroids: list[list[float]] = [list(r["__v"]) for r in init]
    dim = len(centroids[0])

    if assign not in ("expr", "pandas"):
        raise ValueError(f"unknown assign method {assign!r}; use 'expr' or 'pandas'")
    for _ in range(iterations):
        if assign == "pandas":
            cent_df = spark.createDataFrame(
                [(ci, c) for ci, c in enumerate(centroids)],
                f"{id_col} long, {vec_col} array<double>",
            )
            asg = kmeans_assign_pandas(
                v.select(F.col(id_col), F.col("__v").alias(vec_col)),
                cent_df,
                id_col,
                vec_col,
                # raw distances: the fit's expr branch (and the q138
                # oracle's SQL replay) compare UNROUNDED folds
                round_before_argmin=False,
            ).select("cid", F.col("vec_id").alias("__aid")).join(
                v.select(F.col(id_col).alias("__aid"), "__v"), "__aid"
            ).select("cid", "__v")
        else:
            cand = [
                F.struct(
                    _l2sq(F.col("__v"), F.array(*[F.lit(x) for x in c])).alias("d"),
                    F.lit(ci).alias("c"),
                )
                for ci, c in enumerate(centroids)
            ]
            asg = v.select(F.least(*cand)["c"].alias("cid"), "__v")
        sums = (
            asg.select("cid", F.posexplode("__v").alias("dim", "x"))
            .groupBy("cid", "dim")
            .agg(
                F.sum(F.col("x").cast("decimal(18,9)")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new = [list(c) for c in centroids]  # empty cluster keeps its centroid
        for r in sums:
            new[r["cid"]][r["dim"]] = float(r["s"]) / r["n"]
        centroids = new

    return spark.createDataFrame(
        [(ci, c) for ci, c in enumerate(centroids)],
        f"{id_col} long, {vec_col} array<double>",
    )


def kmeans_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment against a fitted codebook: map-only
    (centroid literals ride the closure via a broadcast-sized collect),
    emitting ``(id, cid, dist)`` with the same ordered-fold distance and
    id tiebreak as the fit. ``dist`` is rounded to 6 so downstream
    aggregates are cross-engine exact."""
    cents = sorted(
        (r[id_col], list(r[vec_col])) for r in centroids.collect()
    )
    cand = [
        F.struct(
            F.round(
                _l2sq(F.col("__v"), F.array(*[F.lit(x) for x in c])), 6
            ).alias("d"),
            F.lit(ci).alias("c"),
        )
        for ci, c in cents
    ]
    best = F.least(*cand)
    return df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).select(
        id_col,
        best["c"].alias("cid"),
        best["d"].alias("dist"),
    )


def _l2sq(a, b):
    """Squared L2 distance of two array<double> columns (zip_with/aggregate
    left fold — same evaluation order as the oracle's list_sum)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _subvectors(df: DataFrame, id_col: str, vec_col: str, m: int, sub_dim: int, out_id: str) -> DataFrame:
    """One row per (id, subspace) with the sub_dim-wide double subvector."""
    sub = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.transform(
                F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim),
                lambda x: x.cast("double"),
            ),
        )
    )
    return df.select(F.col(id_col).alias(out_id), sub.alias("s", "v"))


def knn_pq(
    corpus: DataFrame,
    queries: DataFrame,
    codebook_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    sub_dim: int = 8,
    k: int = 5,
) -> DataFrame:
    """Approximate top-k via product quantization (asymmetric distance).

    The classic memory-bound ANN design (Jégou et al., PAMI 2011), built
    entirely from relational ops so it has an exact SQL oracle:

    1. Split every vector into ``m`` subvectors of ``sub_dim`` dims.
    2. Encode the corpus: per (vector, subspace), the id of the nearest
       codebook centroid — ``m`` small codes replace the full vector
       (here m×1 ids ≈ 8 bytes vs 256 bytes of floats: 32× compression).
    3. ADC scoring: per query, precompute the distance to every centroid in
       every subspace (an m × n_centroids lookup table, broadcast), then a
       query↔corpus distance is just the SUM of m table lookups — no float
       vector math against the corpus at all.

    At 100 TB the corpus stores only codes (re-encoded once), the lookup
    tables are KBs per query, and scoring is an equi-join on (s, cid) + a
    sum — embarrassingly parallel, no full-vector I/O. Distances are
    rounded then summed as DECIMAL(18,6) so ranking is add-order-independent
    and tie-breaks (then by id) reproduce across engines.

    Codebook here = caller-supplied training vectors (deterministic,
    oracle-checkable stand-in for sampled k-means — same protocol as
    :func:`knn_ivf`). Columns: q_id, n_id, adist, rank.
    """
    cb = F.broadcast(
        _subvectors(codebook_vectors, id_col, vec_col, m, sub_dim, "cid").select(
            "cid", "s", F.col("v").alias("cv")
        )
    )
    # encode: nearest centroid per (corpus vector, subspace); min_by on the
    # (dist, cid) struct gives the deterministic argmin in one partial agg
    codes = (
        _subvectors(corpus, id_col, vec_col, m, sub_dim, "n_id")
        .join(cb, "s")
        .withColumn("d", F.round(_l2sq(F.col("v"), F.col("cv")), 6))
        .groupBy("n_id", "s")
        .agg(F.min_by("cid", F.struct("d", "cid")).alias("cid"))
    )
    # ADC lookup tables: distance from each query subvector to each centroid
    qd = (
        _subvectors(queries, id_col, vec_col, m, sub_dim, "q_id")
        .join(cb, "s")
        .select(
            "q_id",
            "s",
            "cid",
            F.round(_l2sq(F.col("v"), F.col("cv")), 6)
            .cast("decimal(18,6)")
            .alias("qdist"),
        )
    )
    scored = (
        codes.join(F.broadcast(qd), ["s", "cid"])
        .filter(F.col("n_id") != F.col("q_id"))
        .groupBy("q_id", "n_id")
        .agg(F.round(F.sum("qdist").cast("double"), 6).alias("adist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adist"), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "adist", "rank")
    )


def knn_pq_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    codebook_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    sub_dim: int = 8,
    k: int = 5,
    shortlist: int = 50,
) -> DataFrame:
    """PQ two-stage search: ADC shortlist (:func:`knn_pq`, code-only scan —
    cheap) then exact cosine re-rank of the shortlist (full vectors fetched
    for ``shortlist`` rows per query only). This is how PQ is deployed:
    quantization error caps shortlist precision, not final precision —
    recall is governed by the shortlist size. Columns: q_id, n_id, cos,
    rank."""
    short = knn_pq(
        corpus, queries, codebook_vectors, id_col, vec_col, m, sub_dim, k=shortlist
    ).select("q_id", "n_id")
    qv = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    nv = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
    scored = (
        short.join(F.broadcast(qv), "q_id")
        .join(nv, "n_id")
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("nv")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index.

    Every corpus vector is assigned to its nearest centroid (one broadcast
    cross join + a map-side ``max_by`` partial aggregation — no window
    sort); each query probes its ``nprobe`` nearest partitions and scores
    only the vectors assigned there. At 100 TB the corpus is written
    partitioned by ``cid`` so a probe reads nprobe/n_centroids of the data
    (partition pruning), and centroids come from a sampled k-means fit —
    here they are caller-supplied, which keeps the operator deterministic
    and oracle-checkable. Cosines are rounded *before* every argmax/rank
    so tie-breaks (then by id) are reproducible across engines.

    Columns: q_id, n_id, cos, rank.
    """
    cent = F.broadcast(
        centroids.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    )
    v = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
    asg = (
        v.crossJoin(cent)
        .withColumn("ccos", F.round(cosine(F.col("nv"), F.col("cv")), 6))
        .groupBy("n_id")
        .agg(
            F.max_by(
                F.struct("cid", "nv"), F.struct(F.col("ccos"), -F.col("cid"))
            ).alias("m")
        )
        .select(F.col("m.cid").alias("cid"), "n_id", F.col("m.nv").alias("nv"))
    )
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    w_probe = Window.partitionBy("q_id").orderBy(F.col("ccos").desc(), F.col("cid"))
    probes = (
        q.crossJoin(cent)
        .withColumn("ccos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "qv", "cid")
    )
    scored = (
        asg.join(F.broadcast(probes), "cid")
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("nv")), 6))
    )
    w_k = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_k))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


def scalar_quantize(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", levels: int = 255
) -> DataFrame:
    """Int8-style scalar quantization of an embedding column — the vector-DB
    compression step (4 bytes/dim float -> 1 byte/dim code, 4× smaller
    shuffles and scans for every downstream ANN pass).

    Two stages, both scale-clean:
      1. per-dimension (min, max) calibration: posexplode -> one partial-
         aggregated groupBy(dim) -> collapse to a SINGLE row holding the
         mins/maxs arrays (dim entries), crossJoin-broadcast back — the
         same broadcast-1-row-aggregate shape as q56's TF-IDF corpus size,
         so no driver-side action materializes the stats;
      2. map-only encode: codes[i] = round((x[i]-min[i]) / (max[i]-min[i])
         * levels), plus the reconstruction the decoder would see and the
         per-vector max absolute error. DECIMAL error sums keep the result
         independent of partitioning/add order.

    Columns: id, codes (array<int>), max_abs_err, sum_abs_err (decimal).
    """
    # float32 inputs are cast to double up front so every engine runs the
    # identical IEEE-double arithmetic (float32 values are exact in double)
    ex = df.select(F.posexplode(F.col(vec_col)).alias("dim", "x0")).select(
        "dim", F.col("x0").cast("double").alias("x")
    )
    stats = (
        ex.groupBy("dim")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .groupBy()
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "lo"))).alias("los"),
            F.array_sort(F.collect_list(F.struct("dim", "hi"))).alias("his"),
        )
        .select(
            F.transform("los", lambda s: s["lo"]).alias("los"),
            F.transform("his", lambda s: s["hi"]).alias("his"),
        )
    )
    q = df.crossJoin(F.broadcast(stats))
    vec = F.col(vec_col)
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    x = lambda i: F.element_at(vec, i + 1).cast("double")  # noqa: E731
    lo = lambda i: F.element_at("los", i + 1)  # noqa: E731
    span = lambda i: F.element_at("his", i + 1) - F.element_at("los", i + 1)  # noqa: E731
    # constant dimensions (span 0 — common with zero-padded embeddings)
    # quantize to code 0 / zero error instead of dividing by zero (which
    # ANSI mode turns into a job-killing exception)
    code = lambda i: F.when(span(i) == 0, F.lit(0)).otherwise(  # noqa: E731
        F.round((x(i) - lo(i)) / span(i) * levels, 0).cast("int")
    )
    recon = lambda i: lo(i) + code(i) * span(i) / levels  # noqa: E731
    err = F.transform(idx, lambda i: F.abs(x(i) - recon(i)))
    return q.select(
        F.col(id_col),
        F.transform(idx, code).alias("codes"),
        F.round(F.array_max(err), 6).alias("max_abs_err"),
        # decimal accumulation (exact, add-order-independent), emitted as a
        # rounded double — raw decimals render with trailing zeros that
        # differ across client libraries
        F.round(
            F.aggregate(
                err,
                F.lit(0).cast("decimal(18,9)"),
                # decimal + decimal widens the type; cast back each step to
                # keep the accumulator type stable (aggregate requires it)
                lambda acc, e: (acc + e.cast("decimal(18,9)")).cast("decimal(18,9)"),
            ).cast("double"),
            6,
        ).alias("sum_abs_err"),
    )


def kmeans_assign_pandas(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_before_argmin: bool = True,
) -> DataFrame:
    """Nearest-centroid assignment for LARGE codebooks — the Arrow path.

    :func:`kmeans_assign` inlines one distance expression per centroid
    into the plan: plan size (and codegen cost) grow O(k·dim), fine for
    the oracle-checked k≤16 queries, impossible at real IVF scale
    (k = thousands of cells). This variant broadcasts the codebook as one
    k×dim float64 matrix and scores each Arrow batch with a BLAS matmul
    (``‖x‖² − 2xCᵀ + ‖c‖²``): plan size O(1) in k, O(N·dim·k) FLOPs in
    vectorized native code, no row blowup (a dim-join formulation would
    materialize N·dim·k rows — strictly worse).

    Same output columns ``(vec_id, cid, dist)`` and the same tiebreak:
    distances are rounded to 6 dp BEFORE the argmin (centroid rows are
    sorted by cid; argmin takes the first minimum), mirroring the
    expression path's round-then-``struct``-least — so any two centroids
    within 1e-6 of a vector resolve to the same lowest cid on both paths,
    not just exact float ties. The expansion identity sums in a different
    order than the expr path's pairwise form, so pre-rounding inputs can
    still differ in the 7th digit; if that flips a 6-dp comparison the
    paths may diverge — use ONE path consistently per store (tests pin
    cid parity incl. a synthetic ~1e-8 near-tie). Deterministic for a
    fixed build: numpy reduces each batch's rows identically regardless
    of which executor runs it.

    ``round_before_argmin=False`` argmins the RAW distances — the mode
    :func:`kmeans_fit`'s per-iteration step uses, because the fit's expr
    branch (and the q138 oracle's SQL replay of it) compares unrounded
    fold distances; only the FINAL operator-level assignment carries the
    6-dp contract.
    """
    import numpy as np

    cents = sorted((r[0], list(r[1])) for r in centroids.select(id_col, vec_col).collect())
    cids = np.array([c for c, _ in cents], dtype=np.int64)
    C = np.array([v for _, v in cents], dtype=np.float64)  # k × dim
    cnorm = (C * C).sum(axis=1)

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            d = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + cnorm[None, :]
            np.maximum(d, 0.0, out=d)  # expansion identity can dip below 0
            # Round BEFORE argmin so near-ties within 1e-6 break to the
            # first (lowest-cid) column, exactly like the expression path's
            # round-then-struct-least tiebreak — without this, two centroids
            # ~1e-6 apart from a vector could get different cells across the
            # two paths.
            if round_before_argmin:
                np.round(d, 6, out=d)
            best = d.argmin(axis=1)
            dist = np.round(d[np.arange(len(best)), best], 6)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].astype("int64"),
                    "cid": cids[best],
                    "dist": dist,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        assign, schema="vec_id long, cid long, dist double"
    )
