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
