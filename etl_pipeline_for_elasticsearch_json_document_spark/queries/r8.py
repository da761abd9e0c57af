"""Round-8 query registrations: the corpus-economics layer of an LLM data
pipeline — the decontamination DECISION score (per-test-doc shared-gram
fraction, where q100 only counts carriers), the dedup cost/benefit pareto
(what each cluster-size band of near-dups would save), cross-source
mirroring and head-template detection (which feeds dominate the
boilerplate), the gram document-frequency spectrum (the corpus'
duplication fingerprint), packing-boundary economics (how many docs a
context size splits across pack boundaries), per-dimension embedding clip
calibration, label-cluster silhouettes, plus two relational analytics
shapes the TPC-H side lacked: market-basket lift over order baskets and
supplier-concentration HHI.

Every query follows the registry's cross-engine determinism rules
(registry.py docstring): float outputs are single divisions of exact
integer/decimal aggregates, or DECIMAL sums of pre-rounded 6-dp terms;
ranking never ties on raw doubles.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_for_elasticsearch_json_document_spark.operators import dedup, graph
from etl_pipeline_for_elasticsearch_json_document_spark.queries.r7 import (
    _star_cluster_cte,
)
from etl_pipeline_for_elasticsearch_json_document_spark.queries.registry import query
from etl_pipeline_for_elasticsearch_json_document_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q193: contamination fraction — the thresholdable decontamination score
# ---------------------------------------------------------------------------


@query(
    "q193_contamination_fraction",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(ws) - 3),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                      ws[i+3] || ' ' || ws[i+4]))) AS g
      FROM toks),
tr AS (SELECT DISTINCT g FROM g WHERE doc_id % 10 <> 0),
te AS (SELECT doc_id AS test_id, g FROM g WHERE doc_id % 10 = 0)
SELECT test_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       round(CAST(sum(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*), 6) AS contamination
FROM te LEFT JOIN tr ON te.g = tr.g
GROUP BY test_id
""",
    doc="The decontamination DECISION score q100 stops short of: per "
    "held-out test doc, the FRACTION of its distinct word 5-grams that "
    "appear anywhere in train — the thresholdable quantity (PaLM drops at "
    ">=70% overlap) where q100 only counts carrier docs. Test docs with "
    "<5 words carry no grams and drop out of both engines identically. "
    "Determinism: integer counts + one division, rounded. Scale: both "
    "sides reduce to 8-byte xxhash64 gram keys (collision odds ~2^-64 — "
    "counts only, no text); the train side collapses to DISTINCT gram "
    "hashes before the join, so the probe is |vocab|, not |corpus|; "
    "the test side is the small relation by construction.",
)
def q193(spark, sf_dir):
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.text import (
        word_ngrams,
    )

    d = _t(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.col("text"), 5))).alias("g"),
    ).select("doc_id", F.xxhash64("g").alias("gh"))
    tr = (
        grams.filter(F.col("doc_id") % 10 != 0)
        .select("gh")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    te = grams.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("test_id"), "gh"
    )
    return (
        te.join(tr, "gh", "left")
        .groupBy("test_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("bigint").alias("n_shared"),
            F.round(
                F.sum(F.coalesce("__hit", F.lit(0))).cast("double") / F.count("*"),
                6,
            ).alias("contamination"),
        )
    )


# ---------------------------------------------------------------------------
# q194: dedup pareto — cost/benefit by near-dup cluster size
# ---------------------------------------------------------------------------


@query(
    "q194_dedup_pareto",
    oracle=f"""
WITH RECURSIVE
{_star_cluster_cte()},
sized AS (SELECT c.cluster_id,
                 count(*) AS cluster_size,
                 sum(d.n_chars) AS chars_total,
                 min(d.n_chars + (CASE WHEN d.doc_id = c.cluster_id
                                  THEN 0 ELSE 100000000 END)) AS chars_kept
          FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
          GROUP BY c.cluster_id)
SELECT cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(cluster_size - 1) AS BIGINT) AS docs_removed,
       CAST(sum(chars_total - chars_kept) AS BIGINT) AS chars_removed
FROM sized GROUP BY cluster_size
""",
    doc="Dedup cost/benefit pareto: for each near-dup cluster size under "
    "the q103 LSH keep-min-id policy, how many clusters exist and what "
    "deleting the non-representatives saves (docs and characters) — the "
    "curve that says whether dedup pays (mass in big clusters) or is all "
    "singleton noise, BEFORE anything is deleted. chars_kept isolates the "
    "representative's size via a min over (n_chars + big-M for "
    "non-reps) — pure integer arithmetic, no join back. Determinism: "
    "exact integer counts/sums end to end. Scale: edges are the linear "
    "star set (O(docs x bands)); the per-cluster rollup and the size "
    "histogram are two partial-agg groupBys on ids and counts — text "
    "never shuffles.",
)
def q194(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    edges = dedup.lsh_bucket_edges(d, "doc_id", "text", num_hashes=16, bands=4)
    clusters = graph.dedup_clusters(edges, d, id_col="doc_id").select(
        "doc_id", "cluster_id"
    )
    sized = (
        clusters.join(d.select("doc_id", "n_chars"), "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("cluster_size"),
            F.sum("n_chars").alias("chars_total"),
            F.min(
                F.col("n_chars")
                + F.when(F.col("doc_id") == F.col("cluster_id"), 0).otherwise(
                    100_000_000
                )
            ).alias("chars_kept"),
        )
    )
    return sized.groupBy("cluster_size").agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum(F.col("cluster_size") - 1).cast("bigint").alias("docs_removed"),
        F.sum(F.col("chars_total") - F.col("chars_kept"))
        .cast("bigint")
        .alias("chars_removed"),
    )


# ---------------------------------------------------------------------------
# q195: cross-source duplication matrix
# ---------------------------------------------------------------------------


@query(
    "q195_source_dup_matrix",
    oracle="""
WITH segs AS (
  SELECT DISTINCT d.source,
         md5(array_to_string(
             (string_split(d.text, ' '))[t.seg*8+1 : t.seg*8+8], ' ')) AS fp
  FROM documents d,
       unnest(range(0, len(string_split(d.text, ' ')) // 8)) AS t(seg)
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared_fps
FROM segs a JOIN segs b ON a.fp = b.fp AND a.source < b.source
GROUP BY a.source, b.source
""",
    doc="Cross-source mirroring matrix: for every source pair, the number "
    "of distinct 8-word segments both carry — the report that finds "
    "feeds syndicating/mirroring each other (the dominant cause of "
    "cross-source near-dups), so dedup budgets and source weights (q115, "
    "q171) can be set per-PAIR, not just per-source. Determinism: exact "
    "distinct-fp counts. Scale: segments collapse to DISTINCT (source, "
    "16-byte fp) FIRST, so the self-join runs on the deduped fp relation "
    "(|sources| <= a few hundred rows per fp, bounded fan-out), and the "
    "output is the |sources|^2-bounded matrix; text never shuffles.",
)
def q195(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    segs = (
        d.select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0), F.floor(F.size(ws) / 8).cast("int") - 1
                    ),
                    lambda s: F.md5(
                        F.concat_ws(" ", F.slice(ws, s * 8 + 1, 8))
                    ),
                )
            ).alias("fp"),
        )
        .filter(F.size(ws) >= 8)
        .distinct()
    )
    a = segs.select(F.col("source").alias("source_a"), "fp")
    b = segs.select(F.col("source").alias("source_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_shared_fps"))
    )


# ---------------------------------------------------------------------------
# q196: head-template candidates (shared document prefixes)
# ---------------------------------------------------------------------------


@query(
    "q196_prefix_template_groups",
    oracle="""
WITH p AS (
  SELECT doc_id, source, lang,
         md5(array_to_string((string_split(text, ' '))[1:8], ' ')) AS prefix_fp
  FROM documents)
SELECT prefix_fp,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(min(doc_id) AS BIGINT) AS first_doc_id
FROM p GROUP BY prefix_fp HAVING count(*) >= 2
""",
    doc="Head-template detection: documents OPENING with the same 8 words "
    "(md5 of the prefix) — the generated-page/template signature that "
    "segment-level dedup (q38/q131/q154) dilutes across the whole doc but "
    "a head-anchored fingerprint catches directly; n_sources/n_langs "
    "separate one feed's template from an ecosystem-wide one. "
    "Determinism: exact counts over md5 fps. Scale: one map-only prefix "
    "hash per doc (first 8 words only — the text tail is never read past "
    "the split), one partial-agg groupBy on 16-byte keys.",
)
def q196(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    p = d.select(
        "doc_id",
        "source",
        "lang",
        F.md5(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8))).alias(
            "prefix_fp"
        ),
    )
    return (
        p.groupBy("prefix_fp")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.min("doc_id").cast("bigint").alias("first_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# q197: per-dimension embedding clip calibration
# ---------------------------------------------------------------------------


@query(
    "q197_embedding_dim_clip",
    oracle="""
WITH x AS (
  SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, unnest(range(1, 17)) AS t(i))
SELECT dim,
       round(quantile_cont(v, 0.01), 6) AS p01,
       round(quantile_cont(v, 0.99), 6) AS p99,
       round(CAST(sum(CAST(round(v, 6) AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS mean_v,
       CAST(count(*) AS BIGINT) AS n
FROM x GROUP BY dim
""",
    doc="Embedding clip calibration: per dimension (first 16), the exact "
    "p01/p99 percentiles — the clip thresholds a quantization or "
    "outlier-robust normalization step needs — plus the decimal-exact "
    "per-dim mean. Complements q188's distribution QA (which flags "
    "anomalies) by emitting the actionable clip table. Determinism: both "
    "engines use linearly-interpolated exact percentiles, rounded; the "
    "mean is a DECIMAL sum of pre-rounded values. Scale: posexplode "
    "bounded to the leading dims; one partial-agg groupBy on a 16-value "
    "key — exact percentiles sort within each dim partition; swap in "
    "approx_percentile at 100 TB (same operator shape).",
)
def q197(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    x = e.select(
        F.posexplode(F.slice(F.col("embedding").cast("array<double>"), 1, 16))
    ).select(F.col("pos").alias("dim"), F.col("col").alias("v"))
    return x.groupBy("dim").agg(
        F.round(F.expr("percentile(v, 0.01)"), 6).alias("p01"),
        F.round(F.expr("percentile(v, 0.99)"), 6).alias("p99"),
        F.round(
            F.sum(F.round("v", 6).cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_v"),
        F.count("*").cast("bigint").alias("n"),
    )


# ---------------------------------------------------------------------------
# q198: packing-boundary economics across context sizes
# ---------------------------------------------------------------------------


@query(
    "q198_packing_boundary_curve",
    oracle="""
WITH wc AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS wc,
         sum(len(string_split(text, ' ')))
           OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents),
ctx AS (SELECT unnest([128, 256, 512]) AS ctx)
SELECT c.ctx, w.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(w.wc) AS BIGINT) AS total_tokens,
       CAST((max(w.cum) - 1) // c.ctx + 1 AS BIGINT) AS n_packs,
       CAST(sum(CASE WHEN (w.cum - 1) // c.ctx > (w.cum - w.wc) // c.ctx
                THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
       round(1.0 - CAST(sum(w.wc) AS DOUBLE)
             / (((max(w.cum) - 1) // c.ctx + 1) * c.ctx), 6) AS waste_frac
FROM wc w CROSS JOIN ctx c
GROUP BY c.ctx, w.lang
""",
    doc="Packing-boundary economics: for candidate context sizes "
    "{128, 256, 512}, per language, how many documents the q102-style "
    "token-stream packing SPLITS across a pack boundary (a multiple of "
    "ctx falls strictly inside the doc's token interval — split docs get "
    "cross-document attention unless masked) and the tail-pack waste — "
    "the table that picks a context length against q167's truncation "
    "alternative. Determinism: pure integer window cumsum + integer "
    "division; one final rounded division. Scale: one per-lang window "
    "cumsum over (id, wc) pairs (text reduces to its count map-side); "
    "the ctx spine is a broadcast 3-row relation; output is "
    "|ctx|x|langs|.",
)
def q198(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wc = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("wc")
    ).withColumn("cum", F.sum("wc").over(w))
    ctx = F.broadcast(
        d.sparkSession.createDataFrame([(128,), (256,), (512,)], "ctx int")
    )
    split_flag = F.when(
        ((F.col("cum") - 1) / F.col("ctx")).cast("long")
        > ((F.col("cum") - F.col("wc")) / F.col("ctx")).cast("long"),
        1,
    ).otherwise(0)
    packs = ((F.max("cum") - 1) / F.col("ctx")).cast("long") + 1
    return (
        wc.crossJoin(ctx)
        .groupBy("ctx", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("wc").cast("bigint").alias("total_tokens"),
            packs.cast("bigint").alias("n_packs"),
            F.sum(split_flag).cast("bigint").alias("n_split_docs"),
            F.round(
                1.0
                - F.sum("wc").cast("double")
                / ((((F.max("cum") - 1) / F.col("ctx")).cast("long") + 1)
                   * F.col("ctx")),
                6,
            ).alias("waste_frac"),
        )
    )


# ---------------------------------------------------------------------------
# q199: gram document-frequency spectrum
# ---------------------------------------------------------------------------


@query(
    "q199_gram_df_spectrum",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT DISTINCT doc_id,
             unnest(list_distinct(list_transform(range(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g
      FROM toks WHERE len(ws) >= 3),
df AS (SELECT g, count(*) AS df FROM g GROUP BY g),
b AS (SELECT CAST(floor(log2(df)) AS BIGINT) AS df_bucket, df FROM df)
SELECT df_bucket,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(df) AS BIGINT) AS postings_mass,
       round(CAST(count(*) AS DOUBLE)
             / (SELECT count(*) FROM df), 6) AS gram_frac
FROM b GROUP BY df_bucket
""",
    doc="The corpus' duplication fingerprint: word-3-gram document "
    "frequencies bucketed by power of two (df 1, 2-3, 4-7, ...) with the "
    "gram count and total postings mass per band — one glance separates a "
    "heavy-tail boilerplate corpus (mass in high-df bands, dedup pays) "
    "from organic text (mass at df=1). q184 measures dup mass per DOC, "
    "q191 the rare tail's loss; this is the corpus-level spectrum both "
    "calibrate against. Determinism: integer df counts, log2 on exact "
    "integers, one final division. Scale: grams shuffle once as 8-byte "
    "xxhash64 keys into a partial-agg df groupBy; the spectrum is a "
    "~20-row second aggregate.",
)
def q199(spark, sf_dir):
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.text import (
        word_ngrams,
    )

    d = _t(spark, sf_dir, "documents")
    g = d.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.col("text"), 3))).alias("g"),
    ).select("doc_id", F.xxhash64("g").alias("gh"))
    df = g.groupBy("gh").agg(F.count("*").alias("df"))
    total = F.broadcast(df.agg(F.count("*").cast("double").alias("__total")))
    b = df.select(
        F.floor(F.log2("df")).cast("bigint").alias("df_bucket"), "df"
    )
    return (
        b.groupBy("df_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum("df").cast("bigint").alias("postings_mass"),
        )
        .crossJoin(total)
        .select(
            "df_bucket",
            "n_grams",
            "postings_mass",
            F.round(F.col("n_grams") / F.col("__total"), 6).alias("gram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# q200: label-cluster silhouette over embeddings
# ---------------------------------------------------------------------------


@query(
    "q200_label_silhouette",
    oracle="""
WITH e AS (SELECT vec_id, label,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
dims AS (SELECT label, i AS dim,
                round(CAST(sum(CAST(v[i] AS DECIMAL(18,9))) AS DOUBLE)
                      / count(*), 6) AS c
         FROM e, unnest(range(1, 65)) AS t(i) GROUP BY label, i),
cents AS (SELECT label, list(c ORDER BY dim) AS c FROM dims GROUP BY label),
dist AS (SELECT e.vec_id, e.label AS vlabel, c.label AS clabel,
                round(list_sum(list_transform(range(1, 65),
                    i -> (v[i] - c.c[i]) * (v[i] - c.c[i]))), 6) AS d2
         FROM e CROSS JOIN cents c),
ab AS (SELECT vec_id, vlabel,
              min(CASE WHEN vlabel = clabel THEN d2 END) AS a,
              min(CASE WHEN vlabel <> clabel THEN d2 END) AS b
       FROM dist GROUP BY vec_id, vlabel),
s AS (SELECT vlabel AS label,
             CASE WHEN greatest(a, b) = 0 THEN 0.0
                  ELSE round((b - a) / greatest(a, b), 6) END AS s
      FROM ab)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       round(CAST(sum(CAST(s AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
         AS mean_silhouette
FROM s GROUP BY label
""",
    doc="Centroid-silhouette label audit: per label, the mean of "
    "(b - a) / max(a, b) where a is a vector's squared distance to its "
    "OWN label centroid and b the minimum to any OTHER centroid — the "
    "one-number answer to 'are these labels real clusters?' that q189's "
    "margin audit prices per-vector. Near 1: tight separated clusters; "
    "near 0 or negative: labels that sampling or curriculum code should "
    "not trust. Determinism: centroids are DECIMAL(18,9) per-dim sums "
    "divided once and rounded; distances are index-ordered folds rounded "
    "to 6 dp BEFORE the min/ratio; the mean is a DECIMAL sum of rounded "
    "terms. Scale: centroids are a |labels| x dim table (broadcast); the "
    "per-vector pass is map-only against it.",
)
def q200(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    dims = (
        e.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            F.round(
                F.sum(F.col("x").cast("decimal(18,9)")).cast("double")
                / F.count("*"),
                6,
            ).alias("c")
        )
    )
    cents = dims.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
        ).alias("c")
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with("v", "c", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
        6,
    )
    dist = (
        e.crossJoin(
            F.broadcast(cents.select(F.col("label").alias("clabel"), "c"))
        )
        .select("vec_id", F.col("label").alias("vlabel"), "clabel", d2.alias("d2"))
    )
    ab = dist.groupBy("vec_id", "vlabel").agg(
        F.min(F.when(F.col("vlabel") == F.col("clabel"), F.col("d2"))).alias("a"),
        F.min(F.when(F.col("vlabel") != F.col("clabel"), F.col("d2"))).alias("b"),
    )
    s = ab.select(
        F.col("vlabel").alias("label"),
        F.when(F.greatest("a", "b") == 0, F.lit(0.0))
        .otherwise(F.round((F.col("b") - F.col("a")) / F.greatest("a", "b"), 6))
        .alias("s"),
    )
    return s.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.round(
            F.sum(F.col("s").cast("decimal(18,6)")).cast("double") / F.count("*"),
            6,
        ).alias("mean_silhouette"),
    )


# ---------------------------------------------------------------------------
# q201: market-basket lift over order baskets
# ---------------------------------------------------------------------------


@query(
    "q201_basket_lift",
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
n AS (SELECT pk, count(*) AS n FROM li GROUP BY pk),
t AS (SELECT count(DISTINCT ok) AS t FROM li),
pairs AS (SELECT a.pk AS p1, b.pk AS p2, count(*) AS n_pair
          FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          GROUP BY a.pk, b.pk HAVING count(*) >= 3)
SELECT p1, p2, CAST(n_pair AS BIGINT) AS n_pair,
       round(CAST(n_pair AS DOUBLE) * (SELECT t FROM t)
             / (n1.n * n2.n), 6) AS lift
FROM pairs JOIN n n1 ON n1.pk = p1 JOIN n n2 ON n2.pk = p2
ORDER BY round(CAST(n_pair AS DOUBLE) * (SELECT t FROM t)
             / (n1.n * n2.n), 6) DESC, p1, p2
LIMIT 20
""",
    doc="Market-basket affinity: part pairs co-occurring in >=3 orders, "
    "ranked by lift (pair frequency over the independence expectation) — "
    "the classic association-rule screen, run basket-native on the order "
    "line items. Determinism: integer co-occurrence counts; lift is one "
    "rounded division of integers; ranking orders by the ROUNDED lift "
    "with (p1, p2) tiebreak. Scale: baskets are bounded (an order has "
    "~few lineitems), so the within-order self-join fans out "
    "O(basket^2) per order — bounded, never corpus-quadratic; the "
    "min-support HAVING prunes before the dimension joins; part "
    "marginals are a broadcast-sized dim table.",
)
def q201(spark, sf_dir):
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    n = li.groupBy("pk").agg(F.count("*").alias("n"))
    t = F.broadcast(li.agg(F.countDistinct("ok").cast("double").alias("__t")))
    a = li.select("ok", F.col("pk").alias("p1"))
    b = li.select("ok", F.col("pk").alias("p2"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= 3)
    )
    lift = F.round(
        F.col("n_pair").cast("double") * F.col("__t") / (F.col("n1") * F.col("n2")),
        6,
    )
    return (
        pairs.join(F.broadcast(n.select(F.col("pk").alias("p1"), F.col("n").alias("n1"))), "p1")
        .join(F.broadcast(n.select(F.col("pk").alias("p2"), F.col("n").alias("n2"))), "p2")
        .crossJoin(t)
        .select("p1", "p2", F.col("n_pair").cast("bigint").alias("n_pair"), lift.alias("lift"))
        .orderBy(F.col("lift").desc(), "p1", "p2")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q202: supplier-concentration HHI per part
# ---------------------------------------------------------------------------


@query(
    "q202_supply_concentration",
    oracle="""
WITH sq AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                   sum(CAST(l_quantity AS DECIMAL(18,4))) AS q
            FROM lineitem GROUP BY l_partkey, l_suppkey)
SELECT pk AS p_partkey,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(q) AS DOUBLE) AS total_qty,
       round(CAST(sum(q * q) AS DOUBLE)
             / (CAST(sum(q) AS DOUBLE) * CAST(sum(q) AS DOUBLE)), 6) AS hhi
FROM sq GROUP BY pk
""",
    doc="Supply-concentration audit: per part, the Herfindahl-Hirschman "
    "index of shipped quantity across suppliers — sum of squared supplier "
    "shares, computed as sum(q^2)/sum(q)^2 so the only float operation is "
    "ONE final division of exact DECIMAL aggregates (per-supplier shares "
    "are never materialized as floats). 1.0 = single-sourced part (supply "
    "risk), 1/n = evenly spread. Determinism: DECIMAL(18,4) quantity "
    "sums, DECIMAL products, one rounded division. Scale: two partial-agg "
    "groupBys, (part, supplier) then part — the classic re-aggregation "
    "that reuses the first shuffle's partitioning.",
)
def q202(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    sq = li.groupBy(
        F.col("l_partkey").alias("p_partkey"), F.col("l_suppkey").alias("sk")
    ).agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
    return sq.groupBy("p_partkey").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.sum("q").cast("double").alias("total_qty"),
        F.round(
            F.sum(F.col("q") * F.col("q")).cast("double")
            / (F.sum("q").cast("double") * F.sum("q").cast("double")),
            6,
        ).alias("hhi"),
    )
