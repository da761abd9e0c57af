"""Round-11 registrations: the schema-evolution diff report (VERDICT
r10 item 8) — the first operator that remembers schema ACROSS batches
instead of rediscovering it per page like the reference
(`ElasticSearch ETL.py:171-217`) and the flatten plans (A5/A6) do.

Determinism follows registry.py's rules; the JSON envelope under q246
is built by STRING CONCATENATION from integer columns only (identical
text in any engine — no float formatting, no engine JSON serializer),
so the DuckDB oracle replays the exact construction and the exact diff.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.queries.registry import query
from etl_pipeline_for_elasticsearch_json_document_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q246: per-batch JSON schema evolution report (new / missing / kind_changed)
# ---------------------------------------------------------------------------


@query(
    "q246_schema_evolution",
    oracle="""
WITH src AS (
  SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS batch,
         '{"a":' || CAST(user_id AS VARCHAR)
         || CASE WHEN EXTRACT(day FROM ts) >= 10
                 THEN ',"b":' || CAST(event_id AS VARCHAR) ELSE '' END
         || CASE WHEN EXTRACT(day FROM ts) < 20
                 THEN ',"c":"s' || CAST(user_id AS VARCHAR) || '"' ELSE '' END
         || ',"d":' || CASE WHEN EXTRACT(day FROM ts) < 15
                            THEN CAST(user_id AS VARCHAR)
                            ELSE '"x' || CAST(user_id AS VARCHAR) || '"' END
         || '}' AS j
  FROM events),
kv AS (
  SELECT batch, u.path,
         json_extract_string(src.j, '$.' || u.path) AS v
  FROM src, unnest(json_keys(src.j)) AS u(path)),
per_kind AS (
  SELECT DISTINCT batch, path,
         CASE WHEN regexp_matches(v, '^-?[0-9]+(\\.[0-9]+)?$') THEN 'number'
              WHEN v IN ('true', 'false') THEN 'boolean'
              ELSE 'string' END AS k
  FROM kv),
prof AS (
  SELECT batch, path, string_agg(k, '+' ORDER BY k) AS kinds
  FROM per_kind GROUP BY batch, path),
eligible AS (
  SELECT b1.batch FROM (SELECT DISTINCT batch FROM prof) b1
  JOIN (SELECT DISTINCT batch + 1 AS batch FROM prof) b2 USING (batch)),
diff AS (
  SELECT coalesce(c.batch, p.batch) AS batch,
         coalesce(c.path, p.path) AS path,
         c.kinds AS cur_kinds, p.kinds AS prev_kinds
  FROM prof c
  FULL OUTER JOIN (SELECT batch + 1 AS batch, path, kinds FROM prof) p
    ON c.batch = p.batch AND c.path = p.path)
SELECT d.batch, d.path,
       CASE WHEN prev_kinds IS NULL THEN 'new'
            WHEN cur_kinds IS NULL THEN 'missing'
            ELSE 'kind_changed' END AS status,
       prev_kinds, cur_kinds
FROM diff d JOIN eligible e ON d.batch = e.batch
WHERE prev_kinds IS NULL OR cur_kinds IS NULL OR prev_kinds <> cur_kinds
""",
    doc="Per-batch JSON schema evolution report — the ingest-QA diff the "
    "reference's per-page schema rediscovery (A5/A6) never produces: for "
    "each export day, which top-level paths are NEW, went MISSING, or "
    "changed scalar kind versus the previous day. The corpus stands in "
    "for a varying feed via a deterministically constructed envelope "
    "(path 'b' first ships on day 10, 'c' stops on day 20, 'd' flips "
    "number->string on day 15 — all by string concat over integer "
    "columns, so both engines hash the identical construction). Scale: "
    "the per-row explode is map-side; everything after the distinct runs "
    "on the (batches x paths x kinds) relation — a few hundred rows no "
    "matter the corpus size — and the batch-pairing join broadcasts the "
    "batch domain. Operator: operators/schema_report.py "
    "(json_schema_profile + schema_evolution_report), streaming twin in "
    "tests/test_streaming.py.",
)
def q246(spark, sf_dir):
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.schema_report import (
        json_schema_profile,
        schema_evolution_report,
    )

    e = _t(spark, sf_dir, "events")
    day = F.dayofmonth("ts")
    uid = F.col("user_id").cast("string")
    j = F.concat(
        F.lit('{"a":'),
        uid,
        F.when(day >= 10, F.concat(F.lit(',"b":'), F.col("event_id").cast("string"))).otherwise(""),
        F.when(day < 20, F.concat(F.lit(',"c":"s'), uid, F.lit('"'))).otherwise(""),
        F.lit(',"d":'),
        F.when(day < 15, uid).otherwise(F.concat(F.lit('"x'), uid, F.lit('"'))),
        F.lit("}"),
    )
    src = e.select(day.alias("batch"), j.alias("j"))
    return schema_evolution_report(json_schema_profile(src, "batch", "j"))


# ---------------------------------------------------------------------------
# q247: per-path coverage drift (the second ingest-QA face of schema watch)
# ---------------------------------------------------------------------------


@query(
    "q247_path_coverage_drift",
    oracle="""
WITH src AS (
  SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS batch,
         '{"a":' || CAST(user_id AS VARCHAR)
         || CASE WHEN (CASE WHEN EXTRACT(day FROM ts) < 15
                            THEN user_id % 3 ELSE user_id % 2 END) = 0
                 THEN ',"v":' || CAST(event_id AS VARCHAR) ELSE '' END
         || CASE WHEN user_id % 5 = 0
                 THEN ',"w":"s' || CAST(user_id AS VARCHAR) || '"' ELSE '' END
         || '}' AS j
  FROM events),
n AS (SELECT batch, CAST(count(*) AS BIGINT) AS n_docs FROM src GROUP BY batch),
pv AS (
  SELECT batch, u.path, CAST(count(*) AS BIGINT) AS n_path
  FROM src, unnest(json_keys(src.j)) AS u(path)
  GROUP BY batch, u.path),
cov AS (
  SELECT pv.batch, pv.path, n.n_docs, pv.n_path,
         CAST(pv.n_path AS DOUBLE) / n.n_docs AS cov
  FROM pv JOIN n USING (batch))
SELECT c.batch, c.path, c.n_docs, c.n_path,
       round(c.cov, 6) AS coverage,
       round(p.cov, 6) AS prev_coverage,
       round(c.cov - p.cov, 6) AS delta
FROM cov c
JOIN (SELECT batch + 1 AS batch, path, cov FROM cov) p
  ON c.batch = p.batch AND c.path = p.path
""",
    doc="Per-path coverage drift: for each export day and each observed "
    "JSON path, the fraction of documents carrying the path, its "
    "previous-day fraction, and the day-over-day delta — the second "
    "ingest-QA face of the schema watch (q246 reports paths that appear/"
    "vanish/retype; this catches a path that stays present but QUIETLY "
    "changes its population, e.g. an upstream default that stops firing "
    "— here path 'v' jumps from ~1/3 to ~1/2 of events on day 15 while "
    "'a' and 'w' hold flat). Inner-join pairing keeps only (day, path) "
    "with an observed predecessor, the q246 contract. Scale: two "
    "map-side aggregations down to the (batches x paths) relation, then "
    "a self-join on that tiny relation; doubles divide and subtract "
    "identically in any IEEE engine and the rounds are mirrored.",
)
def q247(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    day = F.dayofmonth("ts")
    uid = F.col("user_id").cast("string")
    present_v = F.when(day < 15, F.col("user_id") % 3).otherwise(
        F.col("user_id") % 2
    ) == 0
    j = F.concat(
        F.lit('{"a":'),
        uid,
        F.when(present_v, F.concat(F.lit(',"v":'), F.col("event_id").cast("string"))).otherwise(""),
        F.when(F.col("user_id") % 5 == 0, F.concat(F.lit(',"w":"s'), uid, F.lit('"'))).otherwise(""),
        F.lit("}"),
    )
    src = e.select(day.cast("bigint").alias("batch"), j.alias("j"))
    n = src.groupBy("batch").agg(F.count("*").alias("n_docs"))
    pv = (
        src.select(
            "batch",
            F.explode(F.map_keys(F.from_json("j", "map<string,string>"))).alias("path"),
        )
        .groupBy("batch", "path")
        .agg(F.count("*").alias("n_path"))
    )
    # cached: cov feeds both sides of the batch-shift self-join below —
    # without it each side re-scans the corpus (lazy cache, tiny relation).
    # Caller contract (r12, VERDICT item 7): the entry is EVICTABLE and
    # released with the session; long-lived sessions calling this query
    # repeatedly should unpersist the returned plan's cached subrelation
    # (spark.catalog.clearCache() between report sweeps) — one-shot
    # driver/bench runs need nothing.
    cov = pv.join(n, "batch").withColumn(
        "cov", F.col("n_path").cast("double") / F.col("n_docs")
    ).cache()
    prev = cov.select(
        (F.col("batch") + 1).alias("batch"), "path", F.col("cov").alias("pcov")
    )
    return (
        cov.join(prev, ["batch", "path"])
        .select(
            "batch",
            "path",
            "n_docs",
            "n_path",
            F.round("cov", 6).alias("coverage"),
            F.round("pcov", 6).alias("prev_coverage"),
            F.round(F.col("cov") - F.col("pcov"), 6).alias("delta"),
        )
    )
