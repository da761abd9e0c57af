"""Incremental schema-evolution report over a JSON document column —
the ingest-QA signal a continuously exported corpus actually watches:
per batch, WHICH paths appeared, vanished, or changed scalar kind
relative to the previous batch.

The reference rediscovers its schema from scratch on every page
(`ElasticSearch ETL.py:171-217` — per-batch dynamic columns) and throws
the previous page's knowledge away; the flatten plans here rebuild that
(plans/flatten.py path enumeration, A5/A6), but nothing DIFFED schema
across batches until this operator. At 100 TB an upstream mapping change
(a renamed field, a numeric id that starts arriving as a string) shows
up first as exactly this diff — catching it at ingest beats discovering
it as a typed-column crash three jobs downstream.

Shape (all built-in DataFrame ops, no UDFs):

1. :func:`json_schema_profile` — corpus-sized map-side work: one
   ``from_json(map<string,string>)`` + explode per row, a regexp kind
   classifier, then a distinct down to the (batch, path, kind) relation
   — bounded by batches x paths x kinds, tiny versus the corpus, which
   is what makes the diff itself free at any scale.
2. :func:`schema_evolution_report` — self-join of the profile against
   itself shifted by one batch (consecutive integer batch ids are the
   contract; day ordinals, micro-batch ids, and export epochs all
   satisfy it); a full outer join per (batch, path) classifies
   ``new`` / ``missing`` / ``kind_changed``, unchanged paths drop out.

Scalar-kind rule (deliberately engine-portable so a DuckDB/SQL oracle
can replicate it bit-for-bit): the path's values-as-strings are
classified ``number`` when they match ``^-?[0-9]+(\\.[0-9]+)?$``,
``boolean`` on ``true``/``false``, else ``string``; a path observed with
several kinds in one batch reports the sorted kind SET (joined with
``+``). Nested objects/arrays stringify to their JSON text and classify
``string`` — the report tracks the scalar surface, the flatten plans own
nested structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMBER_RE = r"^-?[0-9]+(\.[0-9]+)?$"


def _kind(value):
    return (
        F.when(value.rlike(_NUMBER_RE), "number")
        .when(value.isin("true", "false"), "boolean")
        .otherwise("string")
    )


def json_schema_profile(
    df: DataFrame, batch_col: str, json_col: str
) -> DataFrame:
    """One row per (batch, path, kinds): the observed top-level paths of
    ``json_col`` per batch with their sorted scalar-kind set. The explode
    is map-side over the corpus; everything after the distinct is
    path-domain-sized."""
    kv = df.select(
        F.col(batch_col).cast("bigint").alias("batch"),
        F.explode(F.from_json(F.col(json_col), "map<string,string>")).alias(
            "path", "__v"
        ),
    )
    per_kind = kv.select("batch", "path", _kind(F.col("__v")).alias("__k")).distinct()
    return per_kind.groupBy("batch", "path").agg(
        F.array_join(F.array_sort(F.collect_set("__k")), "+").alias("kinds")
    )


def schema_evolution_report(profile: DataFrame) -> DataFrame:
    """Diff consecutive batches of a :func:`json_schema_profile` relation:
    rows ``(batch, path, status, prev_kinds, cur_kinds)`` where status is
    ``new`` (path absent in batch-1), ``missing`` (present in batch-1,
    absent now), or ``kind_changed``; unchanged paths emit nothing. The
    earliest batch has no predecessor and emits nothing. Batch ids must
    be consecutive integers — the contract every natural batch ordinal
    (day-of-export, micro-batch id) satisfies; gaps would mis-pair."""
    # the profile feeds FOUR subplans below (cur, prev, and the batch
    # domain twice); when it is derived from a corpus scan (q246's shape)
    # Catalyst does not reuse the subplan and the corpus would be scanned
    # once per use — at 100 TB, four full scans for a batches x paths
    # relation. cache() is lazy (no action fires here; the repo's
    # operators stay lazy) and the first action materializes the tiny
    # relation once. The entry is EVICTABLE (plain cache, not a
    # checkpoint), so repeated calls in a long-lived session stay
    # bounded by the cache manager; callers wanting deterministic
    # release unpersist the profile they passed in after consuming.
    profile = profile.cache()
    cur = profile.select("batch", "path", F.col("kinds").alias("cur_kinds"))
    prev = profile.select(
        (F.col("batch") + 1).alias("batch"),
        "path",
        F.col("kinds").alias("prev_kinds"),
    )
    # batches eligible for a report row: both the batch and its
    # predecessor were observed. Batch-domain-sized, but deliberately
    # UN-hinted (the q203/fact-scaled-broadcast rule): the relation
    # derives from a corpus scan, so the bound is semantic, not provable
    # from the plan — AQE converts the join to broadcast at runtime from
    # the MEASURED size instead of trusting a hint.
    batches = profile.select("batch").distinct()
    eligible = batches.join(
        batches.selectExpr("batch + 1 AS batch"), "batch"
    )
    j = cur.join(prev, ["batch", "path"], "full").join(eligible, "batch")
    status = (
        F.when(F.col("prev_kinds").isNull(), "new")
        .when(F.col("cur_kinds").isNull(), "missing")
        .when(F.col("cur_kinds") != F.col("prev_kinds"), "kind_changed")
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select("batch", "path", "status", "prev_kinds", "cur_kinds")
    )
