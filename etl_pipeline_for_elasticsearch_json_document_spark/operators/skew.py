"""Skew-mitigation operators for hot-key joins and aggregations.

At 100 TB a handful of hot keys (the empty document, a bot user id, a
default enum value) can hold a whole stage hostage: one reducer gets the
hot key's rows while the other 999 executors idle. Three tools, in order
of preference:

1. **AQE skew-join** (``spark.sql.adaptive.skewJoin.enabled``, on by
   default in our session): Spark splits oversized shuffle partitions at
   runtime. Zero code; handles join skew whenever statistics see it.
2. **Salted aggregation** (:func:`salted_agg_count`): for heavy-hitter
   groupBys whose aggregate is algebraic, two-phase (salt → partial →
   final) bounds any single task's share of a hot key at 1/salt. NOTE:
   plain ``groupBy().count()`` etc. already get map-side partial
   aggregation from Catalyst — explicit salting only pays off for
   *non-algebraic* aggregates (``collect_list``, exact ``countDistinct``
   re-aggregation) or extreme single-key dominance.
3. **Salted join** (:func:`salted_join`): replicate the small side
   ``salt``× with an explicit salt column so the big side's hot key
   spreads over ``salt`` reducers. The manual fallback when AQE can't see
   the skew (e.g. the skew appears only after filters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt: int, col_name: str = "__salt") -> DataFrame:
    """Per-row salt in [0, salt). Seeded ``rand``: the sequence is a
    function of (seed, partition index, position), so a task RETRY sees the
    same salts (no correctness hazard under speculative execution), while
    identical rows still spread across salts — a content hash would send
    every copy of a duplicated hot row to the same reducer, re-creating the
    skew it was meant to fix."""
    return df.withColumn(col_name, F.floor(F.rand(42) * salt).cast("int"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot values of ``on``: the big side gets a
    random-but-deterministic salt, the small side is replicated ``salt``×
    (explode of a literal range — cheap when small is dimension-sized), and
    the join key becomes (on, salt) so a hot key spreads across ``salt``
    shuffle partitions.

    Cost: small side × salt. Use only when AQE's runtime skew split cannot
    kick in (single-stage plans, skew introduced mid-query) — AQE is the
    default answer and needs no code.

    Only join types where the SMALL side is never emitted unmatched are
    valid (its rows exist ``salt``×): inner / left / left_semi / left_anti.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join replicates the small side; how={how!r} would "
            "emit unmatched small rows salt times"
        )
    b = with_salt(big, salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")


def salted_agg_collect(
    df: DataFrame,
    key: str,
    value: str,
    salt: int = 16,
) -> DataFrame:
    """collect_list by key for heavy-hitter keys, without a single-reducer
    bottleneck: phase 1 collects per (key, salt) — at most 1/salt of a hot
    key's rows per task — phase 2 flattens the per-salt lists. The result
    list order is nondeterministic (as with any distributed collect_list);
    sort it downstream if order matters.

    Columns: key, values (array).
    """
    p1 = (
        with_salt(df.select(key, value), salt)
        .groupBy(key, "__salt")
        .agg(F.collect_list(value).alias("vs"))
    )
    return (
        p1.groupBy(key)
        .agg(F.flatten(F.collect_list("vs")).alias("values"))
    )


def top_keys(df: DataFrame, key: Column | str, n: int = 20) -> DataFrame:
    """Heavy-hitter report: the ``n`` most frequent key values with counts
    and corpus share — the diagnostic you run BEFORE choosing a skew
    strategy. One partial-aggregated shuffle + a tiny top-n sort."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(total), 6))
        .orderBy(F.col("n_rows").desc())
        .limit(n)
    )


def partition_balance(df: DataFrame) -> dict:
    """Per-partition row counts of ``df`` as materialized — the cheap local
    proxy for task balance (row-count skew ≈ task-time skew for codegen
    stages). Returns ``{"counts", "max", "median", "ratio"}`` where
    ``ratio = max / median`` over non-empty partitions; a healthy shuffle
    stays well under 10. One pass, one long per partition to the driver —
    counting rides ``spark_partition_id`` so rows never leave the JVM."""
    import statistics

    counts = [
        r["cnt"]
        for r in df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(F.count("*").alias("cnt"))
        .collect()
    ]
    nonempty = sorted(c for c in counts if c > 0) or [0]
    med = statistics.median(nonempty)
    mx = max(nonempty)
    return {
        "counts": counts,
        "max": mx,
        "median": med,
        "ratio": (mx / med) if med else float("inf"),
    }
