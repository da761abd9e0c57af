"""Mergeable sketch operators (beyond the built-in HLL used by q67).

Binned quantile sketch: a fixed-range equi-width histogram whose buckets
add associatively — the mergeable-summary pattern (same algebra as
t-digest/KLL, with deterministic bin arithmetic instead of adaptive
centroids, so results are bit-identical across engines and partitionings).

Scale shape: the sketch build is one partial-aggregated groupBy (map-side
combine collapses each partition to ≤ groups × bins rows before the
shuffle); rollups across shards/days/sources merge sketches by summing
bin counts — never re-reading raw data. Quantile extraction runs on the
tiny sketch relation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def binned_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Equi-width histogram sketch: one row per (group, bin) with the count.
    Values are clamped into [lo, hi); the bin arithmetic uses only IEEE
    double ops with literal parameters, so any engine computes identical
    bins. Merging sketches = groupBy(bin).sum(cnt)."""
    width = (hi - lo) / bins
    b = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0).cast("long"), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))),
    ).cast("int")
    return df.groupBy(*group_cols, b.alias("bin")).agg(F.count("*").alias("cnt"))


def sketch_quantiles(
    sketch: DataFrame,
    group_cols: Sequence[str],
    qs: Sequence[float],
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Quantile estimates from a binned sketch: for each q, the midpoint of
    the first bin whose cumulative count reaches q × total. Window cumsum
    over the sketch (tiny relation — groups × bins rows), then one groupBy.
    Error is bounded by the bin width; at scale you never touch raw data."""
    width = (hi - lo) / bins
    gw = Window.partitionBy(*group_cols)
    cum = sketch.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(gw.orderBy("bin")).alias("cum"),
        F.sum("cnt").over(gw).alias("total"),
    )
    aggs = []
    for q in qs:
        hit_bin = F.min(F.when(F.col("cum") >= F.lit(q) * F.col("total"), F.col("bin")))
        est = F.lit(lo) + (hit_bin + F.lit(0.5)) * F.lit(width)
        aggs.append(F.round(est, 6).alias(f"p{int(q * 100):02d}"))
    return cum.groupBy(*group_cols).agg(*aggs)


def binned_sketch_sql(
    table: str, group_cols: Sequence[str], value_col: str, lo: float, hi: float, bins: int
) -> str:
    """The identical sketch build as ANSI SQL (for DuckDB oracles)."""
    width = (hi - lo) / bins
    g = ", ".join(group_cols)
    # literals cast to DOUBLE — DuckDB parses bare `900.0` as DECIMAL and
    # decimal bin arithmetic could round differently from Spark's doubles
    return (
        f"SELECT {g}, CAST(least({bins - 1}, greatest(0, "
        f"floor(({value_col} - {lo!r}::DOUBLE) / {width!r}::DOUBLE))) AS INT) AS bin, "
        f"count(*) AS cnt FROM {table} GROUP BY ALL"
    )
