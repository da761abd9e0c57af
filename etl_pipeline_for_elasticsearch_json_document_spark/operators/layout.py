"""Data-layout operators: Z-order (Morton) clustering for multi-column
file skipping.

At 100 TB the dominant cost of a selective query is the scan; parquet
min/max footer stats let Spark skip whole files/row-groups, but only if
the file layout is *clustered* on the filter columns. Sorting on one
column clusters that column only; interleaving the bits of two columns
(a Z-order / Morton key) keeps BOTH columns' value ranges narrow within
every file, so predicates on either column (or both) prune.

Everything here is arithmetic on built-in expressions — bit shifts and
adds, fully codegen-able, no UDFs — and the identical formula is
expressible in ANSI SQL for cross-engine verification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton key interleaving the low ``bits`` bits of two non-negative
    integer columns: bit i of x lands at position 2i, bit i of y at 2i+1.
    2×16 bits → one BIGINT key. The expression is a flat sum of shift/mask
    terms — whole-stage codegen folds it into straight-line JVM code."""
    xs = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ys = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton key as an ANSI-SQL expression (for oracles)."""
    mask = (1 << bits) - 1
    # Every term fully parenthesized: SQL gives `+` higher precedence than
    # `<<`, so an unparenthesized `a << 2 + b << 4` chain mis-associates.
    terms = []
    for i in range(bits):
        terms.append(f"(((({x}::BIGINT & {mask}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y}::BIGINT & {mask}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    num_files: int = 32,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of (x_col, y_col).

    ``repartitionByRange`` on the Morton key makes each output file own a
    contiguous Z-range (one range shuffle — same cost as any global sort),
    and ``sortWithinPartitions`` orders rows inside the file so row-group
    stats are tight too. Every file then spans a narrow rectangle in
    (x, y) space → min/max pruning works for filters on either column.

    Both columns are first min/max-normalized onto the full ``bits``-wide
    range (one cheap agg — at scale it reads parquet footer stats, not
    data): interleaving RAW values lets whichever column has the wider
    range own all the high bits, which degenerates to a single-column sort
    on that column.
    """
    mx = (1 << bits) - 1
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(x_col), F.max(x_col), F.min(y_col), F.max(y_col)
    ).collect()[0]

    def norm(col: Column, lo, hi) -> Column:
        span = max(int(hi) - int(lo), 1)
        return ((col.cast("double") - F.lit(float(lo))) * mx / span).cast("long")

    keyed = df.withColumn(
        "__z",
        zorder_key(
            norm(F.col(x_col), lo_x, hi_x), norm(F.col(y_col), lo_y, hi_y), bits
        ),
    )
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a hash-bucketed (optionally bucket-sorted) table.

    Bucketing is the PRE-PAID shuffle: rows are hash-partitioned on
    ``keys`` into ``n_buckets`` files at WRITE time, and Spark records the
    layout in the catalog. Every later equi-join or aggregation on those
    keys between tables bucketed the same way reads the data already
    co-partitioned — the plan carries NO Exchange on the bucketed sides
    (tests/test_layout.py pins this on the physical plan). At 100 TB this
    converts the nightly fact-to-fact join from two full shuffles of the
    big tables into a zero-shuffle sort-merge (or zip) join; with
    ``sort_cols`` the per-bucket sort is also pre-paid, removing the Sort
    before the merge.

    Sizing rule: n_buckets ≈ table_bytes / target_partition_bytes
    (128–512 MB); both join sides must use the SAME bucket count (or an
    integer multiple, with ``spark.sql.bucketing.coalesceBucketsInJoin``)
    and the SAME keys. Reference analog: the reference has no layout
    control at all (one pandas frame, `ElasticSearch ETL.py:192`); this is
    the Spark-native answer to its per-batch file output (A17) for
    join-heavy downstream use.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
