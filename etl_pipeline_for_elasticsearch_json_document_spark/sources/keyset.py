"""Keyset (search_after) pagination over an ordered DataFrame.

The reference pages Elasticsearch with a ``search_after`` cursor on
``(auditProcessedDateTimeUtc, claimRequestId)`` (``ElasticSearch
ETL.py:220-267``). The batch-mode Spark analog is a composite cursor
predicate ``(ts, id) > (cursor_ts, cursor_id)`` + ordered limit: the
predicate pushes into the scan (partition pruning when the data is
partitioned by the cursor key), so each page reads only the tail.

Use streaming checkpoints (streaming/export_job.py) when the source is
continuous; use this when paging a static store.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Cursor:
    values: tuple

    def __bool__(self) -> bool:
        return bool(self.values)


def _after_predicate(sort_cols: Sequence[str], cursor: Cursor) -> Column:
    """Row-value comparison (a,b,...) > (x,y,...) as an OR-of-ANDs cascade —
    the lexicographic order search_after uses. Stays a plain conjunction/
    disjunction of comparisons so it pushes down to the scan."""
    pred = None
    for i, (c, v) in enumerate(zip(sort_cols, cursor.values)):
        eq_prefix = None
        for pc, pv in zip(sort_cols[:i], cursor.values[:i]):
            e = F.col(pc) == F.lit(pv)
            eq_prefix = e if eq_prefix is None else (eq_prefix & e)
        gt = F.col(c) > F.lit(v)
        term = gt if eq_prefix is None else (eq_prefix & gt)
        pred = term if pred is None else (pred | term)
    return pred


def page_after(
    df: DataFrame,
    sort_cols: Sequence[str],
    cursor: Optional[Cursor],
    page_size: int,
) -> DataFrame:
    """One page strictly after ``cursor`` in ``sort_cols`` order."""
    out = df
    if cursor:
        out = out.filter(_after_predicate(sort_cols, cursor))
    return out.orderBy(*sort_cols).limit(page_size)


def paginate(
    df: DataFrame,
    sort_cols: Sequence[str],
    page_size: int,
    start: Optional[Cursor] = None,
) -> Iterator[tuple[DataFrame, Cursor]]:
    """Iterate (page_df, next_cursor) until the source is exhausted.

    Each page is materialized once to read its last row for the cursor —
    the reference's loop shape (``ElasticSearch ETL.py:220-267``) with the
    cursor advance decoupled from the sink, so an empty sink write cannot
    stall the cursor (fixes the reference's A18 re-fetch bug).
    """
    cursor = start
    while True:
        page = page_after(df, sort_cols, cursor, page_size)
        rows = page.collect()
        if not rows:
            return
        cursor = Cursor(tuple(rows[-1][c] for c in sort_cols))
        yield page, cursor
        if len(rows) < page_size:
            return
