"""Stream-stream joins: watermarked interval (event-time range) joins.

The streaming rebuild of the batch range join (queries/relational.py
q27): two event streams joined on a key within an event-time interval —
the attribution / request-response correlation primitive. Spark keeps
both sides in versioned join state and the watermark + time-range
condition bound how much state is retained, so the join runs indefinitely
with finite memory; at 100 TB/day the state store is RocksDB-backed and
partitioned by the join key (same shuffle as the batch join, amortized
across micro-batches).

The batch pagination loop of the reference
(``ElasticSearch ETL.py:220-267``) has no join at all; this is Tier B
surface built the Structured-Streaming-native way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "30 minutes",
    watermark: str = "1 hour",
    extra_condition: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join two watermarked streams on ``key`` where the right event falls
    in ``(left_ts, left_ts + within]``.

    Both sides MUST carry watermarks and the join condition MUST bound the
    event-time range in both directions — that is what lets Spark evict
    join state (unmatched left rows older than watermark+within are
    dropped; right state likewise). ``within`` uses INTERVAL syntax.

    ``how='leftOuter'`` additionally emits null-padded rows for left events
    that found no match — but only once the watermark proves no future
    match is possible (watermark past left_ts + within), i.e. outer results
    are delayed by the watermark, never speculative. Same state-eviction
    bounds as inner.

    Columns: the key, ``l_ts``/``r_ts``, every non-key/ts left column
    prefixed ``l_``, right prefixed ``r_``.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts > lts)
        & (rts <= lts + F.expr(f"INTERVAL {within}"))
    )
    if extra_condition is not None:
        cond = cond & extra_condition
    out_cols = [
        F.col(f"l.{key}").alias(key),
        lts.alias("l_ts"),
        rts.alias("r_ts"),
    ]
    for c in left.columns:
        if c not in (key, left_ts):
            out_cols.append(F.col(f"l.{c}").alias(f"l_{c}"))
    for c in right.columns:
        if c not in (key, right_ts):
            out_cols.append(F.col(f"r.{c}").alias(f"r_{c}"))
    return lw.join(rw, cond, how).select(*out_cols)


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: join a micro-batched stream to a
    static (or slowly-refreshed) dimension table — the streaming analog of
    the broadcast dimension joins in the batch surface (q04 etc.).

    Stream-static joins are STATELESS on the stream side: each micro-batch
    joins against the dimension as of that batch, nothing is retained, no
    watermark is needed. Spark broadcasts the dimension when it fits
    (hinted here), so at 100 TB/day the event stream never shuffles — each
    executor enriches its partitions map-side; a dimension too big to
    broadcast falls back to a shuffled join per micro-batch, at which point
    pre-bucketing the dimension on the key is the right layout.

    Inner and left joins are the supported shapes (right/full with a
    streaming left are not meaningful batch-at-a-time and Spark rejects
    them for good reason).
    """
    assert how in ("inner", "left"), "stream-static supports inner/left"
    return stream.join(F.broadcast(dim), on=key, how=how)
