"""Small-file compaction for streaming sink output.

A micro-batch sink (streaming/export_job.py) writes one directory per
batch; at high trigger rates that accumulates thousands of small files —
the classic object-store/HDFS scaling failure (every downstream scan pays
per-file open + listing latency, and NameNode/manifest pressure grows
unbounded). The reference has the same issue in miniature: one TSV per
``search_after`` page (``ElasticSearch ETL.py:247-253``).

``compact_dir`` rewrites a directory to ~``target_mb`` files in one job:
read (schema-merged across batch dirs) → repartition to
ceil(total_bytes / target) → atomic swap via a staging directory. The
repartition count derives from the *actual* input byte size, so the same
call works on a 10 MB test dir and a 10 TB day partition. Round-robin
repartition (no shuffle key) spreads rows evenly regardless of source
file skew; pass ``order_by`` to instead range-partition + sort within
files, which preserves clustering for downstream range-pruned scans
(parquet min/max on the sort key stay tight).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_dir(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_mb: int = 128,
    order_by: list[str] | None = None,
    options: dict | None = None,
) -> int:
    """Rewrite ``path`` (a directory of ``fmt`` files) into
    ~``target_mb``-sized files. Returns the new file count.

    The swap is staged: write to ``path + '.__compact__'``, then replace the
    original — readers never see a half-written directory (on a real object
    store, write to a versioned prefix and flip a manifest/table pointer
    instead; the job shape is identical). Nested per-batch subdirectories
    (the streaming export layout) are read via ``recursiveFileLookup`` with
    schema merge, so compaction flattens them into one leaf directory.

    Re-runnable after a crash: stale staging/backup dirs from a previous
    attempt are removed up front (they are by-products, never the only
    copy: staging is incomplete by definition, and the backup is deleted
    only after the new data is live at ``path``). A crash between the two
    renames leaves the compacted data at staging and the original at
    backup — the next run restores from backup and retries.
    """
    options = dict(options or {})
    staging = path.rstrip("/") + ".__compact__"
    backup = path.rstrip("/") + ".__old__"
    if not os.path.exists(path) and os.path.exists(backup):
        os.rename(backup, path)  # crashed mid-swap last run: restore
    for stale in (staging, backup):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    read_opts = {"recursiveFileLookup": "true", **options}
    if fmt == "parquet":
        read_opts.setdefault("mergeSchema", "true")
    reader = spark.read.options(**read_opts)
    df: DataFrame = getattr(reader, fmt)(path)
    n_files = max(1, math.ceil(dir_bytes(path) / (target_mb * 1024 * 1024)))
    if order_by:
        df = df.repartitionByRange(n_files, *order_by).sortWithinPartitions(*order_by)
    else:
        df = df.repartition(n_files)
    getattr(df.write.options(**options).mode("overwrite"), fmt)(staging)
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    out = 0
    for f in os.listdir(path):
        if not f.startswith(("_", ".")):
            out += 1
    return out
