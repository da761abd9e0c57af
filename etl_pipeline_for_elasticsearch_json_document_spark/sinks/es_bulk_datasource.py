"""Python DataSource WRITER (Spark 4 ``pyspark.sql.datasource`` API) for
Elasticsearch ``_bulk`` NDJSON files — the write-side twin of
``sources/es_datasource.py``'s envelope reader, making the bulk handoff a
first-class ``df.write.format(...)`` target instead of a helper call::

    spark.dataSource.register(EsBulkDataSource)
    (df.write.format("es_bulk")
       .option("index", "claims").option("id_col", "claimRequestId")
       .mode("append").save("/out/bulk"))

Each executor task streams its partition into one staged NDJSON file
(action line + source line per row, both ``json.dumps``-rendered so
hostile values cannot corrupt the protocol — same invariant as
``bulk_payload``). Commit is atomic-by-rename: tasks write to
``_staging_<uuid>`` names, the driver's ``commit`` renames all staged
files into place and drops a ``_SUCCESS`` marker, and ``abort`` removes
the staged files — a failed/speculated task can never leave a partial
bulk file where an ingestion fleet would replay it.

This is the 100 TB shape: no driver involvement in the data path, one
file ≈ one bulk request per partition, replayable by anything that can
POST (see ``sinks/elasticsearch.py::replay_bulk_files``).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Optional

from pyspark.sql import Row
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class _Staged(WriterCommitMessage):
    staged_path: str
    final_path: str
    rows: int


class EsBulkWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("es_bulk requires a path: .save('/out/dir')")
        self.index = options.get("index")
        if not self.index:
            raise ValueError("es_bulk requires .option('index', <es index name>)")
        self.id_col = options.get("id_col")
        self.overwrite = overwrite

    def write(self, iterator: Iterator[Row]) -> _Staged:
        # executor-side: stream the partition straight to one staged file
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.ndjson"
        staged = os.path.join(self.path, f"_staging_{name}")
        n = 0
        with open(staged, "w", encoding="utf-8") as f:
            for row in iterator:
                doc = row.asDict(recursive=True)
                meta = {"_index": self.index}
                if self.id_col is not None:
                    meta["_id"] = str(doc[self.id_col])
                f.write(json.dumps({"index": meta}) + "\n")
                f.write(json.dumps({k: v for k, v in doc.items() if v is not None}) + "\n")
                n += 1
        return _Staged(staged_path=staged, final_path=os.path.join(self.path, name), rows=n)

    def commit(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        # A zero-partition DataFrame runs no write() tasks, so the directory
        # may not exist yet when commit() fires — overwrite of an empty frame
        # must still clear stale files and drop _SUCCESS, not crash.
        os.makedirs(self.path, exist_ok=True)
        keep = {m.final_path for m in messages if m is not None}
        if self.overwrite:
            # mode("overwrite") contract: committed part files from prior
            # writes must not survive — an ingest fleet replaying the dir
            # would ship stale bulk payloads. Staged files (this job's or a
            # concurrent abort's) carry a _staging_ prefix, so the part-
            # prefix test already excludes them.
            for f in os.listdir(self.path):
                p = os.path.join(self.path, f)
                if f.startswith("part-") and f.endswith(".ndjson") and p not in keep:
                    os.remove(p)
        for m in messages:
            if m is not None:
                os.rename(m.staged_path, m.final_path)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(str(sum(m.rows for m in messages if m is not None)))

    def abort(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged_path):
                os.remove(m.staged_path)


class EsBulkStreamWriter(DataSourceStreamWriter):
    """Streaming side of the ``es_bulk`` target (Spark 4
    ``DataSourceStreamWriter``): ``df.writeStream.format("es_bulk")``.

    Tasks stage exactly like the batch writer; the driver's per-epoch
    ``commit(messages, batchId)`` lands them under
    ``path/epoch=<batchId>/`` with a ``_SUCCESS`` marker written last.
    Structured Streaming replays an epoch only if its commit never made
    the checkpoint, so a replayed epoch OVERWRITES its own directory
    (stale committed parts from the interrupted attempt are removed
    before the rename) — the directory ends deterministic-per-epoch, and
    id-pinned bulk actions make the downstream index replay-convergent
    (the same exactly-once argument as streaming/es_export.py, here as a
    first-class sink format). ``abort`` removes that attempt's staged
    files only.
    """

    def __init__(self, options, overwrite: bool) -> None:
        self.inner = EsBulkWriter(options, overwrite)
        self.path = self.inner.path

    def write(self, iterator: Iterator[Row]) -> _Staged:
        return self.inner.write(iterator)

    def commit(
        self, messages: List[Optional[WriterCommitMessage]], batchId: int
    ) -> None:
        epoch_dir = os.path.join(self.path, f"epoch={batchId}")
        os.makedirs(epoch_dir, exist_ok=True)
        # replayed epoch: drop the interrupted attempt's committed parts
        for f in os.listdir(epoch_dir):
            if f.startswith("part-") and f.endswith(".ndjson"):
                os.remove(os.path.join(epoch_dir, f))
        total = 0
        for m in messages:
            if m is not None:
                os.rename(
                    m.staged_path,
                    os.path.join(epoch_dir, os.path.basename(m.final_path)),
                )
                total += m.rows
        with open(os.path.join(epoch_dir, "_SUCCESS"), "w") as f:
            f.write(str(total))

    def abort(
        self, messages: List[Optional[WriterCommitMessage]], batchId: int
    ) -> None:
        self.inner.abort(messages)


class EsBulkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "es_bulk"

    def writer(self, schema: StructType, overwrite: bool) -> EsBulkWriter:
        return EsBulkWriter(self.options, overwrite)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> EsBulkStreamWriter:
        return EsBulkStreamWriter(self.options, overwrite)
