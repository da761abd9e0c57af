"""End-to-end Elasticsearch round trip over a loopback fake ES
(VERDICT r3 item 4): parquet → bulk NDJSON files → ``_bulk`` replay →
``search_after`` re-scan → flatten, with zero third-party installs —
exercising the previously-gated live-protocol tiers of both
sources/elasticsearch.py and sinks/elasticsearch.py for real."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import flatten
from etl_pipeline_for_elasticsearch_json_document_spark.sinks import elasticsearch as es_sink
from etl_pipeline_for_elasticsearch_json_document_spark.sources import elasticsearch as es_src
from etl_pipeline_for_elasticsearch_json_document_spark.sources.es_http import HttpEsClient

from tests.fake_es import start_fake_es

GOLDEN = "/root/reference/ElasticSearch_Document.json"


@pytest.fixture()
def fake_es():
    server, base_url = start_fake_es()
    yield base_url
    server.shutdown()
    server.server_close()


def test_parquet_to_bulk_to_rescan_round_trip(spark, sf_dir, fake_es, tmp_path):
    """The full sink→source loop the reference only runs one way: documents
    parquet → write_bulk_files (hard-capped NDJSON) → urllib _bulk replay →
    keyset-paginated re-scan through scan_with_client. Every row survives
    byte-faithfully and pagination pages strictly advance."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars"
    )
    out = str(tmp_path / "bulk")
    es_sink.write_bulk_files(
        docs.coalesce(2), out, "docs", id_col="doc_id", max_docs_per_file=100
    )
    client = HttpEsClient(fake_es)
    n_files = es_sink.replay_bulk_files(out, fake_es)
    assert n_files >= 5  # 500 docs / ≤100 per file
    assert client.count("docs")["count"] == docs.count()

    base_query = {
        "query": {"match_all": {}},
        "sort": [{"doc_id": "asc"}, {"lang": "asc"}],
        "size": 120,
    }
    pages = list(
        es_src.scan_with_client(
            spark, "docs", base_query, sort_fields=("doc_id", "lang"), es_client=client
        )
    )
    assert len(pages) == 5  # 500 docs / 120 per page, keyset-advanced
    got = pages[0]
    for p in pages[1:]:
        got = got.unionByName(p)
    want = {tuple(r) for r in docs.collect()}
    have = {
        (r["doc_id"], r["lang"], r["source"], r["n_chars"])
        for r in got.collect()
    }
    assert have == want


@pytest.mark.slow
def test_golden_document_flatten_parity_through_fake_es(spark, fake_es, golden_direct_flat):
    """Index the golden document's _source into the fake cluster, re-scan
    it with search_after, and flatten — the result must be column-for-
    column identical to flattening the golden file directly (the
    reference's actual pipeline, now round-tripped through live protocol
    instead of a file)."""
    with open(GOLDEN) as f:
        source = json.load(f)["hits"]["hits"][0]["_source"]
    client = HttpEsClient(fake_es)
    payload = (
        json.dumps({"index": {"_index": "claims", "_id": "g1"}})
        + "\n"
        + json.dumps(source)
        + "\n"
    )
    resp = client.bulk_ndjson(payload)
    assert resp["errors"] is False

    base_query = {
        "query": {"match_all": {}},
        "sort": [
            {"auditProcessedDateTimeUtc": "asc"},
            {"claimRequestId": "asc"},
        ],
        "size": 10,
    }
    pages = list(es_src.scan_with_client(spark, "claims", base_query, es_client=client))
    assert len(pages) == 1
    scanned_flat = flatten(pages[0], bug_compat=True)

    # canonical side shared via the session fixture (r14): identical
    # computation to the inline flatten it replaces, itself pinned against
    # the reference by test_flatten's golden parity test
    d_cols, d_row = golden_direct_flat
    assert scanned_flat.columns == d_cols
    assert len(scanned_flat.columns) == 5028
    s_row = scanned_flat.collect()[0].asDict()
    diff = {k: (s_row[k], d_row[k]) for k in d_row if s_row[k] != d_row[k]}
    assert not diff, f"{len(diff)} cells differ, e.g. {list(diff.items())[:3]}"


def test_bulk_replay_is_idempotent_upsert(spark, fake_es, tmp_path):
    """Replaying the same bulk files twice (crash-retry of the ingestion
    fleet) must converge, not duplicate — explicit _id makes index actions
    upserts."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, body string"
    )
    out = str(tmp_path / "bulk")
    es_sink.write_bulk_files(df, out, "idem", id_col="doc_id")
    client = HttpEsClient(fake_es)
    es_sink.replay_bulk_files(out, fake_es)
    es_sink.replay_bulk_files(out, fake_es)  # second replay: same state
    assert client.count("idem")["count"] == 3


def test_streaming_export_to_live_fake_cluster(spark, fake_es, tmp_path):
    """The continuous north-star flow: JSON files stream in, each
    micro-batch renders _bulk NDJSON and POSTs it to the (fake) cluster;
    a crash replay of the same lineage upserts, never duplicates."""
    import glob as _glob
    import os

    from etl_pipeline_for_elasticsearch_json_document_spark.streaming.es_export import (
        run_es_export_stream,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    with open(inp / "a.json", "w") as f:
        for i in range(7):
            f.write(json.dumps({"doc_id": i, "body": f"doc {i}"}) + "\n")
    out = str(tmp_path / "bulk_out")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema("doc_id long, body string").json(str(inp))
    run_es_export_stream(
        stream, out, "stream_docs", checkpoint_dir=ckpt,
        id_col="doc_id", base_url=fake_es, max_docs_per_file=3,
    ).awaitTermination(600)
    client = HttpEsClient(fake_es)
    assert client.count("stream_docs")["count"] == 7
    dirs = _glob.glob(os.path.join(out, "bulk_epoch*"))
    assert len(dirs) == 1  # one epoch, lineage-scoped name

    # crash replay: same lineage re-delivers epoch 0 -> _id upsert, no dupes
    commits = sorted(_glob.glob(os.path.join(ckpt, "commits", "*")))
    os.remove(commits[-1])
    crc = os.path.join(
        os.path.dirname(commits[-1]), "." + os.path.basename(commits[-1]) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    stream = spark.readStream.schema("doc_id long, body string").json(str(inp))
    run_es_export_stream(
        stream, out, "stream_docs", checkpoint_dir=ckpt,
        id_col="doc_id", base_url=fake_es, max_docs_per_file=3,
    ).awaitTermination(600)
    assert client.count("stream_docs")["count"] == 7  # upserted, not doubled

    # re-scan what the cluster holds and check content survived
    base_query = {"query": {"match_all": {}},
                  "sort": [{"doc_id": "asc"}, {"body": "asc"}], "size": 10}
    pages = list(
        es_src.scan_with_client(
            spark, "stream_docs", base_query, sort_fields=("doc_id", "body"),
            es_client=client,
        )
    )
    got = sorted(r["body"] for p in pages for r in p.collect())
    assert got == [f"doc {i}" for i in range(7)]


def test_es_bulk_datasource_writer(spark, fake_es, tmp_path):
    """The Spark 4 Python DataSource write path: df.write.format('es_bulk')
    stages per-task NDJSON and commits by rename — then the standard
    replayer ships the files to the (fake) cluster. Exercises the full
    DataSourceWriter lifecycle including atomic commit."""
    import os

    from etl_pipeline_for_elasticsearch_json_document_spark.sinks.es_bulk_datasource import (
        EsBulkDataSource,
    )

    spark.dataSource.register(EsBulkDataSource)
    df = spark.createDataFrame(
        [(1, 'weird "id> val', 2.5), (2, "b", None), (3, "c", 0.0)],
        "doc_id long, name string, amount double",
    ).repartition(2)
    out = str(tmp_path / "dsout")
    (
        df.write.format("es_bulk")
        .option("index", "ds_docs")
        .option("id_col", "doc_id")
        .mode("append")
        .save(out)
    )
    files = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    assert files and not [f for f in os.listdir(out) if f.startswith("_staging")]
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    # every file is valid bulk protocol and the total is 3 docs
    n = 0
    for f in files:
        with open(os.path.join(out, f)) as fh:
            lines = [ln for ln in fh.read().splitlines() if ln]
        for a, s in zip(lines[0::2], lines[1::2]):
            action = json.loads(a)
            assert action["index"]["_index"] == "ds_docs"
            json.loads(s)
            n += 1
    assert n == 3
    # replay to the live fake cluster: content round-trips
    es_sink.replay_bulk_files(out, fake_es)
    client = HttpEsClient(fake_es)
    assert client.count("ds_docs")["count"] == 3


def test_es_bulk_datasource_overwrite_clears_stale_parts(spark, fake_es, tmp_path):
    """mode('overwrite') must leave NO committed part files from prior
    writes — an ingest fleet replaying the directory would otherwise ship
    stale bulk payloads alongside the new ones."""
    import os

    from etl_pipeline_for_elasticsearch_json_document_spark.sinks.es_bulk_datasource import (
        EsBulkDataSource,
    )

    spark.dataSource.register(EsBulkDataSource)
    out = str(tmp_path / "ow")
    big = spark.createDataFrame(
        [(i, f"old {i}") for i in range(10)], "doc_id long, body string"
    ).repartition(4)
    (big.write.format("es_bulk").option("index", "ow_docs")
        .option("id_col", "doc_id").mode("append").save(out))
    first_parts = {f for f in os.listdir(out) if f.startswith("part-")}
    assert len(first_parts) >= 2
    small = spark.createDataFrame([(100, "new")], "doc_id long, body string").coalesce(1)
    (small.write.format("es_bulk").option("index", "ow_docs")
        .option("id_col", "doc_id").mode("overwrite").save(out))
    parts = {f for f in os.listdir(out) if f.startswith("part-")}
    assert parts and not (parts & first_parts)  # every stale part removed
    # replaying the dir now ships ONLY the new write
    es_sink.replay_bulk_files(out, fake_es)
    client = HttpEsClient(fake_es)
    assert client.count("ow_docs")["count"] == 1


def test_bulk_replay_retries_throttled_cluster(spark, tmp_path):
    """A loaded cluster 429s bulk requests routinely: the replayer must
    back off and retry (replays upsert by _id, so a re-POST after partial
    application converges), and give up with the real error once retries
    are exhausted."""
    import urllib.error

    server, base_url = start_fake_es()
    try:
        state = server.RequestHandlerClass.state
        df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, body string")
        out = str(tmp_path / "bulk")
        es_sink.write_bulk_files(df, out, "throt", id_col="doc_id")
        client = HttpEsClient(base_url)

        state.throttle_next_bulks = 2  # first two POSTs rejected with 429
        payload = ""
        for f in sorted(__import__("glob").glob(out + "/part-*")):
            with open(f) as fh:
                payload += fh.read()  # concatenated NDJSON stays valid _bulk
        resp = client.bulk_ndjson(payload, retries=3, backoff=0.05)
        assert resp["errors"] is False  # retried through the throttling
        assert client.count("throt")["count"] >= 1

        state.throttle_next_bulks = 10  # more 429s than retries -> surfaces
        with pytest.raises(urllib.error.HTTPError):
            client.bulk_ndjson(payload, retries=1, backoff=0.01)
    finally:
        server.shutdown()
        server.server_close()


def test_search_retries_throttled_cluster(spark, tmp_path):
    """The READ side gets the same throttled-cluster discipline: one
    rejected page must not kill a whole sliced scan. _request retries
    429/503 with backoff and surfaces the error once retries run out."""
    import urllib.error

    server, base_url = start_fake_es()
    try:
        state = server.RequestHandlerClass.state
        df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, body string")
        out = str(tmp_path / "bulk")
        es_sink.write_bulk_files(df, out, "sthrot", id_col="doc_id")
        es_sink.replay_bulk_files(out, base_url)
        client = HttpEsClient(base_url)

        state.throttle_next_searches = 2  # first two searches 429
        resp = client.search("sthrot", {"size": 10, "sort": ["doc_id"]})
        assert len(resp["hits"]["hits"]) == 2  # retried through the 429s

        state.throttle_next_searches = 10  # exhausts retries -> surfaces
        with pytest.raises(urllib.error.HTTPError):
            client._request(
                "POST", "/sthrot/_search", b"{}", "application/json",
                retries=1, backoff=0.01,
            )
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.slow
def test_es_bulk_stream_writer_end_to_end(spark, fake_es, tmp_path):
    """df.writeStream.format('es_bulk'): per-epoch bulk NDJSON dirs with
    _SUCCESS-last commits; every epoch's files replay into the fake
    cluster and the index converges to the streamed rows."""
    import glob
    import os

    from etl_pipeline_for_elasticsearch_json_document_spark.sinks.es_bulk_datasource import (
        EsBulkDataSource,
    )

    spark.dataSource.register(EsBulkDataSource)
    src = str(tmp_path / "src")
    out = str(tmp_path / "bulk_stream")
    ckpt = str(tmp_path / "ckpt")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, body string")
    df2 = spark.createDataFrame([(3, "c")], "doc_id long, body string")
    df1.coalesce(1).write.mode("append").json(src)
    df2.coalesce(1).write.mode("append").json(src)
    stream = (
        spark.readStream.schema("doc_id long, body string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        stream.writeStream.format("es_bulk")
        .option("index", "streamed")
        .option("id_col", "doc_id")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
    )
    assert q.awaitTermination(600), "stream drain timed out"

    epochs = sorted(glob.glob(os.path.join(out, "epoch=*")))
    assert len(epochs) == 2
    for e in epochs:
        assert os.path.exists(os.path.join(e, "_SUCCESS"))
        # replay this epoch's bulk files into the live fake cluster
        es_sink.replay_bulk_files(e, fake_es)
    client = HttpEsClient(fake_es)
    assert client.count("streamed")["count"] == 3
    got = client.search("streamed", {"size": 10, "sort": ["doc_id"]})
    assert [h["_source"]["body"] for h in got["hits"]["hits"]] == ["a", "b", "c"]


def test_es_bulk_stream_epoch_commit_is_replay_deterministic(tmp_path):
    """A replayed epoch (commit re-fired for the same batchId with fresh
    staged files) ends with ONLY the replay's parts — the interrupted
    attempt's committed parts are removed before the rename, so the
    epoch dir is deterministic and a downstream replayer never ships
    both attempts."""
    import os

    from etl_pipeline_for_elasticsearch_json_document_spark.sinks.es_bulk_datasource import (
        EsBulkStreamWriter,
        _Staged,
    )

    out = str(tmp_path / "bulk")
    w = EsBulkStreamWriter({"path": out, "index": "i"}, overwrite=False)

    def staged(name, rows):
        os.makedirs(out, exist_ok=True)
        p = os.path.join(out, f"_staging_part-{name}.ndjson")
        with open(p, "w") as f:
            f.write("x\n" * rows)
        return _Staged(
            staged_path=p,
            final_path=os.path.join(out, f"part-{name}.ndjson"),
            rows=rows,
        )

    w.commit([staged("attempt1", 2)], batchId=0)
    edir = os.path.join(out, "epoch=0")
    assert sorted(os.listdir(edir)) == ["_SUCCESS", "part-attempt1.ndjson"]
    # crash-after-commit-before-checkpoint: the engine replays epoch 0
    w.commit([staged("attempt2", 3)], batchId=0)
    assert sorted(os.listdir(edir)) == ["_SUCCESS", "part-attempt2.ndjson"]
    with open(os.path.join(edir, "_SUCCESS")) as f:
        assert f.read() == "3"
