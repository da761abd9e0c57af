"""Elasticsearch sink: the _bulk NDJSON payload is exact and replayable,
round-trips through the engine's own envelope reader, and the live-client
tier is gated exactly like the source side."""

from __future__ import annotations

import glob
import json

import pytest

from etl_pipeline_for_elasticsearch_json_document_spark.sinks import elasticsearch as es_sink


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "alpha", 10.5), (2, "beta", None), (3, "gamma", 0.0)],
        "claimRequestId long, name string, amount double",
    )


def test_bulk_payload_is_valid_bulk_protocol(docs):
    rows = es_sink.bulk_payload(docs, "claims", id_col="claimRequestId").collect()
    assert len(rows) == 3
    by_id = {}
    for r in rows:
        action = json.loads(r["action"])
        source = json.loads(r["source"])
        assert set(action) == {"index"}
        assert action["index"]["_index"] == "claims"
        by_id[action["index"]["_id"]] = source
    # explicit _id per doc → idempotent replays; sources carry the row data
    assert by_id["1"] == {"claimRequestId": 1, "name": "alpha", "amount": 10.5}
    # to_json drops nulls — ES treats a missing field and null identically
    assert by_id["2"] == {"claimRequestId": 2, "name": "beta"}
    assert by_id["3"]["amount"] == 0.0


def test_bulk_payload_without_id(docs):
    rows = es_sink.bulk_payload(docs, "claims").collect()
    for r in rows:
        assert json.loads(r["action"]) == {"index": {"_index": "claims"}}


def test_write_bulk_files_round_trip(docs, tmp_path):
    """Files are POST-ready NDJSON: alternating action/source lines, a HARD
    per-file doc cap (writer-enforced maxRecordsPerFile — no count() job, no
    repartition shuffle), and the source lines re-read by the engine parse
    back to the original rows."""
    p = str(tmp_path / "bulk")
    es_sink.write_bulk_files(
        docs.coalesce(1), p, "claims", id_col="claimRequestId", max_docs_per_file=2
    )
    files = sorted(f for f in glob.glob(p + "/part-*") if not f.endswith(".crc"))
    lines = []
    for f in files:
        with open(f) as fh:
            doc_lines = [ln for ln in fh.read().splitlines() if ln]
            assert len(doc_lines) <= 2 * 2  # hard cap: ≤ max_docs_per_file docs
            lines += doc_lines
    assert len(files) == 2  # 3 docs in one partition, cap 2 → writer splits
    assert len(lines) == 6  # action + source per doc
    actions, sources = lines[0::2], lines[1::2]
    assert all(json.loads(a)["index"]["_index"] == "claims" for a in actions)
    parsed = sorted(json.loads(s)["claimRequestId"] for s in sources)
    assert parsed == [1, 2, 3]


def test_bulk_action_line_escapes_hostile_ids(spark):
    """A string id containing quotes/backslashes/newlines must be JSON-
    escaped in the action line — raw concatenation would corrupt the NDJSON
    and allow injected action metadata (e.g. a different _index)."""
    hostile = 'x", "_index": "evil'
    df = spark.createDataFrame(
        [(hostile, "a"), ('back\\slash"q', "b"), ("nl\nid", "c")],
        "doc_id string, body string",
    )
    rows = es_sink.bulk_payload(df, "claims", id_col="doc_id").collect()
    ids = set()
    for r in rows:
        assert "\n" not in r["action"]  # one action == exactly one NDJSON line
        action = json.loads(r["action"])  # parses ⇒ escaping applied
        assert action["index"]["_index"] == "claims"
        ids.add(action["index"]["_id"])
    assert ids == {hostile, 'back\\slash"q', "nl\nid"}


def test_write_with_client_gated_without_library(docs):
    if es_sink.HAS_ES_CLIENT:
        pytest.skip("elasticsearch client present in this environment")
    with pytest.raises(NotImplementedError, match="not installed"):
        es_sink.write_with_client(docs, "claims")
