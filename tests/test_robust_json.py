"""Malformed-JSON contract: split parses good rows and captures bad
lines byte-exactly, quarantine writes a replayable dead letter, strict
mode fails fast, drop mode silently narrows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.sources.robust_json import (
    quarantine_json,
    read_json_drop,
    read_json_split,
    read_json_strict,
)

GOOD = ['{"id": 1, "name": "a"}', '{"id": 2, "name": "b"}', '{"id": 3}']
BAD = ['{"id": 4, "name": ', "not json at all", '{"id": [}']
SCHEMA = "id long, name string"


def _write(tmp_path, lines, name="in.json"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_split_good_and_bad(spark, tmp_path):
    path = _write(tmp_path, GOOD + BAD)
    good, bad = read_json_split(spark, path, SCHEMA)
    assert good.columns == ["id", "name"]  # corrupt col never leaks out
    rows = {r["id"]: r["name"] for r in good.collect()}
    assert rows == {1: "a", 2: "b", 3: None}
    # bad lines survive byte-exactly, replayable after a parser fix
    assert sorted(r["raw"] for r in bad.collect()) == sorted(BAD)


def test_split_all_clean_and_all_bad(spark, tmp_path):
    good, bad = read_json_split(spark, _write(tmp_path, GOOD), SCHEMA)
    assert good.count() == 3 and bad.count() == 0
    good2, bad2 = read_json_split(spark, _write(tmp_path, BAD, "b.json"), SCHEMA)
    assert good2.count() == 0 and bad2.count() == 3


def test_quarantine_writes_dead_letter(spark, tmp_path):
    path = _write(tmp_path, GOOD + BAD)
    dl = str(tmp_path / "dead")
    good = quarantine_json(spark, path, SCHEMA, dl)
    assert good.count() == 3
    raw = [r["value"] for r in spark.read.text(dl).collect()]
    assert sorted(raw) == sorted(BAD)
    # dead-letter lines re-enter the SAME splitter once fixed upstream:
    # here they are still broken, so they quarantine again — no loss
    g2, b2 = read_json_split(spark, dl, SCHEMA)
    assert g2.count() == 0 and b2.count() == 3


def test_strict_raises_drop_narrows(spark, tmp_path):
    path = _write(tmp_path, GOOD + BAD)
    with pytest.raises(Exception, match="Malformed|FAILFAST|malformed"):
        read_json_strict(spark, path, SCHEMA).count()
    dropped = read_json_drop(spark, path, SCHEMA)
    assert dropped.count() == 3
    assert read_json_strict(spark, _write(tmp_path, GOOD, "c.json"), SCHEMA).count() == 3


def test_good_path_plan_is_filter_over_scan(spark, tmp_path):
    """The good side stays one scan + filter (cached single parse pass) —
    no join, no second json read in the plan."""
    path = _write(tmp_path, GOOD + BAD)
    good, _ = read_json_split(spark, path, SCHEMA)
    plan = good._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    agg = good.agg(F.max("id")).first()[0]
    assert agg == 3
