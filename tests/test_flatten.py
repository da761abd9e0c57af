"""Differential tests: our Spark flatten vs the reference algorithm run in
place as the oracle (FIXTURES.md §A). ``bug_compat=True`` must match the
reference byte-for-byte including its data-loss quirks Q1/Q2."""

from __future__ import annotations

import json

import pytest

from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import flatten

GOLDEN = "/root/reference/ElasticSearch_Document.json"


def spark_flatten_dicts(spark, docs, **kw):
    """Flatten a list of plain-dict documents through Spark; returns
    (columns, rows-as-list-of-dicts)."""
    sc = spark.sparkContext
    rdd = sc.parallelize([json.dumps(d) for d in docs], max(1, min(len(docs), 4)))
    df = spark.read.json(rdd)
    out = flatten(df, **kw)
    return out.columns, [r.asDict() for r in out.collect()]


def reference_flatten_dicts(reference_etl, docs, max_depth=20):
    envelope = {"hits": {"hits": [{"_source": d} for d in docs]}}
    pdf = reference_etl.json_to_tsv_in_memory(envelope, max_depth=max_depth)
    return list(pdf.columns), pdf.to_dict(orient="records")


def assert_matches_reference(spark, reference_etl, docs, max_depth=20):
    ref_cols, ref_rows = reference_flatten_dicts(reference_etl, docs, max_depth)
    cols, rows = spark_flatten_dicts(spark, docs, max_depth=max_depth, bug_compat=True)
    assert cols == ref_cols
    assert len(rows) == len(ref_rows)
    # Row order: Spark preserves input order within this single-stage plan;
    # compare as multisets keyed by full row content to stay robust.
    key = lambda r: tuple(sorted((k, str(v)) for k, v in r.items()))
    assert sorted(map(key, rows)) == sorted(map(key, ref_rows))


# ---------------------------------------------------------------------------
# FIXTURES.md §A4 micro-fixtures
# ---------------------------------------------------------------------------


def test_claim_mini(spark, reference_etl):
    doc = {
        "claimRequestId": 123,
        "lines": [{"lineNumber": 1, "charge": 100.0}, {"lineNumber": 2, "charge": 200.0}],
    }
    ref_cols, ref_rows = reference_flatten_dicts(reference_etl, [doc])
    assert ref_cols == [
        "ClaimRequestId",
        "Lines_0_Charge",
        "Lines_0_LineNumber",
        "Lines_1_Charge",
        "Lines_1_LineNumber",
    ]
    assert_matches_reference(spark, reference_etl, [doc])


def test_digit_map_key_quirk_q1(spark, reference_etl):
    doc = {"valueCodes": {"45": [2250.0], "A2": [1000.0]}, "id": 1}
    assert_matches_reference(spark, reference_etl, [doc])
    cols, rows = spark_flatten_dicts(spark, [doc], bug_compat=True)
    row = rows[0]
    assert row["ValueCodes_45"] == ""  # Q1: digit key lost by the parser
    assert row["ValueCodes_A2"] == "[1000.0]"


def test_snake_key_quirk_q2(spark, reference_etl):
    doc = {"my_field": 5, "ok": "v"}
    assert_matches_reference(spark, reference_etl, [doc])
    cols, rows = spark_flatten_dicts(spark, [doc], bug_compat=True)
    assert rows[0]["My_field"] == ""  # Q2: underscore key lost by the parser


def test_no_bug_compat_keeps_data(spark):
    doc = {"valueCodes": {"45": [2250.0]}, "my_field": 5}
    cols, rows = spark_flatten_dicts(spark, [doc], bug_compat=False)
    assert rows[0]["ValueCodes_45"] == "[2250.0]"
    assert rows[0]["My_field"] == "5"


def test_empty_list(spark, reference_etl):
    assert_matches_reference(spark, reference_etl, [{"edits": [], "id": 1}])


def test_prim_list_spacing(spark, reference_etl):
    docs = [{"codes": ["S9290", "M4833"], "vals": [1.5, 2.25, None], "id": 1}]
    assert_matches_reference(spark, reference_etl, docs)
    _, rows = spark_flatten_dicts(spark, docs, bug_compat=True)
    assert rows[0]["Codes"] == '["S9290", "M4833"]'  # json.dumps ', ' spacing


@pytest.mark.xfail(
    reason="known deviation: Spark JSON inference unifies mixed int/float "
    "arrays to array<double>, so 2 renders as '2.0' where the reference "
    "keeps the int token",
    strict=True,
)
def test_mixed_numeric_array_known_deviation(spark, reference_etl):
    assert_matches_reference(spark, reference_etl, [{"vals": [1.5, 2], "id": 1}])


def test_serialized_subtree_key_order_known_deviation(spark, reference_etl):
    """Known deviation: JSON *object key order* inside serialized-subtree
    cells (bare-array columns, depth-cap columns) follows Spark's inferred
    schema order (alphabetical), while the reference preserves source
    document key order. The JSON is semantically identical."""
    import json as _json

    docs = [{"lines": [{"q": 2, "extra": "z"}]}, {"lines": []}]
    ref_cols, ref_rows = reference_flatten_dicts(reference_etl, docs)
    cols, rows = spark_flatten_dicts(spark, docs, bug_compat=True)
    assert cols == ref_cols
    ours = sorted(str(r["Lines"]) for r in rows)
    theirs = sorted(str(r["Lines"]) for r in ref_rows)
    assert ours != theirs  # byte-level order differs (pin the deviation)
    canon = lambda v: _json.dumps(_json.loads(v), sort_keys=True) if v else v
    assert [canon(v) for v in ours] == [canon(v) for v in theirs]  # same JSON


def test_nulls(spark, reference_etl):
    assert_matches_reference(spark, reference_etl, [{"x": None, "y": {"z": None}, "id": 1}])


def test_bools(spark, reference_etl):
    docs = [{"f": True, "g": False, "id": 1}, {"f": False, "id": 2}]
    assert_matches_reference(spark, reference_etl, docs)
    _, rows = spark_flatten_dicts(spark, docs, bug_compat=True)
    by_id = {r["Id"]: r for r in rows}
    assert by_id["1"]["F"] == "True" and by_id["1"]["G"] == "False"
    assert by_id["2"]["G"] == ""  # missing field → ''


def test_depth_cap(spark, reference_etl):
    doc = {"l1": {"l2": {"l3": {"l4": {"v": 42}}}}}
    assert_matches_reference(spark, reference_etl, [doc], max_depth=2)
    _, rows = spark_flatten_dicts(spark, [doc], max_depth=2, bug_compat=True)
    assert rows[0]["L1_L2_L3"] == '{"l4": {"v": 42}}'


def test_multi_doc_union(spark, reference_etl):
    docs = [
        {"a": 1, "nested": {"x": "q"}},
        {"a": 2, "b": "z", "arr": [{"q": 1}, {"q": 2}]},
    ]
    assert_matches_reference(spark, reference_etl, docs)


def test_big_array_lexicographic_order(spark, reference_etl):
    doc = {"arr": [{"v": i} for i in range(12)]}
    ref_cols, _ = reference_flatten_dicts(reference_etl, [doc])
    assert ref_cols[:4] == ["Arr_0_V", "Arr_10_V", "Arr_11_V", "Arr_1_V"]
    assert_matches_reference(spark, reference_etl, [doc])


def test_pascal_key_variants(spark, reference_etl):
    docs = [{"LengthOfStay": 1, "UPPER": "u", "mixedCase": 2.5}]
    assert_matches_reference(spark, reference_etl, docs)


def test_empty_array_in_one_doc_bare_column(spark, reference_etl):
    # Reference's empty-list branch: bare column exists and serializes the
    # full array for docs where the array is non-empty.
    docs = [{"lines": [], "id": 1}, {"lines": [{"q": 7}], "id": 2}]
    assert_matches_reference(spark, reference_etl, docs)


def test_array_of_arrays(spark, reference_etl):
    assert_matches_reference(spark, reference_etl, [{"m": [[1, 2], [3]], "id": 1}])


def test_ragged_nested_arrays(spark, reference_etl):
    # Per-index nested array lengths must be data-driven per outer index.
    docs = [
        {"lines": [{"msgs": [{"e": 1}, {"e": 2}]}, {"msgs": [{"e": 3}]}]},
        {"lines": [{"msgs": []}]},
    ]
    assert_matches_reference(spark, reference_etl, docs)


# ---------------------------------------------------------------------------
# Golden document (FIXTURES.md §A2/§A3): 1 row × 5,028 columns
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_golden_document_parity(spark, reference_etl):
    with open(GOLDEN) as f:
        data = json.load(f)
    ref_pdf = reference_etl.json_to_tsv_in_memory(data)
    assert ref_pdf.shape == (1, 5028)

    df = spark.read.option("multiLine", True).json(GOLDEN)
    out = flatten(df, bug_compat=True)
    assert out.columns == list(ref_pdf.columns)
    row = out.collect()[0].asDict()
    ref_row = ref_pdf.iloc[0].to_dict()
    mismatches = {
        c: (row[c], ref_row[c]) for c in ref_pdf.columns if str(row[c]) != str(ref_row[c])
    }
    assert not mismatches, f"{len(mismatches)} mismatched cells, e.g. {list(mismatches.items())[:10]}"


# ---------------------------------------------------------------------------
# Column-family split (the M5 scale path)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_flatten_families_partition_and_values(spark):
    from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import flatten_families

    df = spark.read.option("multiLine", True).json(GOLDEN)
    wide = flatten(df)
    # alias the key to a name outside the flattened column space — the
    # document itself flattens to a ClaimRequestId column
    fams = flatten_families(df, families=10, key_exprs=("claimRequestId AS __key",))
    assert len(fams) >= 5  # ~10 requested; subtree granularity may merge some
    # the families partition the wide column set exactly (keys aside)
    fam_cols = []
    for d in fams.values():
        assert d.columns[0] == "__key"
        fam_cols.extend(d.columns[1:])
    assert sorted(fam_cols) == sorted(wide.columns)
    assert len(fam_cols) == len(set(fam_cols))
    # spot-check values of one family against the wide flatten
    name, fam = next(iter(fams.items()))
    wide_row = wide.select(*fam.columns[1:]).collect()[0].asDict()
    fam_row = fam.drop("__key").collect()[0].asDict()
    assert fam_row == wide_row


@pytest.mark.slow
def test_flatten_families_scan_is_pruned(spark, tmp_path):
    """A family's parquet scan must read only its subtree, not the whole
    document — the I/O win that motivates the split. (Parquet only: JSON
    scans are row-oriented and don't nested-prune.)"""
    import contextlib
    import io

    from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import (
        flatten_families,
        unwrap_envelope,
    )

    src = unwrap_envelope(spark.read.option("multiLine", True).json(GOLDEN))
    path = str(tmp_path / "docs.parquet")
    src.write.parquet(path)
    docs = spark.read.parquet(path)
    fams = flatten_families(docs, families=10)
    # pick a family that does NOT cover the medicare subtree
    name, fam = next(
        (n, d) for n, d in fams.items() if not any(c.startswith("Medicare") for c in d.columns)
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fam.explain(mode="formatted")
    read_schema = [l for l in buf.getvalue().splitlines() if "ReadSchema" in l][0]
    assert "medicareConfig" not in read_schema, name


def test_write_families_concurrent_round_trip(spark, tmp_path):
    """write_families materializes every family table concurrently; read
    back, the union of family columns (minus keys) must equal the wide
    flatten's column set and values must match per key."""
    from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import (
        flatten,
        flatten_families,
        write_families,
    )

    docs = spark.createDataFrame(
        [(i, {"a": f"x{i}", "b": {"c": i}}) for i in range(20)],
        "docId long, payload struct<a:string, b:struct<c:long>>",
    )
    fams = flatten_families(docs, families=3, key_exprs=("docId AS __key",))
    paths = write_families(fams, str(tmp_path / "fams"))
    wide = flatten(docs)
    cols = set()
    joined = None
    for name, p in paths.items():
        t = spark.read.parquet(p)
        cols |= set(t.columns) - {"__key"}
        joined = t if joined is None else joined.join(t, "__key")
    assert cols == set(wide.columns)
    got = {r["__key"]: r for r in joined.collect()}
    want = {r["DocId"]: r for r in wide.collect()}
    assert len(got) == 20
    for k, w in want.items():
        g = got[int(k)]
        assert all(g[c] == w[c] for c in cols)


# ---------------------------------------------------------------------------
# r5: staged cascade, wide_flatten_conf, MapType schemas (iterative
# discovery branch), single-job probe discovery
# ---------------------------------------------------------------------------


def test_staged_equals_wide(spark):
    """flatten(staged=True) and the wide single select are the same bytes —
    the cascade is an execution form, not a semantic variant."""
    from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import (
        apply_flatten_stages,
        flatten_stages,
    )

    docs = [
        {"a": [{"b": [{"c": 1}, {"c": 2}], "d": True}, {"b": [], "d": False}],
         "e": {"f": [1, 2]}, "g": None},
        {"a": [{"b": [{"c": 3}]}], "e": {"f": []}, "g": "x"},
    ]
    cols_w, rows_w = spark_flatten_dicts(spark, docs, staged=False)
    cols_s, rows_s = spark_flatten_dicts(spark, docs, staged=True)
    assert cols_w == cols_s
    key = lambda r: tuple(sorted((k, str(v)) for k, v in r.items()))
    assert sorted(map(key, rows_w)) == sorted(map(key, rows_s))
    # min_columns=0 forces anchor extraction even on this small plan; same rows
    import json as _json

    rdd = spark.sparkContext.parallelize([_json.dumps(d) for d in docs], 2)
    df = spark.read.json(rdd)
    stages = flatten_stages(df, min_columns=0)
    assert len(stages) > 1  # anchors extracted into at least one pre-stage
    staged = apply_flatten_stages(df, stages)
    assert sorted(map(key, (r.asDict() for r in staged.collect()))) == sorted(
        map(key, rows_w)
    )


def test_wide_flatten_conf_scoped_and_parity(spark):
    from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import (
        wide_flatten_conf,
    )

    key = "spark.sql.optimizer.excludedRules"
    before = spark.conf.get(key, None)
    docs = [{"a": [{"b": 1.5, "c": [True, False]}], "d": "x_y"}]
    _, rows_plain = spark_flatten_dicts(spark, docs)
    with wide_flatten_conf(spark):
        assert "ConstantFolding" in spark.conf.get(key)
        _, rows_conf = spark_flatten_dicts(spark, docs)
    assert spark.conf.get(key, None) == before  # restored
    assert rows_plain == rows_conf


def test_flatten_map_schema_iterative_branch(spark):
    """Explicit MapType schemas (never produced by JSON inference) keep the
    per-level discovery loop: map keys become PascalCase columns, arrays
    under map values still get index ranges."""
    from pyspark.sql import Row

    from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import flatten

    df = spark.createDataFrame(
        [
            Row(id=1, attrs={"unitPrice": 9.5, "qty": 2.0}),
            Row(id=2, attrs={"qty": 1.0, "colorCode": 3.0}),
        ],
        schema="id bigint, attrs map<string,double>",
    )
    out = flatten(df)
    assert out.columns == ["Attrs_ColorCode", "Attrs_Qty", "Attrs_UnitPrice", "Id"]
    rows = {r["Id"]: r.asDict() for r in out.collect()}
    assert rows["1"]["Attrs_UnitPrice"] == "9.5"
    assert rows["1"]["Attrs_ColorCode"] == ""  # absent key -> '' default
    assert rows["2"]["Attrs_Qty"] == "1.0"


def test_probe_discovery_matches_per_level_aggs(spark):
    """The single-job probe must return exactly what the per-level
    aggregation loop measured: per concrete instance RAW PATH, (min over
    rows where present, max), absent arrays omitted."""
    import json as _json

    from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import (
        _probe_key,
        _probe_lengths,
    )

    docs = [
        {"a": [{"b": [{"x": 1}, {"x": 2}]}, {"b": []}], "solo": [{"y": 1}]},
        {"a": [{"b": [{"x": 3}]}]},  # solo absent here; a shorter
        {"a": []},
    ]
    rdd = spark.sparkContext.parallelize([_json.dumps(d) for d in docs], 2)
    df = spark.read.json(rdd)
    got = _probe_lengths(df, 20)
    assert got == {
        _probe_key(("a",)): (0, 2),           # sizes 2, 1, 0
        _probe_key(("a", 0, "b")): (1, 2),    # present in docs 1-2, sizes 2 / 1
        _probe_key(("a", 1, "b")): (0, 0),    # only doc 1 has a[1]; its b empty
        _probe_key(("solo",)): (1, 1),        # absent rows don't contribute
    }


def test_probe_name_collision_keeps_separate_ranges(spark):
    """ADVICE r5: two schema paths whose FLATTENED NAMES collide (here
    ``x[0].y`` and ``x_0.y`` both render as ``X_0_Y``) must keep SEPARATE
    probe entries — r5's name-keyed probe merged their size ranges, so the
    collided name could gain index columns neither path justifies."""
    import json as _json

    from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import (
        _probe_key,
        _probe_lengths,
    )

    docs = [
        {
            "x": [{"y": [{"v": 1}]}],
            "x_0": {"y": [{"v": 7}, {"v": 8}, {"v": 9}]},
        }
    ]
    rdd = spark.sparkContext.parallelize([_json.dumps(d) for d in docs], 1)
    df = spark.read.json(rdd)
    got = _probe_lengths(df, 20)
    assert got[_probe_key(("x",))] == (1, 1)
    # name-colliding instances measured independently, not merged to (1, 3)
    assert got[_probe_key(("x", 0, "y"))] == (1, 1)
    assert got[_probe_key(("x_0", "y"))] == (3, 3)


@pytest.mark.slow
def test_dedup_close_default_star(spark):
    """dedup_close (the production closer) must produce the same clusters
    as the scored-pair path at threshold 0, and honor a custom id column."""
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.dedup import (
        dedup_close,
        minhash_lsh_pairs,
    )
    from etl_pipeline_for_elasticsearch_json_document_spark.operators.graph import (
        dedup_clusters,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "a completely different document about spark execution plans"),
            (4, "a completely different document about spark execution plans"),
            (5, "unique text that matches nothing else in this tiny corpus"),
        ],
        ["doc_id", "text"],
    )
    got = {
        (r["doc_id"], r["cluster_id"], r["is_representative"])
        for r in dedup_close(docs).collect()
    }
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=16, bands=4)
    want = {
        (r["doc_id"], r["cluster_id"], r["is_representative"])
        for r in dedup_clusters(pairs, docs).collect()
    }
    assert got == want
    renamed = docs.withColumnRenamed("doc_id", "uid")
    got2 = {r["uid"]: r["cluster_id"] for r in dedup_close(renamed, id_col="uid").collect()}
    assert got2 == {r[0]: r[1] for r in got}
