"""Behavioral parity tests for the driver-local in-memory flatten.

Three layers of checking:

1. unit tests of the documented semantics (quirks Q1/Q2, arrays, depth cap,
   envelope detect, multi-doc column union);
2. the golden document: shape + spot values that SURVEY.md records as
   [verified by execution] against the reference;
3. direct comparison against the reference's own ``json_to_tsv_in_memory``
   (imported with its missing config modules stubbed), including a
   hypothesis-randomized document generator — skipped automatically if the
   reference can't be imported.
"""

from __future__ import annotations

import json
import sys
import types

import pytest

from etl_pipeline_for_elasticsearch_json_document_spark.local import json_to_tsv_in_memory

GOLDEN = "/root/reference/ElasticSearch_Document.json"


# ---------------------------------------------------------------------------
# 1. semantics units
# ---------------------------------------------------------------------------


def flat1(doc, **kw):
    """Flatten one doc → {column: value} dict."""
    df = json_to_tsv_in_memory(doc, **kw)
    assert len(df) == 1
    return df.iloc[0].to_dict()


def test_scalars_and_nulls():
    row = flat1({"a": 1, "b": 2.5, "c": "x", "d": None, "e": True, "f": False})
    assert row == {"A": "1", "B": "2.5", "C": "x", "D": "", "E": "True", "F": "False"}


def test_nested_objects_pascal_join():
    row = flat1({"outer": {"innerField": {"leaf": 7}}})
    assert row == {"Outer_InnerField_Leaf": "7"}


def test_array_of_objects_indexed():
    row = flat1({"arr": [{"x": 1}, {"x": 2, "y": 3}]})
    assert row == {"Arr_0_X": "1", "Arr_1_X": "2", "Arr_1_Y": "3"}


def test_primitive_array_is_json_cell():
    row = flat1({"vals": [2250.0], "names": ["", "b"], "empty": []})
    assert row["Vals"] == "[2250.0]"
    assert row["Names"] == '["", "b"]'  # json.dumps spacing
    assert row["Empty"] == "[]"


def test_quirk_q1_digit_map_key_lost():
    # Digit segments only index lists: a digit *map key* is unreachable.
    row = flat1({"valueCodes": {"45": [1000.0], "A2": [1000.0]}})
    assert row["ValueCodes_45"] == ""
    assert row["ValueCodes_A2"] == "[1000.0]"


def test_quirk_q2_underscore_key_lost():
    row = flat1({"my_field": 1, "plain": 2})
    assert row == {"My_field": "", "Plain": "2"}


def test_case_variant_resolution():
    # Already-Pascal keys resolve via the as-is variant.
    row = flat1({"LengthOfStay": 3, "UPPER": "u"})
    assert row["LengthOfStay"] == "3"
    assert row["UPPER"] == "u"


def test_depth_cap_serializes_subtree():
    doc = {"a": {"b": {"c": 1}}}
    assert flat1(doc, max_depth=1) == {"A_B": '{"c": 1}'}
    assert flat1(doc, max_depth=0) == {"A": '{"b": {"c": 1}}'}


def test_envelope_unwrap_and_multi_doc_union():
    env = {
        "hits": {
            "hits": [
                {"_source": {"a": 1}},
                {"_source": {"b": {"c": 2}}},
            ]
        }
    }
    df = json_to_tsv_in_memory(env)
    assert list(df.columns) == ["A", "B_C"]
    assert df.iloc[0].to_dict() == {"A": "1", "B_C": ""}  # missing → ''
    assert df.iloc[1].to_dict() == {"A": "", "B_C": "2"}


def test_list_batch_extension():
    df = json_to_tsv_in_memory([{"a": 1}, {"a": 2}])
    assert df["A"].tolist() == ["1", "2"]


def test_ragged_arrays_default_empty():
    df = json_to_tsv_in_memory([{"arr": [{"x": 1}, {"x": 2}]}, {"arr": [{"x": 9}]}])
    assert df["Arr_1_X"].tolist() == ["2", ""]


def test_pinned_columns_skip_discovery():
    df = json_to_tsv_in_memory({"a": 1, "b": 2}, columns=["A", "Z"])
    assert df.iloc[0].to_dict() == {"A": "1", "Z": ""}


# ---------------------------------------------------------------------------
# 2. golden document
# ---------------------------------------------------------------------------


def test_golden_document_shape_and_spot_values():
    with open(GOLDEN) as f:
        data = json.load(f)
    df = json_to_tsv_in_memory(data)
    assert df.shape == (1, 5028)  # SURVEY.md §1.5 [verified by execution]
    row = df.iloc[0]
    assert row["ValueCodes_45"] == ""  # Q1 on real data (SURVEY.md §1.4)
    assert row["ValueCodes_A2"] == "[1000.0]"
    assert list(df.columns) == sorted(df.columns)


# ---------------------------------------------------------------------------
# 3. reference comparison (behavioral oracle)
# ---------------------------------------------------------------------------


def _import_reference():
    """Import the reference module with its missing config deps stubbed."""
    cfg = types.ModuleType("elasticsearch_config")
    cfg.BASE_QUERY = {"query": {"match_all": {}}, "size": 100, "sort": []}
    cfg.ES = None
    utils = types.ModuleType("utils")
    utils.log_to_sql_db = lambda **kw: None
    sys.modules.setdefault("elasticsearch_config", cfg)
    sys.modules.setdefault("utils", utils)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "reference_etl", "/root/reference/ElasticSearch ETL.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


try:
    _REF = _import_reference()
except Exception:  # pragma: no cover - container without the reference
    _REF = None

needs_ref = pytest.mark.skipif(_REF is None, reason="reference not importable")


def assert_matches_reference(data, max_depth=20):
    ours = json_to_tsv_in_memory(data, max_depth=max_depth)
    theirs = _REF.json_to_tsv_in_memory(data, max_depth=max_depth)
    assert list(ours.columns) == list(theirs.columns)
    assert ours.to_dict("records") == theirs.to_dict("records")


@needs_ref
def test_reference_parity_golden_document():
    with open(GOLDEN) as f:
        data = json.load(f)
    assert_matches_reference(data)


@needs_ref
@pytest.mark.parametrize("max_depth", [0, 1, 2, 20])
def test_reference_parity_edge_docs(max_depth):
    doc = {
        "plain": "v",
        "num": 3,
        "neg": -1.5,
        "flag": True,
        "off": False,
        "none": None,
        "my_field": 1,
        "CAPS_key": {"inner": 2},
        "digits": {"45": "a", "A2": "b", "7x": "c"},
        "arr": [{"x": 1}, {"x": 2, "deep": {"z": [1, 2]}}],
        "prims": [1, "two", None, True],
        "empty_list": [],
        "empty_obj": {},
        "listlist": [[1], [2]],
        "Mixed_Case": {"lengthOfStay": 9, "LengthOfStay": 10},
    }
    assert_matches_reference(doc, max_depth=max_depth)


@needs_ref
def test_reference_parity_hypothesis_random_docs():
    from hypothesis import given, settings, strategies as st

    keys = st.sampled_from(
        ["a", "b", "camelKey", "Pascal", "my_field", "45", "x7", "UPPER", "s"]
    )
    scalars = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(-1000, 1000),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.text(max_size=8),
    )
    values = st.recursive(
        scalars,
        lambda kids: st.one_of(
            st.lists(kids, max_size=3),
            st.dictionaries(keys, kids, max_size=4),
        ),
        max_leaves=25,
    )
    docs = st.dictionaries(keys, values, min_size=1, max_size=5)

    @settings(max_examples=150, deadline=None)
    @given(doc=docs, max_depth=st.sampled_from([1, 3, 20]))
    def check(doc, max_depth):
        # reference crashes on mixed dict-first lists; its first-element
        # type check routes [dict, int] into item.items() — skip those
        def has_mixed(o):
            if isinstance(o, dict):
                return any(has_mixed(v) for v in o.values())
            if isinstance(o, list):
                if o and isinstance(o[0], dict) and not all(isinstance(i, dict) for i in o):
                    return True
                return any(has_mixed(v) for v in o)
            return False

        if has_mixed(doc):
            return
        assert_matches_reference(doc, max_depth=max_depth)

    check()
