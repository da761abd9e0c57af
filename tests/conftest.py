from __future__ import annotations

import importlib.util
import sys
import types

import pytest


@pytest.fixture(scope="session")
def spark():
    from etl_pipeline_for_elasticsearch_json_document_spark.session import get_spark

    spark = get_spark("etl-pipeline-spark-tests")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    yield spark


REFERENCE_ETL = "/root/reference/ElasticSearch ETL.py"


@pytest.fixture(scope="session")
def reference_etl():
    """Import the reference implementation in place (read-only) to use as a
    differential test oracle. Its absent config/util modules are stubbed the
    same way SURVEY.md §0.2 describes."""
    es_cfg = types.ModuleType("elasticsearch_config")
    es_cfg.BASE_QUERY = {"query": {"match_all": {}}, "size": 10}
    es_cfg.ES = None
    utils = types.ModuleType("utils")
    utils.log_to_sql_db = lambda **kw: None
    sys.modules.setdefault("elasticsearch_config", es_cfg)
    sys.modules.setdefault("utils", utils)
    spec = importlib.util.spec_from_file_location("reference_etl", REFERENCE_ETL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def golden_direct_flat(spark):
    """flatten(golden file, bug_compat=True) computed ONCE per session —
    the canonical (columns, row-dict) the transport-parity tests compare
    their re-scanned flattens against. Hoisted in r14 (suite wall time,
    VERDICT r13 item 2): test_es_live and test_es_roundtrip each rebuilt
    this identical 5,028-column flatten inline; the canonical side is
    itself pinned byte-for-byte against the reference implementation by
    tests/test_flatten.py::test_golden_document_parity, so sharing it
    drops two redundant full plan-gens + collects without weakening any
    assertion."""
    from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import (
        flatten,
    )
    from etl_pipeline_for_elasticsearch_json_document_spark.sources import (
        elasticsearch as es_src,
    )

    direct = es_src.read_search_response_json(
        spark, "/root/reference/ElasticSearch_Document.json"
    )
    flat = flatten(direct, bug_compat=True)
    return flat.columns, flat.collect()[0].asDict()
