from __future__ import annotations

import importlib.util
import sys
import types

import pytest


@pytest.fixture(scope="session")
def spark():
    from etl_pipeline_for_elasticsearch_json_document_spark.session import get_spark

    spark = get_spark("etl-pipeline-spark-tests")
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
