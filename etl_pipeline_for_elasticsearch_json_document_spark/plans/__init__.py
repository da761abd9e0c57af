# NOTE: deliberately does not re-export flatten()/unwrap_envelope() — that
# would shadow the `plans.flatten` submodule. Import from
# `etl_pipeline_for_elasticsearch_json_document_spark` (top level) or from
# `...plans.flatten` directly.
