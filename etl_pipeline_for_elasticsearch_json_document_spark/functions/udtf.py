"""Python UDTFs (Spark 4 table functions) — the lateral-view escape hatch.

Everything hot-path in this engine is built-in expressions; a UDTF is the
right tool when one input row fans out to a *variable* number of rows with
row-local Python logic that has no builtin equivalent. The example here —
``PathEnumerator`` — re-expresses the reference's recursive path discovery
(``flatten_dict_complete``, ``ElasticSearch ETL.py:37-76``) as a table
function: one JSON document row in, one row per flattened (path, value)
out. The production flatten does this at *plan time* (plans/flatten.py);
the UDTF form is the runtime/exploratory variant for schema-less spelunking
where documents are too heterogeneous to infer one schema (each row pays
Python, so keep it off the 100 TB hot path — it exists for the long tail).

Usage::

    from pyspark.sql.functions import udtf, lit
    spark.udtf.register("enumerate_paths", PathEnumerator)
    spark.sql("SELECT p.* FROM docs, LATERAL enumerate_paths(json_col) p")
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="path string, value string, depth int")
class PathEnumerator:
    """Emit one row per leaf path of a JSON document (underscore-joined
    PascalCase paths, reference naming), value stringified with the
    reference's conventions (None→'', bool→'True'/'False', arrays of
    primitives as JSON)."""

    MAX_DEPTH = 20

    def _pascal(self, s: str) -> str:
        return s[:1].upper() + s[1:] if s else s

    def _walk(self, node, prefix, depth):
        if depth > self.MAX_DEPTH:
            yield prefix, json.dumps(node), depth - 1
            return
        if isinstance(node, dict) and node:
            for k, v in node.items():
                name = self._pascal(str(k))
                path = f"{prefix}_{name}" if prefix else name
                yield from self._walk(v, path, depth + 1)
        elif isinstance(node, list) and node and isinstance(node[0], dict):
            for i, el in enumerate(node):
                yield from self._walk(el, f"{prefix}_{i}", depth + 1)
        else:
            if node is None:
                val = ""
            elif isinstance(node, bool):
                val = "True" if node else "False"
            elif isinstance(node, (dict, list)):
                val = json.dumps(node)
            else:
                val = str(node)
            yield prefix, val, depth

    def eval(self, doc_json: str):
        if doc_json is None:
            return
        try:
            doc = json.loads(doc_json)
        except (ValueError, TypeError):
            return
        yield from self._walk(doc, "", 0)
