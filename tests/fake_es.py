"""Loopback fake Elasticsearch for integration tests (stdlib only).

Implements exactly the REST subset the pipeline uses — ``_bulk`` ingest,
``_search`` with ``sort`` + ``size`` + ``search_after`` keyset pagination,
and ``_count`` — over ``http.server``, so the source tier
(``scan_with_client`` + ``HttpEsClient``) and the sink tier
(``write_bulk_files`` → ``replay_bulk_files``) can run a true round trip
with no Elasticsearch install. Semantics mirrored from the real API:

- ``index`` bulk actions upsert by ``_id`` (replays converge, never
  duplicate); auto-ids are assigned when the action has no ``_id``
- ``_search`` sorts by the requested ``sort`` fields (read from each
  doc's ``_source``), applies ``search_after`` as a strict lexicographic
  keyset predicate, and returns the standard ``hits.hits[*]._source``
  envelope with per-hit ``_index``/``_id``/``sort`` values
- ``slice: {"id": i, "max": N}`` partitions the index by a hash of the
  document ``_id`` (real ES slices scrolls/PITs the same way): the N
  slices are disjoint and their union is the full index, so N clients can
  page concurrently — the server side of the distributed ``es_live`` read
- ``POST /{index}/_pit`` opens a point-in-time: the doc set is FROZEN at
  open, searches carrying ``"pit": {"id": ...}`` go to ``POST /_search``
  (no index path — mirroring real ES, which rejects the combination) and
  read the snapshot; ``DELETE /_pit`` closes it. As in real ES, ``slice``
  is REJECTED on a plain ``_search`` without a PIT context — a sliced
  read of a live index can tear across pages, so the protocol refuses it
"""

from __future__ import annotations

import hashlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any


class _State:
    def __init__(self) -> None:
        self.indices: dict[str, dict[str, dict]] = {}
        self.auto_id = 0
        self.lock = threading.Lock()
        #: when > 0, that many _bulk requests are rejected with 429 before
        #: accepting — simulates a throttling cluster for retry tests
        self.throttle_next_bulks = 0
        #: same knob for the read side: that many _search requests 429
        self.throttle_next_searches = 0
        #: pit id → (index name, frozen copy of its docs at PIT-open time)
        self.pits: dict[str, tuple[str, dict[str, dict]]] = {}
        self.pit_seq = 0


def _slice_of(doc_id: str, n: int) -> int:
    """Deterministic slice assignment by document id (real ES uses a
    murmur3 of the routing id; any stable hash gives the same contract:
    disjoint slices whose union is the index)."""
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % n


def _sort_spec(body: dict[str, Any]) -> list[tuple[str, bool]]:
    """[(field, ascending)] from the request's ``sort`` clause."""
    spec = []
    for entry in body.get("sort", []):
        if isinstance(entry, str):
            spec.append((entry, True))
        else:
            for field, order in entry.items():
                direction = order if isinstance(order, str) else order.get("order", "asc")
                spec.append((field, direction != "desc"))
    return spec


def _es_type_of(value: Any) -> dict[str, Any]:
    """Dynamic-mapping type for one JSON value (real ES's defaults:
    JSON string → text with a .keyword subfield, integer → long,
    decimal → float, bool → boolean, object → recursed properties;
    JSON arrays are typed by their elements — arrays are invisible to
    ES mappings)."""
    if isinstance(value, bool):
        return {"type": "boolean"}
    if isinstance(value, int):
        return {"type": "long"}
    if isinstance(value, float):
        return {"type": "float"}
    if isinstance(value, dict):
        return {"properties": _merge_properties([value])}
    if isinstance(value, list):
        for v in value:
            if v is not None:
                return _es_type_of(v)
        return {}
    return {
        "type": "text",
        "fields": {"keyword": {"type": "keyword", "ignore_above": 256}},
    }


def _merge_properties(docs: list[dict]) -> dict[str, Any]:
    props: dict[str, Any] = {}
    for doc in docs:
        for field, value in doc.items():
            if value is None or field in props:
                continue  # first-typed wins, like real ES dynamic mapping
            t = _es_type_of(value)
            if t:
                props[field] = t
    return props


def _dynamic_mapping(docs: list[dict]) -> dict[str, Any]:
    return {"properties": _merge_properties(docs)} if docs else {}


class _Handler(BaseHTTPRequestHandler):
    state: _State  # assigned by start_fake_es

    def log_message(self, *args) -> None:  # silence per-request stderr spam
        pass

    def _reply(self, obj: dict[str, Any], status: int = 200) -> None:
        data = json.dumps(obj).encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _body(self) -> bytes:
        return self.rfile.read(int(self.headers.get("Content-Length", 0)))

    def do_POST(self) -> None:  # noqa: N802 (http.server API)
        path = self.path.split("?", 1)[0]
        parts = [p for p in path.split("/") if p]
        if len(parts) == 2 and parts[1] == "_pit":
            with self.state.lock:
                self.state.pit_seq += 1
                pit_id = f"pit-{self.state.pit_seq}"
                # freeze: deep-enough copy (docs are never mutated in place)
                self.state.pits[pit_id] = (
                    parts[0],
                    dict(self.state.indices.get(parts[0], {})),
                )
            self._reply({"id": pit_id})
        elif len(parts) == 1 and parts[0] == "_search":
            # body-only search: the PIT id pins index + snapshot
            self._search(None, json.loads(self._body() or b"{}"))
        elif parts and parts[-1] == "_bulk":
            with self.state.lock:
                throttled = self.state.throttle_next_bulks > 0
                if throttled:
                    self.state.throttle_next_bulks -= 1
            if throttled:
                self._reply({"error": "es_rejected_execution_exception"}, status=429)
                return
            default_index = parts[0] if len(parts) == 2 else None
            self._bulk(self._body().decode("utf-8"), default_index)
        elif len(parts) == 2 and parts[1] == "_search":
            self._search(parts[0], json.loads(self._body() or b"{}"))
        elif len(parts) == 2 and parts[1] == "_count":
            with self.state.lock:
                n = len(self.state.indices.get(parts[0], {}))
            self._reply({"count": n})
        else:
            self._reply({"error": f"unsupported path {self.path}"}, status=400)

    def _bulk(self, payload: str, default_index: str | None) -> None:
        lines = [ln for ln in payload.split("\n") if ln.strip()]
        items = []
        with self.state.lock:
            i = 0
            while i < len(lines):
                action = json.loads(lines[i])
                op = next(iter(action))
                if op not in ("index", "create"):
                    self._reply({"error": f"unsupported bulk op {op}"}, status=400)
                    return
                meta = action[op]
                index = meta.get("_index", default_index)
                doc = json.loads(lines[i + 1])
                doc_id = meta.get("_id")
                if doc_id is None:
                    self.state.auto_id += 1
                    doc_id = f"auto-{self.state.auto_id}"
                self.state.indices.setdefault(index, {})[str(doc_id)] = doc
                items.append({op: {"_index": index, "_id": str(doc_id), "status": 200}})
                i += 2
        self._reply({"errors": False, "items": items})

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        path = self.path.split("?", 1)[0]
        parts = [p for p in path.split("/") if p]
        if len(parts) == 2 and parts[1] == "_mapping":
            index = parts[0]
            with self.state.lock:
                docs = list(self.state.indices.get(index, {}).values())
            self._reply({index: {"mappings": _dynamic_mapping(docs)}})
        else:
            self._reply({"error": f"unsupported path {self.path}"}, status=400)

    def do_DELETE(self) -> None:  # noqa: N802 (http.server API)
        path = self.path.split("?", 1)[0]
        parts = [p for p in path.split("/") if p]
        if parts == ["_pit"]:
            pit_id = json.loads(self._body() or b"{}").get("id")
            with self.state.lock:
                existed = self.state.pits.pop(pit_id, None) is not None
            self._reply({"succeeded": existed, "num_freed": int(existed)})
        else:
            self._reply({"error": f"unsupported path {self.path}"}, status=400)

    def _aggs(self, index: str | None, body: dict[str, Any]) -> None:
        """size=0 terms aggregation with optional metric sub-aggs — the
        slice of the ES aggs DSL the engine pushes down (es_agg.py)."""
        with self.state.lock:
            docs = [d for _, d in self.state.indices.get(index, {}).items()]
        q = body.get("query")
        if q is not None and "match_all" not in q:
            term = q.get("term")
            if term is None or len(term) != 1:
                # refuse silently-wrong results: only match_all/term are modeled
                self._reply({"error": "aggs query supports match_all/term only"},
                            status=400)
                return
            (tf, tv), = term.items()
            docs = [d for d in docs if d.get(tf) == tv]
        out: dict[str, Any] = {}
        for name, spec in body["aggs"].items():
            terms = spec.get("terms")
            hist = spec.get("histogram")
            dhist = spec.get("date_histogram")
            rng = spec.get("range")
            # top-level METRIC aggs (no bucketing) — real ES allows
            # min/max/sum/avg/value_count directly under "aggs"; the
            # pushdown planners probe field spans this way (es_agg.py)
            metric = next(
                (m for m in ("min", "max", "sum", "avg", "value_count") if m in spec),
                None,
            )
            if metric is not None and terms is None and hist is None \
                    and dhist is None and rng is None:
                field = spec[metric]["field"]
                vals = [
                    d[field] for d in docs
                    if field in d and d[field] is not None
                ]
                if metric == "min":
                    v: Any = min(vals) if vals else None
                elif metric == "max":
                    v = max(vals) if vals else None
                elif metric == "sum":
                    v = sum(vals)
                elif metric == "avg":
                    v = (sum(vals) / len(vals)) if vals else None
                else:
                    v = len(vals)
                out[name] = {"value": v}
                continue
            if terms is None and hist is None and dhist is None and rng is None:
                self._reply({"error": f"unsupported agg {name}"}, status=400)
                return
            groups: dict[Any, list[dict]] = {}
            range_meta: dict[Any, dict[str, Any]] = {}
            if hist is not None:
                field = hist["field"]
                interval = float(hist["interval"])
                for d in docs:
                    if d.get(field) is not None:
                        import math

                        groups.setdefault(
                            math.floor(d[field] / interval) * interval, []
                        ).append(d)
                ordered = sorted(groups)
            elif dhist is not None:
                # calendar truncation of ISO-ish timestamp strings
                # ("YYYY-MM-DD HH:MM:SS" or "YYYY-MM-DDTHH:MM:SS"), the
                # shape bulk ingest serializes Spark timestamps to; real
                # ES buckets dates the same way (key = truncated instant,
                # key_as_string = its rendering)
                field = dhist["field"]
                civ = dhist.get("calendar_interval")
                cut = {"month": 7, "day": 10, "hour": 13}.get(civ)
                if cut is None:
                    self._reply(
                        {"error": f"unsupported calendar_interval {civ}"},
                        status=400,
                    )
                    return
                for d in docs:
                    v = d.get(field)
                    if v is not None:
                        groups.setdefault(str(v)[:cut], []).append(d)
                ordered = sorted(groups)
            elif rng is not None:
                field = rng["field"]
                for r in rng["ranges"]:
                    lo = r.get("from")
                    hi = r.get("to")
                    key = (
                        f"{lo if lo is not None else '*'}-"
                        f"{hi if hi is not None else '*'}"
                    )
                    members = [
                        d
                        for d in docs
                        if d.get(field) is not None
                        and (lo is None or d[field] >= lo)
                        and (hi is None or d[field] < hi)
                    ]
                    groups[key] = members
                    meta: dict[str, Any] = {}
                    if lo is not None:
                        meta["from"] = float(lo)
                    if hi is not None:
                        meta["to"] = float(hi)
                    range_meta[key] = meta
                ordered = list(groups)  # real ES keeps request order
            else:
                field = terms["field"]
                size = int(terms.get("size", 10))
                for d in docs:
                    if field in d:
                        groups.setdefault(d[field], []).append(d)
                ordered = sorted(groups, key=lambda k: (-len(groups[k]), str(k)))[:size]
            buckets = []
            for key in ordered:
                b: dict[str, Any] = {"key": key, "doc_count": len(groups[key])}
                if dhist is not None:
                    b["key_as_string"] = key
                b.update(range_meta.get(key, {}))
                for mname, mspec in (spec.get("aggs") or {}).items():
                    (mtype, marg), = mspec.items()
                    vals = [
                        d[marg["field"]]
                        for d in groups[key]
                        if marg["field"] in d and d[marg["field"]] is not None
                    ]
                    if mtype == "sum":
                        v: Any = sum(vals)
                    elif mtype == "min":
                        v = min(vals) if vals else None
                    elif mtype == "max":
                        v = max(vals) if vals else None
                    elif mtype == "avg":
                        v = (sum(vals) / len(vals)) if vals else None
                    elif mtype == "value_count":
                        v = len(vals)
                    elif mtype == "cardinality":
                        # single shard, small data: within precision_threshold,
                        # real ES's HLL++ is exact too
                        v = len(set(vals))
                    else:
                        self._reply({"error": f"unsupported metric {mtype}"}, status=400)
                        return
                    b[mname] = {"value": v}
                buckets.append(b)
            out[name] = {"buckets": buckets}
            if terms is not None:
                # single shard → exact (real multi-shard ES reports the
                # possible undercount here; es_agg reads and enforces it)
                out[name]["doc_count_error_upper_bound"] = 0
                out[name]["sum_other_doc_count"] = sum(
                    len(v) for k, v in groups.items() if k not in ordered
                )
        self._reply({"hits": {"total": {"value": len(docs), "relation": "eq"}, "hits": []},
                     "aggregations": out})

    def _composite(self, index: str | None, body: dict[str, Any]) -> None:
        """Composite aggregation with after-key pagination — the
        unbounded-cardinality cousin of terms (es_agg.py's scale path)."""
        with self.state.lock:
            docs = [d for _, d in self.state.indices.get(index, {}).items()]
        q = body.get("query")
        if q is not None and "match_all" not in q:
            term = q.get("term")
            if term is None or len(term) != 1:
                # refuse silently-wrong results: only match_all/term modeled
                self._reply({"error": "aggs query supports match_all/term only"},
                            status=400)
                return
            (tf, tv), = term.items()
            docs = [d for d in docs if d.get(tf) == tv]
        (name, spec), = body["aggs"].items()
        comp = spec["composite"]
        sources = comp["sources"]  # [{outname: {"terms": {"field": f}}}, ...]
        fields = []
        outs = []
        for src in sources:
            (oname, sdef), = src.items()
            outs.append(oname)
            fields.append(sdef["terms"]["field"])
        size = int(comp.get("size", 10))
        after = comp.get("after")
        groups: dict[tuple, list[dict]] = {}
        for d in docs:
            if all(f in d for f in fields):
                groups.setdefault(tuple(d[f] for f in fields), []).append(d)
        keys = sorted(groups, key=lambda k: tuple(str(x) for x in k))
        if after is not None:
            cursor = tuple(str(after[o]) for o in outs)
            keys = [k for k in keys if tuple(str(x) for x in k) > cursor]
        page = keys[:size]
        buckets = []
        for k in page:
            b: dict[str, Any] = {
                "key": dict(zip(outs, k)),
                "doc_count": len(groups[k]),
            }
            for mname, mspec in (spec.get("aggs") or {}).items():
                (mtype, marg), = mspec.items()
                vals = [d[marg["field"]] for d in groups[k]
                        if d.get(marg["field"]) is not None]
                if mtype == "sum":
                    v: Any = sum(vals)
                elif mtype == "min":
                    v = min(vals) if vals else None
                elif mtype == "max":
                    v = max(vals) if vals else None
                elif mtype == "avg":
                    v = (sum(vals) / len(vals)) if vals else None
                elif mtype == "value_count":
                    v = len(vals)
                elif mtype == "cardinality":
                    v = len(set(vals))
                else:
                    self._reply({"error": f"unsupported metric {mtype}"}, status=400)
                    return
                b[mname] = {"value": v}
            buckets.append(b)
        agg_out: dict[str, Any] = {"buckets": buckets}
        if len(page) == size and page:
            agg_out["after_key"] = dict(zip(outs, page[-1]))
        self._reply(
            {
                "hits": {"total": {"value": len(docs), "relation": "eq"}, "hits": []},
                "aggregations": {name: agg_out},
            }
        )

    def _search(self, index: str | None, body: dict[str, Any]) -> None:
        with self.state.lock:
            throttled = self.state.throttle_next_searches > 0
            if throttled:
                self.state.throttle_next_searches -= 1
        if throttled:
            self._reply({"error": "es_rejected_execution_exception"}, status=429)
            return
        if body.get("aggs") and int(body.get("size", 10)) == 0:
            aggs = body["aggs"]
            if len(aggs) == 1 and "composite" in next(iter(aggs.values())):
                self._composite(index, body)
                return
            self._aggs(index, body)
            return
        spec = _sort_spec(body)
        size = int(body.get("size", 10))
        after = body.get("search_after")
        sl = body.get("slice")
        pit = body.get("pit")
        if pit is not None and index is not None:
            # real ES: "[indices] cannot be used with point in time"
            self._reply({"error": "pit cannot be combined with an index path"}, status=400)
            return
        if pit is not None:
            with self.state.lock:
                entry = self.state.pits.get(pit.get("id"))
            if entry is None:
                self._reply({"error": "pit not found or expired"}, status=404)
                return
            index, snapshot = entry
            docs = list(snapshot.items())
        else:
            if sl is not None:
                # real ES: slice is only valid on a PIT or scroll context —
                # a sliced read of a live index can tear across pages
                self._reply(
                    {"error": "slice requires a point-in-time or scroll context"},
                    status=400,
                )
                return
            with self.state.lock:
                docs = list(self.state.indices.get(index, {}).items())
        if sl is not None:
            sl_id, sl_max = int(sl["id"]), int(sl["max"])
            if not (0 <= sl_id < sl_max):
                self._reply({"error": "invalid slice"}, status=400)
                return
            docs = [(i, d) for i, d in docs if _slice_of(i, sl_max) == sl_id]

        def key(item):
            # ascending-only comparison key; descending fields are not
            # needed by the pipeline and are rejected loudly below
            return tuple(item[1].get(f) for f, _ in spec)

        if any(not asc for _, asc in spec):
            self._reply({"error": "descending sort not supported"}, status=400)
            return
        docs.sort(key=key)
        if after is not None:
            docs = [item for item in docs if list(key(item)) > list(after)]
        page = docs[:size]
        hits = [
            {"_index": index, "_id": i, "_source": d, "sort": list(key((i, d)))}
            for i, d in page
        ]
        self._reply(
            {"hits": {"total": {"value": len(docs), "relation": "eq"}, "hits": hits}}
        )


def start_fake_es() -> tuple[ThreadingHTTPServer, str]:
    """Start on an ephemeral loopback port; returns (server, base_url).
    Caller owns shutdown: ``server.shutdown(); server.server_close()``."""
    state = _State()
    handler = type("BoundHandler", (_Handler,), {"state": state})
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, f"http://127.0.0.1:{server.server_address[1]}"
