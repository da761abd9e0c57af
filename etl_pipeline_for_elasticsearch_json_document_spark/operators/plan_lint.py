"""Physical-plan linter: the "would this survive a 100× scale-up?"
review as executable code.

Every rule detects a plan shape that is fine on a laptop and fatal at
100 TB; `lint_plan` returns findings (rule, evidence) and
`assert_scalable` turns them into a CI gate. tests/test_plans.py pins
dozens of these properties one query at a time — this operator is the
generic form, usable on ANY DataFrame before it ships::

    findings = lint_plan(df)
    assert_scalable(df, allow={"single-partition"})   # documented bound

Rules (all string-level over the executed plan — no private APIs beyond
the stable plan text):

- ``cartesian-product``  — CartesianProduct: |A|×|B| rows; at scale this
  is the job that never finishes.
- ``nested-loop-join``   — BroadcastNestedLoopJoin: per-row scan of the
  broadcast side (non-equi or missing join keys); degenerates to
  cartesian cost when the broadcast side is not tiny.
- ``python-row-udf``     — BatchEvalPython: row-at-a-time Python UDF in
  the plan (pickle per row, no vectorization). ArrowEvalPython (pandas
  UDFs) is the sanctioned slow path and is NOT flagged.
- ``single-partition``   — Exchange SinglePartition: the whole relation
  funneled through ONE task (global window without partitionBy,
  repartition(1)); unbounded input ⇒ one executor owns 100 TB.
- ``global-sort``        — rangepartitioning Exchange (orderBy without
  limit): a full shuffle + sort of the entire relation. A bounded
  top-k compiles to TakeOrderedAndProject and is not flagged.
- ``fact-scaled-broadcast`` — an EXPLICIT ``F.broadcast(...)`` hint
  (found as ResolvedHint in the analyzed logical plan, so it cannot be
  confused with an AQE/planner-chosen broadcast) whose build side scans
  a table that scales with SF and is not bounded by construction (a
  scalar aggregate, a limit, or a literal LocalRelation on the output
  spine). A forced broadcast of a fact-scaled relation OOMs at the
  design point instead of degrading to a shuffle; AQE already picks
  broadcast when the side actually fits, so the hint buys nothing.
  nation/region (25/5 rows at EVERY TPC-H SF) are constant-cardinality
  and exempt.
- ``band-join``          — a shuffled join (SortMergeJoin /
  ShuffledHashJoin) whose condition carries an inequality residual
  (``a < b``-style) next to the equi-keys. The residual is evaluated
  per MATCHED PAIR during the merge, so a hot equi-key enumerates
  |key-group|² pairs regardless of how few survive the band — the
  shape that melted q207 before the neighbor-offset rewrite. Fix by
  folding the band into the equi-key (offset explode) or bucketing
  the range dimension. Broadcast joins with residuals are not flagged
  (the build side bounds the pair count).
- ``bounded-key-window`` — a window whose partition key consists ONLY
  of bounded-domain columns (source / event_type / lang / ...: a
  handful of values at EVERY scale factor) over an input that is not
  bounded by construction. The plan renders as a healthy partitioned
  window, but each partition holds ~input/|domain| rows sorted in ONE
  task — a global sort divided by five (the q217/q222 shape). Fix by
  moving the window onto the DISTINCT-VALUE relation (group by
  (bounded key, score), cumulative counts over the value domain, tie
  blocks ranked per (key, score) partition — the q175 trick); windows
  whose input IS bounded (a grouped aggregate whose every grouping key
  is a bounded domain or a calendar bucket, a limit, a scalar agg)
  are exempt, and deliberately bounded inputs the rule cannot prove
  (value-domain relations) carry reasoned allowances.

A finding is a FACT about the plan, not always a bug: a vocabulary-sized
relation may sort globally by design. The ``allow`` set documents
exactly which facts a call site accepts — the same contract the
docstrings of bounded queries state in prose.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

RULES = (
    "cartesian-product",
    "nested-loop-join",
    "python-row-udf",
    "single-partition",
    "global-sort",
    "fact-scaled-broadcast",
    "band-join",
    "bounded-key-window",
)

#: Tables whose cardinality is CONSTANT across TPC-H scale factors
#: (nation = 25 rows, region = 5 rows at sf0.001 and at 100 TB alike).
#: Broadcasting these is always safe; everything else grows with SF.
CONSTANT_TABLES = frozenset({"nation", "region"})

#: Columns whose VALUE DOMAIN is a handful of categories at every scale
#: factor (the same vocabulary the fact-scaled-broadcast allowances
#: name). A window partitioned ONLY by these concentrates
#: ~input/|domain| rows in single sort tasks when the input scales with
#: the corpus — the shape `bounded-key-window` exists to catch.
BOUNDED_DOMAIN_COLUMNS = frozenset(
    {
        "source", "event_type", "lang", "label", "shard", "split",
        "key_col", "type_a", "type_b",
        "o_orderstatus", "c_mktsegment", "l_returnflag", "l_linestatus",
        "l_shipmode", "o_orderpriority", "l_shipinstruct",
        "n_name", "r_name", "n_nationkey", "r_regionkey",
        "c_nationkey", "s_nationkey", "nationkey", "region",
    }
)

#: Calendar-bucket columns: their domain grows with TIME, not with SF —
#: a grouped aggregate keyed on (bounded domain × calendar bucket) is a
#: bounded relation (|types| × |days|), safe as a window input.
TIME_BUCKET_COLUMNS = frozenset(
    {"day", "week", "month", "year", "hour", "date", "dt", "event_date"}
)

#: Columns bounded by a literal modulus/bucketing parameter (a histogram
#: bin, a decile id): a grouped aggregate keyed on these has output
#: cardinality fixed by the literal, not the corpus. Used only to prove
#: a window INPUT bounded — never as a trigger key.
MODULUS_BOUNDED_COLUMNS = frozenset({"bin", "decile"})

#: Unary logical nodes that don't grow their child's row count — walking
#: through them from a broadcast hint finds the node that actually
#: determines the build side's cardinality.
_ROW_BOUND_PRESERVING = frozenset(
    {
        "Project",
        "Filter",
        "SubqueryAlias",
        "Sort",
        "Deduplicate",
        "DeduplicateWithinWatermark",
        "Window",
        "Distinct",
        "Repartition",
        "RepartitionByExpression",
        "ResolvedHint",
        "UnresolvedHint",
        "WithColumns",
        "Limit",
    }
)


def _plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _jchildren(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _jwalk(node):
    yield node
    for c in _jchildren(node):
        yield from _jwalk(c)


def _scan_tables(subtree) -> set[str]:
    """Basenames (sans .parquet/.orc) of every file relation the logical
    subtree scans. V1 LogicalRelation and V2 DataSourceV2Relation both
    expose root paths; anything unrecognized is reported as '?' so the
    rule fails loud rather than silently exempting an unknown source."""
    tables: set[str] = set()
    for n in _jwalk(subtree):
        name = n.nodeName()
        if name == "LogicalRelation":
            try:
                paths = n.relation().location().rootPaths()
                for i in range(paths.length()):
                    base = str(paths.apply(i)).rstrip("/").rsplit("/", 1)[-1]
                    tables.add(re.sub(r"\.(parquet|orc|json|csv)$", "", base))
            except Exception:
                tables.add("?")
        elif name in ("DataSourceV2Relation", "StreamingRelation", "StreamingRelationV2"):
            tables.add("?")
    return tables


def _spine_bounded(node) -> bool:
    """True when the subtree's OUTPUT row count is bounded by construction:
    following single-child row-preserving nodes from the root reaches a
    scalar aggregate (no grouping keys), an explicit limit, or a literal
    LocalRelation."""
    while True:
        name = node.nodeName()
        if name in ("GlobalLimit", "LocalLimit", "LocalRelation", "OneRowRelation", "Range"):
            return True
        if name == "Aggregate":
            return node.groupingExpressions().isEmpty()
        kids = _jchildren(node)
        if name in _ROW_BOUND_PRESERVING and len(kids) == 1:
            node = kids[0]
            continue
        return False


def broadcast_hint_findings(df: DataFrame) -> list[dict]:
    """Findings for explicit broadcast hints over fact-scaled relations.

    Walks the ANALYZED logical plan (ResolvedHint survives analysis and
    is eliminated in optimization, so what we see here is exactly what
    the user forced — planner/AQE-chosen broadcasts never appear)."""
    findings: list[dict] = []
    analyzed = df._jdf.queryExecution().analyzed()
    for node in _jwalk(analyzed):
        if node.nodeName() != "ResolvedHint":
            continue
        head = node.toString().splitlines()[0]
        if "broadcast" not in head.lower():
            continue
        child = _jchildren(node)[0]
        if _spine_bounded(child):
            continue
        tables = _scan_tables(child)
        if not tables:  # literal-derived relation, nothing fact-scaled
            continue
        if tables <= CONSTANT_TABLES:
            continue
        findings.append(
            {
                "rule": "fact-scaled-broadcast",
                "evidence": f"explicit broadcast hint over unbounded scan of "
                f"{sorted(tables)}"[:200],
            }
        )
    return findings


_ATTR_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*)#\d+")
_ALIAS_RE = re.compile(r" AS ([A-Za-z_][A-Za-z0-9_]*)#\d+$")


def _attr_name(expr) -> str | None:
    """The column name when ``expr`` renders as a plain attribute
    reference (``name#id``); None for computed expressions
    (conservatively treated as not-bounded)."""
    m = _ATTR_RE.match(expr.toString())
    return m.group(1) if m else None


def _grouping_key_name(expr, agg_node) -> str | None:
    """A grouping key's EXPOSED name: the attribute name for a plain
    reference; for a computed key (``groupBy(to_date("ts").alias("day"))``
    — the Aggregate strips the alias from groupingExpressions), the alias
    the matching RESULT expression gives it (``to_date(ts) AS day#N`` →
    ``day``, the name whose domain the relation is keyed on). None for
    anonymous computed keys."""
    s = expr.toString()
    m = _ATTR_RE.match(s)
    if m:
        return m.group(1)
    res = agg_node.aggregateExpressions()
    for i in range(res.size()):
        rs = res.apply(i).toString().splitlines()[0]
        if rs.startswith(s + " AS "):
            m = _ALIAS_RE.search(rs)
            if m:
                return m.group(1)
    return None


#: Grouping-key names that bound an aggregate's output cardinality
#: independent of corpus size (see each set's comment).
_BOUNDED_GROUPING = BOUNDED_DOMAIN_COLUMNS | TIME_BUCKET_COLUMNS | MODULUS_BOUNDED_COLUMNS


def _window_input_bounded(node) -> bool:
    """True when a Window's input is bounded by construction: a
    limit/scalar-agg/literal spine, OR a grouped aggregate whose every
    grouping key is a bounded-domain / calendar-bucket / literal-modulus
    column (output cardinality = product of bounded domains, independent
    of SF)."""
    while True:
        name = node.nodeName()
        if name in ("GlobalLimit", "LocalLimit", "LocalRelation", "OneRowRelation", "Range"):
            return True
        if name == "Aggregate":
            exprs = node.groupingExpressions()
            if exprs.isEmpty():
                return True
            keys = [_grouping_key_name(exprs.apply(i), node) for i in range(exprs.size())]
            return all(k is not None and k.lower() in _BOUNDED_GROUPING for k in keys)
        kids = _jchildren(node)
        if name in _ROW_BOUND_PRESERVING and len(kids) == 1:
            node = kids[0]
            continue
        return False


def bounded_key_window_findings(df: DataFrame) -> list[dict]:
    """Findings for windows partitioned ONLY by bounded-domain columns
    over an unbounded input (the q217/q222 shape: a global sort divided
    by |domain|). Walks the ANALYZED logical plan, where Window nodes
    expose their partition spec directly; windows with an empty spec are
    the ``single-partition`` rule's territory and skipped here."""
    findings: list[dict] = []
    analyzed = df._jdf.queryExecution().analyzed()
    for node in _jwalk(analyzed):
        if node.nodeName() != "Window":
            continue
        spec = node.partitionSpec()
        if spec.isEmpty():
            continue
        names = [_attr_name(spec.apply(i)) for i in range(spec.size())]
        if not all(n is not None and n.lower() in BOUNDED_DOMAIN_COLUMNS for n in names):
            continue
        if _window_input_bounded(_jchildren(node)[0]):
            continue
        findings.append(
            {
                "rule": "bounded-key-window",
                "evidence": (
                    f"window partitioned only by bounded-domain key(s) "
                    f"{sorted(set(names))} over an unbounded input — each "
                    f"partition sorts ~input/|domain| rows in one task"
                )[:200],
            }
        )
        break  # one finding per plan is enough for the gate
    return findings


_SHUFFLED_JOIN_RE = re.compile(r"\b(SortMergeJoin|ShuffledHashJoin)\b(.*)")
# Comparisons in Catalyst's plan rendering are space-delimited:
# "(rb#10 > ra#6)", "(ts#3 <= (start#7 + 100))".
_INEQ_TOKENS = (" < ", " <= ", " > ", " >= ")


def _band_join_findings(plan: str) -> list[dict]:
    findings = []
    for ln in plan.splitlines():
        m = _SHUFFLED_JOIN_RE.search(ln)
        if m and any(tok in m.group(2) for tok in _INEQ_TOKENS):
            findings.append({"rule": "band-join", "evidence": ln.strip()[:200]})
            break  # one finding per plan is enough for the gate
    return findings


def lint_plan(df: DataFrame) -> list[dict]:
    """Lint ``df``'s physical plan; returns [{'rule', 'evidence'}, ...]
    ordered by severity (cartesian first). Plan-only: nothing executes."""
    plan = _plan_text(df)
    findings: list[dict] = []

    def _hit(rule: str, needle: str) -> None:
        if needle in plan:
            line = next(
                (ln.strip() for ln in plan.splitlines() if needle in ln), needle
            )
            findings.append({"rule": rule, "evidence": line[:200]})

    _hit("cartesian-product", "CartesianProduct")
    _hit("nested-loop-join", "BroadcastNestedLoopJoin")
    _hit("python-row-udf", "BatchEvalPython")
    # A SinglePartition exchange is only a hazard when UNBOUNDED data
    # funnels through it. Two bounded-by-construction shapes are exempt:
    # (1) its direct child is a partial aggregate with no grouping keys
    #     (global scalar aggregate: one row per upstream task reaches the
    #     merge), and
    # (2) a TakeOrderedAndProject / GlobalLimit sits below it in the tree
    #     (ranking an already-limited top-k result).
    lines = plan.splitlines()
    flagged = False
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln or flagged:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        if ("Aggregate(keys=[]" in child) or ("Aggregate(key=[]" in child):
            continue
        below = "\n".join(lines[i + 1 :])
        if "TakeOrderedAndProject" in below or "GlobalLimit" in below:
            continue
        findings.append({"rule": "single-partition", "evidence": ln.strip()[:200]})
        flagged = True
    if "rangepartitioning" in plan and "TakeOrderedAndProject" not in plan:
        _hit("global-sort", "rangepartitioning")
    findings.extend(_band_join_findings(plan))
    findings.extend(broadcast_hint_findings(df))
    findings.extend(bounded_key_window_findings(df))
    return findings


def assert_scalable(df: DataFrame, allow: set[str] = frozenset()) -> list[dict]:
    """Raise AssertionError if the plan has findings outside ``allow``;
    returns the (allowed) findings so callers can log them."""
    findings = lint_plan(df)
    bad = [f for f in findings if f["rule"] not in allow]
    if bad:
        lines = "\n".join(f"  [{f['rule']}] {f['evidence']}" for f in bad)
        raise AssertionError(
            f"plan has {len(bad)} scale-hostile shape(s) not in allow={sorted(allow)}:\n{lines}"
        )
    return findings
