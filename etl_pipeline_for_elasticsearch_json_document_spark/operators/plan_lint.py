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
)

#: Tables whose cardinality is CONSTANT across TPC-H scale factors
#: (nation = 25 rows, region = 5 rows at sf0.001 and at 100 TB alike).
#: Broadcasting these is always safe; everything else grows with SF.
CONSTANT_TABLES = frozenset({"nation", "region"})

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
