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

A finding is a FACT about the plan, not always a bug: a vocabulary-sized
relation may sort globally by design. The ``allow`` set documents
exactly which facts a call site accepts — the same contract the
docstrings of bounded queries state in prose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RULES = (
    "cartesian-product",
    "nested-loop-join",
    "python-row-udf",
    "single-partition",
    "global-sort",
)


def _plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


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
