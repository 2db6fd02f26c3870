"""Plan linter: the 100 TB anti-pattern checks as code.

PLANS.md documents that the headline plans have the right physical
shape; this module makes the rules ENFORCEABLE — tests lint every
headline query, so a regression that sneaks a cartesian product, a
data-bearing single-partition exchange, or row-at-a-time Python into
a plan fails CI instead of surfacing as a 100x slowdown on a real
cluster.

Checks (all from the executed plan's text — the same artifact
``explain`` shows a human):

- ``cartesian-product``: a CartesianProduct operator anywhere.  At
  scale this is |L| x |R| work; an intentional tiny-side cross join
  should be a broadcast nested loop (use ``F.broadcast``).
- ``single-partition-scan``: an ``Exchange SinglePartition`` whose
  subtree contains a file scan AND whose direct child is not a
  partial aggregate — unbounded data funneled through ONE task (the
  classic global-window-without-partitionBy mistake).  Two benign
  shapes are excluded: scalar aggregates (partial agg feeds ONE row
  per partition to the exchange) and already-reduced frames (a top-k
  rank stamp after ``orderBy().limit()`` never plans this exchange —
  Spark rewrites it to TakeOrderedAndProject).
- ``row-python``: BatchEvalPython — a row-at-a-time Python UDF in
  the plan.  Arrow paths (ArrowEvalPython / mapInPandas) are allowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _node_depth(line: str) -> int:
    """Depth of a plan-tree line = column of its node marker."""
    for marker in ("+- ", ":- "):
        i = line.find(marker)
        if i >= 0:
            return i
    return 0  # root


def _subtree_contains(lines: list[str], start: int, needle: str) -> bool:
    """True if ``needle`` appears in the subtree rooted at lines[start]
    (following lines strictly deeper than the root line)."""
    root_depth = _node_depth(lines[start])
    for line in lines[start + 1 :]:
        if line.strip() and _node_depth(line) <= root_depth:
            break
        if needle in line:
            return True
    return False


def _direct_child(lines: list[str], start: int) -> str:
    """The first line strictly deeper than lines[start] — its direct
    child in the plan tree ('' at a leaf)."""
    root_depth = _node_depth(lines[start])
    for line in lines[start + 1 :]:
        if not line.strip():
            continue
        return line if _node_depth(line) > root_depth else ""
    return ""


def lint_plan_text(plan: str) -> list[str]:
    findings = []
    lines = plan.splitlines()
    if "CartesianProduct" in plan:
        findings.append(
            "cartesian-product: CartesianProduct in plan — |L|x|R| work at "
            "scale; broadcast the small side instead"
        )
    for i, line in enumerate(lines):
        if (
            "Exchange SinglePartition" in line
            and _subtree_contains(lines, i, "Scan ")
            # a partial aggregate child hands the exchange ONE row per
            # upstream partition — the correct scalar-aggregate shape
            and "Aggregate" not in _direct_child(lines, i)
        ):
            findings.append(
                "single-partition-scan: Exchange SinglePartition fed by a file "
                "scan — unbounded data through one task (global window/sort "
                "without partitionBy?)"
            )
            break
    if "BatchEvalPython" in plan:
        findings.append(
            "row-python: BatchEvalPython in plan — row-at-a-time Python UDF; "
            "use built-in expressions or an Arrow (pandas) UDF"
        )
    return findings


def lint_plan(df: DataFrame) -> list[str]:
    """Lint a DataFrame's EXECUTED plan (post-AQE where applicable).
    Returns a list of findings; empty means the plan passes every
    check."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return lint_plan_text(plan)
