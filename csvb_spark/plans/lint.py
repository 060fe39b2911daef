"""Corpus-wide physical-plan lint.

Every operator in this engine is designed around a plan shape —
banded self-joins stay shuffle joins, dimension joins broadcast,
Python only ever appears Arrow-batched, nothing falls back to a
cartesian product. ``tests/test_plans.py`` pins those shapes for the
flagship operators one by one; this module generalizes the idea to
the WHOLE declared-query corpus so a refactor that silently degrades
any query's plan — not just a flagship's — fails a test instead of
surfacing as a 100 TB incident.

The lint walks ``EXPLAIN``'s formatted physical plan (driver-side
only: nothing executes) and reports findings by rule:

- ``cartesian``       — ``CartesianProduct``: an unkeyed shuffle join
  that materializes |L|x|R|. Never acceptable at scale except where a
  query IS a cross join; those carry per-query exemptions at the
  test layer, with the bound written next to the exemption.
- ``nested-loop``     — ``BroadcastNestedLoopJoin`` whose build side
  is NOT provably ≤1 row. The engine's scalar-broadcast idiom
  (``crossJoin(broadcast(one_row_agg))`` — temperature mixture rates,
  BM25 idf stats, DSIR normalizers, skew totals) plans as a BNLJ
  against an ungrouped aggregate; that is the cheapest possible join
  (every executor gets one constant row) and is auto-cleared by
  walking the build subtree to its deciding node (``Keys: []``
  aggregates cap the side at exactly one row; Project/Filter/
  exchanges preserve or reduce it). Every OTHER nested-loop join —
  a theta join, a bounded probe set, a missed equi-key — must either
  carry a per-query exemption with its size bound or fail.
- ``row-python-udf``  — ``BatchEvalPython``: a row-at-a-time
  (pickled) Python UDF in the plan. The engine's rule is Arrow or
  JVM (``ArrowEvalPython`` / ``MapInPandas`` /
  ``FlatMapGroupsInPandas`` pass); the 3 registered compat shims are
  documented cold-path and must never appear in a corpus query's
  plan except the dialect gauntlets that exist to exercise them.
- ``interpreted-regex-join`` — a join CONDITION evaluating a regex
  per candidate pair. Equality on precomputed columns is the
  scalable form.

The lint is deliberately conservative: it flags structural
catastrophes only. Shuffle COUNT, scan width, and codegen-span
quality stay per-flagship assertions in test_plans.py — a universal
threshold there would either be vacuous or flag legitimate plans
(multi-stage aggregations genuinely need their exchanges).

100 TB rationale: at sf0.001 these plans are all sub-second whatever
their shape, so only a structural gate catches the operator whose
cost law changed. EXPLAIN shows the static plan before AQE runtime
re-planning, which only ever IMPROVES the lint-relevant properties
(AQE converts shuffle joins to broadcast, never to cartesian).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    rule: str
    detail: str

    def __str__(self) -> str:  # pragma: no cover - repr convenience
        return f"[{self.rule}] {self.detail}"


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The EXPLAIN string for ``df`` without executing it (same JVM
    hook test_plans.py uses; ``df.explain`` only prints).

    Classic sessions only: the ``_jvm``/``_jdf`` hooks don't exist on
    Spark Connect DataFrames, so fail with a clear message instead of
    an opaque AttributeError (round-12 ADVICE — this is product code
    behind ``csvb planlint``)."""
    if not hasattr(df, "_jdf") or getattr(
        df.sparkSession, "_jvm", None
    ) is None:
        raise RuntimeError(
            "planlint requires a classic (non-Connect) SparkSession: "
            "the EXPLAIN hook reads the JVM QueryExecution, which "
            "Spark Connect does not expose to the client"
        )
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
        mode
    )
    return df._jdf.queryExecution().explainString(jmode)  # noqa: SLF001


# One tree line of the formatted plan's header section, e.g.
# "   :     +- HashAggregate (5)" or "AdaptiveSparkPlan (23)". The
# indent prefix mixes spaces with ":"/"|" continuation rails from
# left siblings, so the prefix class must include them — a node's
# depth is the CHARACTER WIDTH of everything before its label
# (children sit exactly 3 columns right of their parent).
_TREE_LINE = re.compile(
    r"^([ :|]*?(?:[:+]-\s)?)(\*\s)?([^\s:|+].*?)\s+\((\d+)\)\s*$"
)

# Wrappers that preserve (or reduce) their child's row bound.
_ROW_PRESERVING = {
    "Project",
    "Filter",
    "BroadcastExchange",
    "Exchange",
    "AQEShuffleRead",
    "Sort",
    "Coalesce",
    "InputAdapter",
    "ColumnarToRow",
}
_AGGREGATES = {"HashAggregate", "SortAggregate", "ObjectHashAggregate"}

_JOIN_COND_REGEX = re.compile(
    r"Join condition:.*\b(RLIKE|regexp_extract|regexp_replace)\b", re.IGNORECASE
)


@dataclass
class _Node:
    nid: int
    label: str  # full text, e.g. "BroadcastNestedLoopJoin Cross BuildRight"
    children: list["_Node"]

    @property
    def name(self) -> str:
        return self.label.split()[0] if self.label else ""


def _parse_tree(plan: str) -> tuple[list[_Node], dict[int, str]]:
    """(plan-tree roots — main plan plus any subquery plans, node-id
    -> detail block) from a formatted EXPLAIN. Indentation encodes
    each tree: a child sits 3 columns right of its parent's
    connector."""
    lines = plan.splitlines()
    entries: list[tuple[int, _Node]] = []  # (indent, node)
    roots: list[_Node] = []
    in_tree = False
    for ln in lines:
        m = _TREE_LINE.match(ln) if ln.strip() else None
        if not m:
            # a tree section ended (main plan, or one subquery plan —
            # formatted mode appends "===== Subqueries =====" trees,
            # which must be linted too: a scalar subquery's INNER plan
            # can hide any shape)
            in_tree = False
            entries = []
            continue
        # the "* " whole-stage-codegen marker shifts the label but NOT
        # the tree geometry: children indent 3 columns right of the
        # parent's CONNECTOR, so depth excludes the star
        indent = len(m.group(1))
        node = _Node(int(m.group(4)), m.group(3).strip(), [])
        if not in_tree:
            # only accept a new root at column 0 — defends against a
            # detail-block line that happens to end in "(N)"
            if indent != 0:
                continue
            in_tree = True
            roots.append(node)
            entries = [(indent, node)]
            continue
        while entries and entries[-1][0] >= indent:
            entries.pop()
        if entries:
            entries[-1][1].children.append(node)
        entries.append((indent, node))
    details: dict[int, str] = {}
    for m in re.finditer(
        r"^\((\d+)\) .*?(?=\n\(\d+\) |\n\n|\Z)", plan, re.DOTALL | re.MULTILINE
    ):
        details[int(m.group(1))] = m.group(0)
    return roots, details


def _walk(node: _Node):
    yield node
    for c in node.children:
        yield from _walk(c)


_REUSE_REF = re.compile(r"Reuses operator id:\s*(\d+)")


def _build_side_bounded(
    join: _Node, details: dict[int, str], by_id: dict[int, _Node]
) -> bool:
    """True when the BNLJ's broadcast side is provably ≤1 row: walk
    row-preserving wrappers down to the deciding node and accept an
    ungrouped aggregate (``Keys: []``). A ``ReusedExchange`` is
    followed to the exchange it reuses (its detail block names the
    operator id), so the second use of a scalar-broadcast aggregate
    stays auto-cleared."""
    if "BuildRight" in join.label:
        side = join.children[1] if len(join.children) > 1 else None
    else:
        side = join.children[0] if join.children else None
    hops = 0
    while side is not None and hops < 100:  # cycle guard
        hops += 1
        if side.name in _AGGREGATES:
            return "Keys: []" in details.get(side.nid, "")
        if side.name == "ReusedExchange":
            m = _REUSE_REF.search(details.get(side.nid, ""))
            side = by_id.get(int(m.group(1))) if m else None
            continue
        if side.name in _ROW_PRESERVING and side.children:
            side = side.children[0]
            continue
        return False
    return False


def lint_plan(df: DataFrame) -> list[Finding]:
    """Lint one DataFrame's physical plan; returns [] when clean."""
    plan = physical_plan(df, "formatted")
    roots, details = _parse_tree(plan)
    by_id = {n.nid: n for r in roots for n in _walk(r)}
    findings: list[Finding] = []
    for node in (n for r in roots for n in _walk(r)):
        if node.name == "CartesianProduct":
            findings.append(Finding("cartesian", "CartesianProduct in plan"))
        elif node.name == "BroadcastNestedLoopJoin":
            if not _build_side_bounded(node, details, by_id):
                findings.append(
                    Finding(
                        "nested-loop",
                        "BroadcastNestedLoopJoin with unbounded build side",
                    )
                )
        elif node.name == "BatchEvalPython":
            findings.append(
                Finding("row-python-udf", "row-at-a-time Python UDF in plan")
            )
    if _JOIN_COND_REGEX.search(plan):
        findings.append(
            Finding("interpreted-regex-join", "regex evaluated per join pair")
        )
    # one finding per rule is enough signal
    seen: set[str] = set()
    out: list[Finding] = []
    for f in findings:
        if f.rule not in seen:
            seen.add(f.rule)
            out.append(f)
    return out
