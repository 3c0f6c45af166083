"""Physical-plan lint — make the scale contract checkable, not aspirational.

A query that returns the right rows through a CartesianProduct, a lost
filter pushdown, or a row-at-a-time Python UDF is a 100-TB incident that
unit tests cannot see. These helpers read ``explain("formatted")`` output
and assert the plan property directly, so a pipeline can gate its own
deploys the way this repo's ``tests/test_plan_shapes.py`` gates commits:

    from glue_hudi_spark.plans import lint
    lint.assert_no_cartesian(df)
    lint.assert_pushed_filter(df, "LessThanOrEqual(l_shipdate")
    lint.assert_max_read_columns(df, 7)

All helpers raise ``PlanLintError`` with the offending plan attached.
They inspect the STATIC plan (pre-AQE): a property asserted here holds
for any runtime re-plan AQE chooses, since AQE only replaces exchanges
and join strategies it can prove equivalent-or-better.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


class PlanLintError(AssertionError):
    """A physical-plan property does not hold; ``.plan`` carries the text."""

    def __init__(self, message: str, plan: str):
        super().__init__(f"{message}\n--- plan ---\n{plan}")
        self.plan = plan


def plan_text(df: DataFrame) -> str:
    """The formatted physical plan (tree + per-operator detail section)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def operators(df: DataFrame) -> list[str]:
    """Operator names, one per physical node, in detail-section order.

    The formatted explain lists every node twice (tree + ``(n) Name``
    detail header); this parses the headers so each node counts once.
    """
    return re.findall(r"^\(\d+\) (\w+)", plan_text(df), re.M)


def count_ops(df: DataFrame, name: str) -> int:
    """How many physical nodes named ``name`` (exact match) the plan has."""
    return sum(1 for op in operators(df) if op == name)


def count_shuffles(df: DataFrame) -> int:
    """Exchange nodes in the plan — each is a full shuffle of its input."""
    return count_ops(df, "Exchange")


def _tree_nodes(plan: str) -> list[tuple[int, str, str, int]]:
    """Parse the formatted plan's tree section into
    ``(depth, name, extras, node_id)`` tuples, in tree order.

    Tree lines look like ``   +- * HashAggregate (9)`` — depth is encoded
    in 3-character prefix columns (``   `` / ``:  `` / ``+- `` / ``:- ``),
    the trailing ``(n)`` is the node id that keys the detail section.
    """
    nodes = []
    for line in plan.splitlines():
        m = re.match(
            r"^([ :|]*)([+:]- )?(?:\* )?([A-Za-z]\w*)(.*)\((\d+)\)\s*$", line)
        if not m:
            continue
        indent, marker, name, extras, node_id = m.groups()
        depth = 0 if marker is None else len(indent) // 3 + 1
        nodes.append((depth, name, extras, int(node_id)))
    return nodes


def _detail_blocks(plan: str) -> dict[int, str]:
    """Map node id -> its detail-section text (``(n) Name`` blocks)."""
    blocks: dict[int, str] = {}
    current = None
    for line in plan.splitlines():
        m = re.match(r"^\((\d+)\) [A-Za-z]\w*", line)
        if m:
            current = int(m.group(1))
            blocks[current] = ""
        elif current is not None:
            blocks[current] += line + "\n"
    return blocks


def _subtree(nodes, i):
    """Nodes of the subtree rooted at index ``i`` (inclusive)."""
    depth = nodes[i][0]
    out = [nodes[i]]
    for n in nodes[i + 1:]:
        if n[0] <= depth:
            break
        out.append(n)
    return out


def _children(nodes, i):
    """Indices of the direct children of the node at index ``i``."""
    depth = nodes[i][0]
    kids = []
    for j in range(i + 1, len(nodes)):
        if nodes[j][0] <= depth:
            break
        if nodes[j][0] == depth + 1:
            kids.append(j)
    return kids


def assert_no_cartesian(df: DataFrame) -> None:
    """No CartesianProduct / BroadcastNestedLoopJoin — except the 1-row
    scalar-append BNLJ (a broadcast side that is a single aggregate row
    is the sanctioned constant-append pattern, not an O(n·m) join).

    The exemption is checked ON THE BUILD SIDE of each BNLJ, not
    anywhere in the plan: the tree section is parsed, the BNLJ's
    BuildLeft/BuildRight subtree located, and a provably-one-row node
    required inside it — a group-less (``Keys: []``) HashAggregate, a
    ``Scan OneRowRelation`` (SQL literal relation), or a single-element
    ``Range``. A ``ReusedExchange`` resolves to its referenced operator
    id and that subtree is checked; unresolvable reuse counts as
    not-scalar (so a build side made only of it raises). A global
    aggregate elsewhere in the plan (very common) does NOT whitelist an
    O(n·m) join. When in doubt it raises.
    """
    plan = plan_text(df)
    if "CartesianProduct" in plan:
        raise PlanLintError("plan contains CartesianProduct", plan)
    if "BroadcastNestedLoopJoin" not in plan:
        return
    nodes = _tree_nodes(plan)
    details = _detail_blocks(plan)
    id_idx = {node_id: i for i, (_, _, _, node_id) in enumerate(nodes)}
    # detail headers: "(12) ReusedExchange [Reuses operator id: 9]"
    reuse_of = {
        int(a): int(b)
        for a, b in re.findall(
            r"^\((\d+)\) ReusedExchange \[Reuses operator id: (\d+)\]",
            plan, re.M)
    }

    def _range_rows(detail: str) -> int | None:
        m = re.search(r"Range \((-?\d+), (-?\d+), step=(-?\d+)", detail)
        if not m:
            return None
        s, e, st = map(int, m.groups())
        if st > 0:
            return max(0, -((s - e) // st))
        if st < 0:
            return max(0, -((e - s) // -st))
        return None

    def _is_scalar_subtree(sub, hops: int = 0) -> bool:
        for _, name, extras, node_id in sub:
            detail = details.get(node_id, "")
            if name == "HashAggregate" and re.search(
                    r"^Keys: \[\]$", detail, re.M):
                return True
            if name == "Scan" and "OneRowRelation" in extras:
                return True
            if name == "Range" and _range_rows(detail) == 1:
                return True
            if name == "ReusedExchange":
                ref = reuse_of.get(node_id)
                if ref is None or ref not in id_idx or hops >= 8:
                    continue  # unresolvable reuse proves nothing
                if _is_scalar_subtree(_subtree(nodes, id_idx[ref]),
                                      hops + 1):
                    return True
        return False

    for i, (_, name, extras, node_id) in enumerate(nodes):
        if name != "BroadcastNestedLoopJoin":
            continue
        kids = _children(nodes, i)
        if len(kids) != 2:
            raise PlanLintError(
                f"BroadcastNestedLoopJoin ({node_id}): could not resolve "
                "both join children from the plan tree", plan)
        if "BuildLeft" in extras:
            build_sides = [kids[0]]
        elif "BuildRight" in extras:
            build_sides = [kids[1]]
        else:  # build side not printed — require SOME side to be scalar
            build_sides = kids
        if not any(_is_scalar_subtree(_subtree(nodes, k))
                   for k in build_sides):
            raise PlanLintError(
                f"BroadcastNestedLoopJoin ({node_id}) build side is not a "
                "single-row aggregate — O(n·m) join", plan)


def assert_no_python_eval(df: DataFrame) -> None:
    """No row-at-a-time Python UDF execution (``BatchEvalPython``).
    Arrow-batched nodes (``ArrowEvalPython``, ``MapInPandas``,
    ``FlatMapGroupsInPandas``) pass — they are the sanctioned Python
    path."""
    plan = plan_text(df)
    if "BatchEvalPython" in plan:
        raise PlanLintError("plan executes a row-at-a-time Python UDF", plan)


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """``fragment`` appears in a scan's PushedFilters list — the filter
    reached the data source instead of running post-scan."""
    plan = plan_text(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    if not any(fragment in p for p in pushed):
        raise PlanLintError(
            f"filter fragment {fragment!r} not pushed to any scan "
            f"(pushed: {pushed})", plan)


def assert_max_read_columns(df: DataFrame, n: int) -> None:
    """Every parquet scan reads at most ``n`` columns — column pruning
    held. A scan reading the full schema for a narrow projection is the
    canonical silent 100-TB regression."""
    plan = plan_text(df)
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        width = m.group(1).count(":")
        if width > n:
            raise PlanLintError(
                f"a scan reads {width} columns (limit {n})", plan)


def assert_broadcast_joins_only(df: DataFrame) -> None:
    """Every equi-join in the plan is a BroadcastHashJoin — no sort-merge
    exchange sneaked in (use where every join side is known dim-sized)."""
    plan = plan_text(df)
    for bad in ("SortMergeJoin", "ShuffledHashJoin"):
        if bad in plan:
            raise PlanLintError(f"plan contains {bad}; expected broadcast-only joins", plan)


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    """At most ``n`` Exchange nodes — the shuffle budget a pipeline
    author signed up for."""
    got = count_shuffles(df)
    if got > n:
        raise PlanLintError(f"plan has {got} shuffles (budget {n})",
                            plan_text(df))
