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


def assert_no_cartesian(df: DataFrame) -> None:
    """No CartesianProduct / BroadcastNestedLoopJoin — except the 1-row
    scalar-append BNLJ (a broadcast side that is a single aggregate row
    is the sanctioned constant-append pattern, not an O(n·m) join).

    The exemption is deliberately narrow: a BNLJ is allowed only when
    the plan also shows a single-row aggregate feeding a broadcast
    exchange. When in doubt it raises.
    """
    plan = plan_text(df)
    if "CartesianProduct" in plan:
        raise PlanLintError("plan contains CartesianProduct", plan)
    n_bnlj = len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M))
    if n_bnlj:
        # every BNLJ must be a scalar append: its broadcast build side is
        # a global (group-less) HashAggregate — grep for the aggregate's
        # detail header with an empty Keys list
        n_scalar_aggs = len(re.findall(r"^Keys: \[\]$", plan, re.M))
        if n_scalar_aggs == 0:
            raise PlanLintError(
                f"plan contains {n_bnlj} BroadcastNestedLoopJoin node(s) "
                "with no scalar-aggregate build side", plan)


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
