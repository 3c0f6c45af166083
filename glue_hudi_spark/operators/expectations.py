"""Declarative data-quality expectations (dbt tests / Great Expectations /
Deequ's core checks) as a single-report operator.

A CDC landing pipeline (the reference's job) and a training-data pipeline
both need gate checks before publishing: keys present and unique, codes in
their domain, measures in range, foreign keys resolvable. The scale
discipline is WHERE the checks run:

* every row-local rule (not_null / accepted_values / range / custom
  predicate) folds into ONE aggregate pass over one scan — a rule is a
  `COUNT(CASE WHEN violated THEN 1 END)` column, so 10 rules cost the
  same scan as 1 and combine map-side;
* `unique` needs its own keyed aggregate (duplicate keys are a property
  of the group, not the row): one groupBy(keys) counting groups with
  n > 1 — partial-aggregated, shuffles only the key column;
* `foreign_key` is a LEFT ANTI join against the (broadcastable)
  dimension's key projection — violations are unmatched fact rows, and
  the dim side carries exactly one column.

The report is a tiny (rule, violations, total) table — the thing a
pipeline gates on (`violations == 0`) and a monitoring system stores per
run.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


class QualityGateError(RuntimeError):
    """A gated batch violated its expectations. Carries the (rule,
    violations, total) report rows so the operator can quarantine or fix
    the batch; the pipeline leaves the bookmark unadvanced, so the same
    files retry after the data is corrected."""

    def __init__(self, table_name: str, report: list[tuple]):
        self.table_name = table_name
        self.report = report
        bad = ", ".join(f"{r}={v}/{t}" for r, v, t in report if v)
        super().__init__(
            f"quality gate failed for {table_name}: {bad}"
        )


def parse_rules(spec: str) -> list["Expect"]:
    """Control-file rule syntax (';'-separated, each
    ``kind:col[:args]``):

    * ``not_null:col``
    * ``values:col:a|b|c``
    * ``range:col:lo:hi``  (numeric bounds)

    The subset that makes sense on a RAW CDC batch — key uniqueness is
    the dedup stage's job, and FK checks belong after the merge."""
    rules: list[Expect] = []
    for part in [p.strip() for p in spec.split(";") if p.strip()]:
        bits = part.split(":")
        kind = bits[0]
        if kind == "not_null" and len(bits) == 2:
            rules.append(not_null(f"not_null_{bits[1]}", bits[1]))
        elif kind == "values" and len(bits) == 3:
            rules.append(accepted_values(
                f"values_{bits[1]}", bits[1], bits[2].split("|")))
        elif kind == "range" and len(bits) == 4:
            rules.append(in_range(
                f"range_{bits[1]}", bits[1], float(bits[2]), float(bits[3])))
        else:
            raise ValueError(f"unparseable quality_gate rule: {part!r}")
    return rules


@dataclass
class Expect:
    """One rule. ``kind`` ∈ {not_null, accepted_values, in_range,
    predicate, unique, foreign_key}."""

    name: str
    kind: str
    cols: list[str] = field(default_factory=list)
    values: list = field(default_factory=list)
    lo: object = None
    hi: object = None
    predicate: Column | None = None
    ref: DataFrame | None = None
    ref_col: str | None = None


def not_null(name: str, col: str) -> Expect:
    return Expect(name, "not_null", cols=[col])


def accepted_values(name: str, col: str, values: list) -> Expect:
    return Expect(name, "accepted_values", cols=[col], values=list(values))


def in_range(name: str, col: str, lo, hi) -> Expect:
    return Expect(name, "in_range", cols=[col], lo=lo, hi=hi)


def predicate(name: str, cond: Column) -> Expect:
    """Violations are rows where ``cond`` is NOT satisfied (null counts
    as a violation, matching SQL three-valued logic on a gate)."""
    return Expect(name, "predicate", predicate=cond)


def unique(name: str, cols: list[str]) -> Expect:
    return Expect(name, "unique", cols=list(cols))


def foreign_key(name: str, col: str, ref: DataFrame, ref_col: str) -> Expect:
    return Expect(name, "foreign_key", cols=[col], ref=ref, ref_col=ref_col)


def _violation_flag(e: Expect) -> Column:
    if e.kind == "not_null":
        return F.col(e.cols[0]).isNull()
    if e.kind == "accepted_values":
        c = F.col(e.cols[0])
        return c.isNull() | ~c.isin(*e.values)
    if e.kind == "in_range":
        c = F.col(e.cols[0])
        return c.isNull() | (c < F.lit(e.lo)) | (c > F.lit(e.hi))
    if e.kind == "predicate":
        # ~cond is null for null cond: coalesce to True = violation
        return F.coalesce(~e.predicate, F.lit(True))
    raise ValueError(f"not a row-local rule: {e.kind}")


def check_expectations(df: DataFrame, rules: list[Expect]) -> DataFrame:
    """(rule, violations, total) report, ordered by rule name.

    ``total`` is the table's row count for row-local and foreign-key
    rules, and the number of DISTINCT key groups for ``unique`` (the
    violation unit there is a duplicated group, so the denominator is
    groups — Deequ's convention).
    """
    if not rules:
        # fail loudly: an empty rule list reaching write_audit_publish
        # would "pass" the audit without auditing anything
        raise ValueError("check_expectations: empty rules list")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("duplicate rule names")

    row_local = [r for r in rules if r.kind in
                 ("not_null", "accepted_values", "in_range", "predicate")]
    reports: list[DataFrame] = []

    if row_local:
        aggs = [F.count(F.lit(1)).alias("_total")] + [
            F.count(F.when(_violation_flag(r), F.lit(1))).alias(f"_v{i}")
            for i, r in enumerate(row_local)
        ]
        one = df.agg(*aggs)
        # unpivot the single row into (rule, violations, total)
        pairs = F.array(*[
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col(f"_v{i}").alias("violations"),
                F.col("_total").alias("total"),
            )
            for i, r in enumerate(row_local)
        ])
        reports.append(
            one.select(F.explode(pairs).alias("r")).select("r.*")
        )

    for r in rules:
        if r.kind == "unique":
            grouped = df.groupBy(*[F.col(c) for c in r.cols]).agg(
                F.count(F.lit(1)).alias("_n")
            )
            reports.append(
                grouped.agg(
                    F.lit(r.name).alias("rule"),
                    F.count(F.when(F.col("_n") > 1, F.lit(1))).alias("violations"),
                    F.count(F.lit(1)).alias("total"),
                ).select("rule", "violations", "total")
            )
        elif r.kind == "foreign_key":
            keys = r.ref.select(F.col(r.ref_col).alias("_fk")).distinct()
            orphans = df.join(
                F.broadcast(keys), df[r.cols[0]] == F.col("_fk"), "left_anti"
            )
            reports.append(
                df.agg(F.count(F.lit(1)).alias("_total"))
                .crossJoin(
                    orphans.agg(F.count(F.lit(1)).alias("_viol"))
                )
                .select(
                    F.lit(r.name).alias("rule"),
                    F.col("_viol").alias("violations"),
                    F.col("_total").alias("total"),
                )
            )

    out = reports[0]
    for extra in reports[1:]:
        out = out.unionByName(extra)
    return out.orderBy("rule")
