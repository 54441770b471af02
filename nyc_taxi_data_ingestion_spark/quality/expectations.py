"""Expectations suite (SURVEY §2.9 Q9) — all kinds in ONE pass.

Parity with the reference's 7 expectation kinds
(``great_expectations.py:71-129`` builder, ``:269-362`` fallback
evaluators): not_null, between, in_set, mean_between,
row_count_between, unique_count_between, match_regex — the reference
*declares* match_regex but its fallback validator never implements it;
we implement it for real (``rlike`` count).

Unlike the reference (one Spark job per expectation), the whole suite
compiles into a single ``df.agg`` — one scan at any scale.
``unique_count`` uses exact countDistinct by default; pass
``approx=True`` for the HLL sketch at very large scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_taxi_data_ingestion_spark.functions.numeric import davg


@dataclass(frozen=True)
class Expectation:
    kind: str  # not_null | between | in_set | mean_between | row_count_between | unique_count_between | match_regex
    column: str | None = None
    min_value: float | None = None
    max_value: float | None = None
    values: tuple = ()
    regex: str | None = None
    meta: dict = field(default_factory=dict)

    @property
    def name(self) -> str:
        return f"{self.kind}:{self.column or '<table>'}"


def _agg_exprs(exp: Expectation, approx: bool) -> dict[str, Column]:
    c = F.col(exp.column) if exp.column else None
    k = exp.name
    if exp.kind == "not_null":
        return {k: F.count(F.when(c.isNull(), 1))}
    if exp.kind == "between":
        cond = (c < exp.min_value) if exp.min_value is not None else F.lit(False)
        if exp.max_value is not None:
            cond = cond | (c > exp.max_value)
        return {k: F.count(F.when(cond, 1))}
    if exp.kind == "in_set":
        return {k: F.count(F.when(~c.isin(list(exp.values)) & c.isNotNull(), 1))}
    if exp.kind == "mean_between":
        return {k: davg(c)}
    if exp.kind == "row_count_between":
        return {k: F.count(F.lit(1))}
    if exp.kind == "unique_count_between":
        return {k: F.approx_count_distinct(c) if approx else F.countDistinct(c)}
    if exp.kind == "match_regex":
        return {
            k: F.count(F.when(~c.rlike(exp.regex) & c.isNotNull(), 1))
        }
    raise ValueError(f"unknown expectation kind: {exp.kind}")


def _evaluate(exp: Expectation, observed: Any) -> bool:
    if exp.kind in ("not_null", "in_set", "match_regex"):
        return observed == 0
    if exp.kind == "between":
        return observed == 0
    if exp.kind in ("mean_between", "row_count_between", "unique_count_between"):
        lo = exp.min_value if exp.min_value is not None else float("-inf")
        hi = exp.max_value if exp.max_value is not None else float("inf")
        return lo <= observed <= hi
    raise ValueError(exp.kind)


def run_expectations(
    df: DataFrame, suite: list[Expectation], approx: bool = False
) -> dict[str, Any]:
    """Evaluate the whole suite in one aggregate job.

    Returns ``{results: [{name, observed, success}], success: bool}`` —
    the shape the reference's orchestrator consumes
    (``great_expectations.py:255-267``)."""
    cols = set(df.columns)
    applicable = [e for e in suite if e.column is None or e.column in cols]
    exprs = []
    for e in applicable:
        for name, expr in _agg_exprs(e, approx).items():
            exprs.append(expr.alias(name))
    row = df.agg(*exprs).first().asDict() if exprs else {}
    results = [
        {
            "name": e.name,
            "observed": row[e.name],
            "success": _evaluate(e, row[e.name]),
        }
        for e in applicable
    ]
    return {
        "results": results,
        "success": all(r["success"] for r in results),
        "skipped": [e.name for e in suite if e not in applicable],
    }


def standard_suite(
    not_null_cols: list[str],
    positive_cols: list[str] | None = None,
    row_count_min: int = 1,
) -> list[Expectation]:
    """Analogue of the reference's standard taxi suite
    (``great_expectations.py:386-421``), parameterized by table."""
    suite = [Expectation("not_null", c) for c in not_null_cols]
    for c in positive_cols or []:
        suite.append(Expectation("between", c, min_value=0))
    suite.append(Expectation("row_count_between", None, min_value=row_count_min))
    return suite
