"""Basic data-quality checks as ONE aggregate pass (SURVEY §2.9 Q1-Q3).

The reference executes one Spark job per check per column
(``silver/jobs/quality_checks.py:16-63`` — a ``filter().count()`` each;
~7+ jobs per table). Here every check compiles to a conditional-count
expression and ALL of them run in a single ``df.agg(...)`` — one scan
of the table regardless of check count. At 100 TB that's the difference
between one pass and N passes over the data.

Each check yields (metric_name, Column expression, pass predicate).
Missing columns are skipped with a note, matching the reference's
permissive schema-evolution behavior (``quality_checks.py:49-51``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """Base: subclasses define `exprs(df)` → {metric: Column} and
    `passed(metrics)` → bool."""

    column: str

    def exprs(self) -> dict[str, Column]:  # pragma: no cover - abstract
        raise NotImplementedError

    def passed(self, metrics: dict[str, Any]) -> bool:  # pragma: no cover
        raise NotImplementedError


@dataclass(frozen=True)
class NullCheck(Check):
    """Q1 — fail if any NULLs in column (quality_checks.py:16-32)."""

    def exprs(self) -> dict[str, Column]:
        name = f"null_count_{self.column}"
        return {name: F.count(F.when(F.col(self.column).isNull(), 1))}

    def passed(self, metrics: dict[str, Any]) -> bool:
        return metrics[f"null_count_{self.column}"] == 0


@dataclass(frozen=True)
class RangeCheck(Check):
    """Q2 — fail if any value < min or > max (quality_checks.py:35-63)."""

    min_value: float | None = None
    max_value: float | None = None

    def exprs(self) -> dict[str, Column]:
        c = F.col(self.column)
        cond = F.lit(False)
        if self.min_value is not None:
            cond = cond | (c < self.min_value)
        if self.max_value is not None:
            cond = cond | (c > self.max_value)
        return {f"out_of_range_{self.column}": F.count(F.when(cond, 1))}

    def passed(self, metrics: dict[str, Any]) -> bool:
        return metrics[f"out_of_range_{self.column}"] == 0


@dataclass(frozen=True)
class PositiveCheck(Check):
    """Q3 — fail on values <= 0 (ingest_to_iceberg.py:583-597)."""

    def exprs(self) -> dict[str, Column]:
        return {
            f"non_positive_{self.column}": F.count(
                F.when(F.col(self.column) <= 0, 1)
            )
        }

    def passed(self, metrics: dict[str, Any]) -> bool:
        return metrics[f"non_positive_{self.column}"] == 0


@dataclass(frozen=True)
class SetCheck(Check):
    """P8 as a check — fail on values outside the allowed set
    (great_expectations.py:308; allowed payment types
    lakehouse_config.yaml:445)."""

    allowed: tuple = ()

    def exprs(self) -> dict[str, Column]:
        c = F.col(self.column)
        return {
            f"outside_set_{self.column}": F.count(
                F.when(~c.isin(list(self.allowed)) & c.isNotNull(), 1)
            )
        }

    def passed(self, metrics: dict[str, Any]) -> bool:
        return metrics[f"outside_set_{self.column}"] == 0


def build_check_exprs(df: DataFrame, checks: list[Check]) -> tuple[list[Column], list[Check]]:
    """Compile checks into aggregate expressions; skip checks on missing
    columns (permissive schema evolution)."""
    cols = set(df.columns)
    exprs: list[Column] = [F.count(F.lit(1)).alias("row_count")]
    applied: list[Check] = []
    for chk in checks:
        if chk.column not in cols:
            continue
        applied.append(chk)
        for name, expr in chk.exprs().items():
            exprs.append(expr.alias(name))
    return exprs, applied


def run_checks(df: DataFrame, checks: list[Check]) -> dict[str, Any]:
    """Run all checks in one aggregate job. Returns
    ``{metrics: {...}, results: {check_name: bool}, passed: bool}``."""
    exprs, applied = build_check_exprs(df, checks)
    row = df.agg(*exprs).first().asDict()
    results = {
        f"{type(c).__name__}:{c.column}": c.passed(row) for c in applied
    }
    return {
        "metrics": row,
        "results": results,
        "passed": all(results.values()),
        "skipped": [c.column for c in checks if c not in applied],
    }


def sequence_gap_stats(
    df: DataFrame, id_col: str, expected_step: int = 1
) -> DataFrame:
    """Continuity check — the DQ dimension the null/range/set family
    misses: is a supposedly-gapless surrogate/sequence column actually
    dense? Returns ONE row: (min_id, max_id, n_present, n_missing,
    n_gaps) where n_gaps counts maximal missing runs.

    Scale shape: deliberately NOT the sort + lag formulation (a global
    ordered window single-tasks the column). Gap STARTS are ids whose
    successor (id + step) is absent — one hash anti-join of the
    distinct-id table against its shifted self, then a single-row
    aggregate. n_missing is pure arithmetic off (min, max, count).
    Everything shuffles ids only, partial-aggregates map-side."""
    ids = df.select(F.col(id_col).alias("id")).where(
        F.col("id").isNotNull()
    ).distinct()
    bounds = ids.agg(
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
        F.count("*").alias("n_present"),
    )
    # run starts = present ids that are NOT the successor of another
    # present id; maximal runs = gaps + 1 (the first run opens no gap)
    succ = ids.select((F.col("id") + expected_step).alias("id"))
    run_starts = ids.join(succ, "id", "left_anti")
    n_runs = run_starts.agg(F.count("*").alias("n_runs"))
    return (
        bounds.crossJoin(F.broadcast(n_runs))
        .select(
            "min_id",
            "max_id",
            "n_present",
            (
                (F.col("max_id") - F.col("min_id")) / F.lit(expected_step)
                + 1
                - F.col("n_present")
            )
            .cast("long")
            .alias("n_missing"),
            (F.col("n_runs") - 1).cast("long").alias("n_gaps"),
        )
    )
