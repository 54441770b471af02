"""Cross-table reconciliation (SURVEY §2.9 Q10-Q13, §2.3 J4).

Parity with ``src/data_quality/reconciliation.py``: row-count diff,
aggregation diff, key integrity (anti-join), and column completeness —
each returning the reference's result shape (status, tolerance,
difference pct).

Engine redesign: per-table metric bundles are computed in ONE aggregate
pass per table (the reference runs one job per metric), and the
key-integrity check moves only distinct keys through the shuffle.
"""

from __future__ import annotations

import functools

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_taxi_data_ingestion_spark.functions.numeric import davg, dsum

_AGG_FUNCS = {
    "sum": dsum,
    "avg": davg,
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "count": lambda c: F.count(c),
}


def _pct_diff(a: float, b: float) -> float:
    if a == 0 and b == 0:
        return 0.0
    base = abs(a) if a != 0 else abs(b)
    return abs(a - b) / base * 100.0


def _par2(fa, fb):
    """Run two independent driver actions concurrently (guide §2.6:
    the scheduler back-fills the second job into the first's stage
    tails; each source/target pair below was measured as two fully
    sequential full-table jobs). Results identical by independence.
    Delegates to the shared inheritable-thread helper (r12 ADVICE) so
    job groups/descriptions propagate under pinned-thread mode."""
    from nyc_taxi_data_ingestion_spark.parallel import par2

    return par2(fa, fb)


def check_row_count(
    source: DataFrame,
    target: DataFrame,
    tolerance_pct: float = 0.0,
    source_filters: dict[str, Any] | None = None,
    target_filters: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Q10 — |src−tgt| count diff vs tolerance, optional equality
    filters (reconciliation.py:69-141, filter loop :97-101)."""
    for col, val in (source_filters or {}).items():
        source = source.filter(F.col(col) == val)
    for col, val in (target_filters or {}).items():
        target = target.filter(F.col(col) == val)
    sc, tc = _par2(source.count, target.count)
    diff = _pct_diff(sc, tc)
    return {
        "check": "row_count",
        "source_count": sc,
        "target_count": tc,
        "difference_pct": diff,
        "tolerance_pct": tolerance_pct,
        "passed": diff <= tolerance_pct,
    }


def check_aggregation(
    source: DataFrame,
    target: DataFrame,
    source_column: str,
    target_column: str,
    agg_function: str = "sum",
    tolerance_pct: float = 0.1,
) -> dict[str, Any]:
    """Q11 — f(src col) vs f(tgt col) within tolerance %, f ∈
    sum/avg/min/max/count (reconciliation.py:143-229, dispatch :182)."""
    fn = _AGG_FUNCS[agg_function]
    sv, tv = _par2(
        lambda: source.agg(fn(source_column).alias("v")).first()["v"],
        lambda: target.agg(fn(target_column).alias("v")).first()["v"],
    )
    diff = _pct_diff(float(sv or 0), float(tv or 0))
    return {
        "check": "aggregation",
        "agg_function": agg_function,
        "source_value": sv,
        "target_value": tv,
        "difference_pct": diff,
        "tolerance_pct": tolerance_pct,
        "passed": diff <= tolerance_pct,
    }


def check_key_integrity(
    source: DataFrame,
    target: DataFrame,
    source_keys: list[str],
    target_keys: list[str],
    sample_limit: int = 10,
) -> dict[str, Any]:
    """Q12/J4 — distinct source keys missing from target
    (reconciliation.py:231-308). Implemented as distinct → left_anti:
    only key columns shuffle, and AQE can broadcast the smaller side."""
    s = source.select(*[F.col(c) for c in source_keys]).distinct()
    t = target.select(
        *[F.col(tc).alias(sc) for sc, tc in zip(source_keys, target_keys)]
    ).distinct()
    missing = s.join(t, on=source_keys, how="left_anti")
    # one pass when the violation set is small (the healthy-table
    # case): collect limit+1 — if it fits, the count is exact from the
    # sample and the second anti-join execution is skipped entirely
    # (the sample rows' SELECTION was already limit-nondeterministic,
    # so this changes no contract; the exact count always is)
    rows = missing.limit(sample_limit + 1).collect()
    count = (
        len(rows) if len(rows) <= sample_limit else missing.count()
    )
    return {
        "check": "key_integrity",
        "missing_count": count,
        "sample": [r.asDict() for r in rows[:sample_limit]],
        "passed": count == 0,
    }


def check_column_completeness(
    source: DataFrame,
    target: DataFrame,
    column_pairs: list[tuple[str, str]],
    tolerance_pct: float = 1.0,
) -> dict[str, Any]:
    """Q13 — per-column non-null % diff between two tables
    (reconciliation.py:310-398). One aggregate pass per table for ALL
    columns (the reference loops jobs per column)."""

    def rates(df: DataFrame, cols: list[str]) -> dict[str, float]:
        exprs = [F.count(F.lit(1)).alias("__total")]
        exprs += [F.count(F.col(c)).alias(c) for c in cols]
        row = df.agg(*exprs).first().asDict()
        total = row["__total"] or 1
        return {c: row[c] / total * 100.0 for c in cols}

    src_rates, tgt_rates = _par2(
        lambda: rates(source, [p[0] for p in column_pairs]),
        lambda: rates(target, [p[1] for p in column_pairs]),
    )
    per_col = {}
    for sc, tc in column_pairs:
        diff = abs(src_rates[sc] - tgt_rates[tc])
        per_col[f"{sc}~{tc}"] = {
            "source_pct": src_rates[sc],
            "target_pct": tgt_rates[tc],
            "difference_pct": diff,
        }
    max_diff = max((v["difference_pct"] for v in per_col.values()), default=0.0)
    return {
        "check": "column_completeness",
        "columns": per_col,
        "max_difference_pct": max_diff,
        "tolerance_pct": tolerance_pct,
        "passed": max_diff <= tolerance_pct,
    }


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two snapshots of a table: one row per key
    with status ∈ {added, removed, changed, unchanged} — the changelog
    a transactional table format derives from metadata, computed here
    directly (extension of Q10-Q12: reconciliation that says WHICH rows
    moved, not just how far the totals drifted).

    One full-outer join on the key; change detection is null-safe
    column comparison (NOT a concat-string hash — numeric formatting
    differs across engines and a hash hides which column moved). At
    scale this is a single co-shuffle of both snapshots on the key —
    the minimum possible for row-level diffing; callers needing only
    counts aggregate the result, Catalyst prunes the untouched
    columns."""
    # presence tags, not key-nullness: a NULL-keyed row never matches
    # the equi-join, so o.key IS NULL would misread side presence for
    # it (r9, shared fix with snapshots.snapshot_changelog); tag names
    # dodge real columns — withColumn replaces same-named silently
    tag_o, tag_n = "__op", "__np"
    taken = set(old.columns) | set(new.columns)
    while tag_o in taken or tag_n in taken:
        tag_o += "_"
        tag_n += "_"
    o = old.withColumn(tag_o, F.lit(1)).alias("o")
    n = new.withColumn(tag_n, F.lit(1)).alias("n")
    on = [F.col(f"o.{k}") == F.col(f"n.{k}") for k in keys]
    cond = functools.reduce(lambda a, b: a & b, on)
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    status = (
        F.when(F.col(f"o.{tag_o}").isNull(), "added")
        .when(F.col(f"n.{tag_n}").isNull(), "removed")
        .when(changed, "changed")
        .otherwise("unchanged")
    )
    out_keys = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys
    ]
    return o.join(n, cond, "full_outer").select(
        *out_keys, status.alias("status")
    )
