"""One-pass table profiling — the "describe my table" primitive a
warehouse runs before writing quality rules (the reference hand-writes
per-column null/range checks; a profiler is how those thresholds get
chosen in the first place).

Everything is computed in a SINGLE aggregate over ONE scan: for k
columns the plan is one partial-agg (map-side combine) with 4·k + 1
aggregate expressions — not k jobs, not k scans. The multiple
count-distincts do plan an Expand (one input row fans to k aggregation
rows); that is the documented cost of exact per-column cardinality in
one pass — swap ``approx_count_distinct`` in at 100 TB where exactness
isn't contractual (``exact=False``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str], exact: bool = True
) -> DataFrame:
    """Per-column profile in long form: (column, n_rows, n_nulls,
    n_distinct, min_val, max_val), one output row per profiled column.
    Numeric columns only (min/max are cast to double — exact for
    decimals/integers below 2^53, which is the testdata contract).

    ``exact=False`` replaces the exact distinct counts (and their
    Expand) with HLL++ ``approx_count_distinct`` — the scale default.
    """
    nd = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            nd(F.col(c)).alias(f"__d_{c}"),
            F.min(F.col(c)).cast("double").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("double").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __nn_{c}, __d_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return one.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stacked}) AS "
        "(column, n_nulls, n_distinct, min_val, max_val)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
