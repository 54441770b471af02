"""Deterministic numeric aggregation helpers.

A ``SUM(double)`` over a distributed dataset is order-dependent (IEEE
addition is not associative), so two engines — or two runs of the same
engine with different partitioning — produce last-ulp-different results.
That breaks (a) value-hash comparison against an oracle and (b)
reproducibility of pipeline outputs at scale.

The fix used throughout this engine: accumulate in exact DECIMAL (each
input double is rounded to a fixed scale once, deterministically; decimal
addition is exact and associative) and cast the final result back to
DOUBLE. The result is bit-identical regardless of partitioning, engine,
or degree of parallelism, while the per-row cast at scale 4 is lossless
for currency-like data (the reference casts its money columns to
DECIMAL(10,2)/(12,2) anyway — ``build_gold_layer.py:65-89``).

Averages divide the exact decimal sum (as double) by the count — one
deterministic double division instead of an order-dependent running mean.

Each helper has a Spark form and a SQL-string form usable verbatim in
both Spark SQL and the DuckDB oracle, so query and oracle share the
exact arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale-4 accumulation: lossless for 2-dp money data, and 38-digit
# precision leaves ~20 integer digits of headroom — enough for sums over
# ~10^18 rows of 100-unit values, i.e. far past 100 TB scale.
_ACC = "decimal(30,4)"


def dsum(col: str | Column, alias: str | None = None) -> Column:
    """Exact decimal-accumulated SUM, returned as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_ACC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: str | Column, alias: str | None = None) -> Column:
    """Deterministic AVG = exact decimal SUM (as double) / COUNT."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_ACC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dsum_sql(expr: str) -> str:
    """SQL form of :func:`dsum` — valid in Spark SQL and DuckDB."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,4))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """SQL form of :func:`davg` — valid in Spark SQL and DuckDB."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,4))) AS DOUBLE)"
        f" / COUNT(({expr}))"
    )
