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


def exact_quantiles(
    df,
    value_col: str,
    fracs: list[float],
    n_buckets: int = 64,
    out_prefix: str = "q",
):
    """Exact ``quantile_cont`` values (linear interpolation, the Spark
    ``percentile`` / DuckDB ``quantile_cont`` contract) at each of
    ``fracs``, as a ONE-ROW DataFrame with columns ``{prefix}0..k-1``
    — computed by DISTRIBUTED rank-selection instead of the built-in
    exact ``percentile`` aggregate, which buffers every value in one
    aggregation buffer (the classic exact-twin scale-killer this
    replaces).

    Plan: quantile-sketch boundaries (one ``percentile_approx`` row,
    broadcast) bucket values monotonically; per-bucket counts give
    broadcast prefix offsets (the only single-partition window is over
    ≤``n_buckets`` subtotal rows — the ks_drift pattern); each row's
    exact global rank is offset + within-bucket row_number − 1; the ≤2·k
    ranks the quantiles need are joined out and interpolated. Every
    stage is a partial-agg or a bucket-partitioned window — nothing
    corpus-sized ever sits in one task, so the EXACT computation itself
    survives 100 TB. Sketch boundary placement affects only balance,
    never the result.

    Exactness: ranks are exact integers; the interpolation is Spark's
    own ``v_lo·(hi−pos) + v_hi·(pos−lo)`` (Percentile.getPercentile —
    the SYMMETRIC weighted form, which rounds differently in the last
    ulp from ``v_lo + f·(v_hi−v_lo)``; hypothesis found the
    counterexample), with the integral-position case returning v_lo
    directly, exactly as the built-in does — bit-identical to
    `percentile` by property test. Null values are excluded, like both
    built-ins. Empty input yields one all-NULL row.
    """
    from pyspark.sql import Window

    v = F.col(value_col)
    vals = df.select(v.alias("v")).where(F.col("v").isNotNull())
    bfr = F.array(
        *[F.lit(i / n_buckets) for i in range(1, n_buckets)]
    )
    bounds = vals.agg(
        F.percentile_approx("v", bfr, F.lit(10000)).alias("__bs")
    )
    b = vals.crossJoin(F.broadcast(bounds)).select(
        "v",
        F.size(F.filter("__bs", lambda x: x <= F.col("v"))).alias("__b"),
    )
    sub = b.groupBy("__b").agg(F.count("*").alias("__c"))
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offs = sub.select(
        "__b", F.coalesce(F.sum("__c").over(wb), F.lit(0)).alias("__off")
    )
    tot = sub.agg(F.sum("__c").alias("__n"))
    wv = Window.partitionBy("__b").orderBy("v")
    ranked = (
        b.withColumn("__rn", F.row_number().over(wv))
        .join(F.broadcast(offs), "__b")
        .select("v", (F.col("__off") + F.col("__rn") - 1).alias("__rank"))
    )
    fr = (
        tot.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(float(p)).alias("p"),
                            F.lit(i).alias("i"),
                        )
                        for i, p in enumerate(fracs)
                    ]
                )
            ).alias("s"),
            "__n",
        )
        .select(
            F.col("s.i").alias("__i"),
            (F.col("s.p") * (F.col("__n") - 1).cast("double")).alias(
                "__pos"
            ),
        )
        .select(
            "__i",
            "__pos",
            F.floor("__pos").cast("long").alias("__lo"),
            F.ceil("__pos").cast("long").alias("__hi"),
        )
    )
    hit = ranked.join(
        F.broadcast(fr),
        (F.col("__rank") == F.col("__lo"))
        | (F.col("__rank") == F.col("__hi")),
    )
    per = hit.groupBy("__i", "__pos", "__lo").agg(
        F.max(F.when(F.col("__rank") == F.col("__lo"), F.col("v"))).alias(
            "__vlo"
        ),
        F.max(F.when(F.col("__rank") == F.col("__hi"), F.col("v"))).alias(
            "__vhi"
        ),
    )
    lo_d = F.col("__lo").cast("double")
    hi_d = F.ceil("__pos").cast("long").cast("double")
    q = per.select(
        "__i",
        F.when(F.col("__pos") == lo_d, F.col("__vlo"))
        .otherwise(
            F.col("__vlo") * (hi_d - F.col("__pos"))
            + F.col("__vhi") * (F.col("__pos") - lo_d)
        )
        .alias("__q"),
    )
    row = q.groupBy().pivot("__i", list(range(len(fracs)))).agg(
        F.first("__q")
    )
    return row.select(
        *[
            F.col(str(i)).alias(f"{out_prefix}{i}")
            for i in range(len(fracs))
        ]
    )
