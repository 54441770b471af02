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
    max_task_rows: int = 4_000_000,
    max_rounds: int = 8,
    out_prefix: str = "q",
):
    """Exact ``quantile_cont`` values (linear interpolation, the Spark
    ``percentile`` / DuckDB ``quantile_cont`` contract) at each of
    ``fracs``, as a ONE-ROW DataFrame with columns ``{prefix}0..k-1``
    — computed by DISTRIBUTED ITERATIVE RANK SELECTION instead of the
    built-in exact ``percentile`` aggregate, which buffers every value
    in one aggregation buffer (the classic exact-twin scale-killer
    this replaces).

    Algorithm (textbook distributed selection / histogram refinement):
    each needed global rank (⌊p·(n−1)⌋ and ⌈p·(n−1)⌉ per fraction)
    starts with the whole value range; each round, the active ranges
    are bucketized against quantile-sketch boundaries (boundary
    placement only steers balance, never the result), the ≤n_buckets
    per-range bucket counts are collected to the driver (bounded,
    like ``approxQuantile``'s driver step), and every rank narrows to
    the one bucket containing it with a residual local rank. A range
    resolves when it is constant (min == max) or small enough that a
    single task may sort it (≤ ``max_task_rows`` — the final
    per-range ``row_number`` window is bounded by construction, so no
    task ever holds more). 100 TB ≈ 10¹² rows narrows in
    ⌈log₆₃(10¹²/4·10⁶)⌉ = 3 rounds of filtered scans.

    Exactness: ranks are exact integers; the interpolation is Spark's
    own ``v_lo·(hi−pos) + v_hi·(pos−lo)`` (Percentile.getPercentile —
    the SYMMETRIC weighted form, which rounds differently in the last
    ulp from ``v_lo + f·(v_hi−v_lo)``; hypothesis found the
    counterexample), with the integral-position case returning v_lo
    directly — bit-identical to `percentile` by property test
    (driver-side Python doubles are the same IEEE 754 ops). Null
    values are excluded, like both built-ins. Empty input yields one
    all-NULL row.
    """
    import math

    spark = df.sparkSession
    out_cols = [f"{out_prefix}{i}" for i in range(len(fracs))]
    v = F.col(value_col)
    vals = df.select(v.cast("double").alias("v")).where(
        F.col("v").isNotNull()
    )

    n = vals.count()
    if n == 0:
        row = spark.createDataFrame(
            [tuple([None] * len(fracs))],
            ", ".join(f"{c} double" for c in out_cols),
        )
        return row

    pos = [p * (n - 1) for p in fracs]
    needed = sorted({r for p in pos for r in (math.floor(p), math.ceil(p))})

    def range_pred(lo, hi):
        # value-range of a bucket: [lo, hi) with None = open end
        p = F.lit(True)
        if lo is not None:
            p = p & (F.col("v") >= F.lit(lo))
        if hi is not None:
            p = p & (F.col("v") < F.lit(hi))
        return p

    # state per needed rank: (range_key, local_rank); ranges dedup'd
    # range_key -> (lo, hi, count_in_range)
    ranges = {(None, None): n}
    where = {r: ((None, None), r) for r in needed}
    resolved: dict[int, float] = {}

    bfr = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    for _ in range(max_rounds):
        active = sorted(
            {
                key
                for r, (key, _lr) in where.items()
                if r not in resolved and ranges[key] > max_task_rows
            },
            # open ends are None — plain tuple sort would compare
            # None with float and crash once BOTH outer ranges (e.g.
            # p=0.001 and p=0.999) stay active into the same round
            key=lambda k: (
                float("-inf") if k[0] is None else k[0],
                float("inf") if k[1] is None else k[1],
            ),
        )
        if not active:
            break
        for key in active:
            lo, hi = key
            sub = vals.where(range_pred(lo, hi))
            stats = sub.agg(
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
                F.percentile_approx("v", bfr, F.lit(100)).alias("bs"),
            ).collect()[0]
            if stats["mn"] == stats["mx"]:
                for r, (k2, _lr) in list(where.items()):
                    if k2 == key and r not in resolved:
                        resolved[r] = stats["mn"]
                continue
            bs = stats["bs"]
            bucket = F.coalesce(
                F.size(F.filter(F.lit(bs), lambda x: x <= F.col("v"))),
                F.lit(0),
            )
            counts = dict(
                sub.groupBy(bucket.alias("b"))
                .agg(F.count("*").alias("c"))
                .collect()
            )
            # bucket b's value range: [bs[b-1] or lo, bs[b] or hi)
            edges = [lo] + list(bs) + [hi]
            offset = 0
            by_bucket = {}
            for b in range(len(bs) + 1):
                c = counts.get(b, 0)
                if c:
                    by_bucket[b] = (offset, c)
                offset += c
            for r, (k2, lr) in list(where.items()):
                if k2 != key or r in resolved:
                    continue
                for b, (off, c) in by_bucket.items():
                    if off <= lr < off + c:
                        nkey = (edges[b], edges[b + 1])
                        ranges[nkey] = c
                        where[r] = (nkey, lr - off)
                        break

    # final: per remaining range, one bounded sort task picks the values
    pending: dict[tuple, list[tuple[int, int]]] = {}
    for r, (key, lr) in where.items():
        if r not in resolved:
            pending.setdefault(key, []).append((r, lr))
    from pyspark.sql import Window

    for key, items in pending.items():
        lo, hi = key
        sub = vals.where(range_pred(lo, hi))
        w = Window.partitionBy(F.lit(0)).orderBy("v")
        lrs = [lr for _r, lr in items]
        hitrows = (
            sub.withColumn("__rn", F.row_number().over(w) - 1)
            .where(F.col("__rn").isin(lrs))
            .collect()
        )
        got = {row["__rn"]: row["v"] for row in hitrows}
        for r, lr in items:
            resolved[r] = got[lr]

    out = []
    for p in pos:
        lo_r, hi_r = math.floor(p), math.ceil(p)
        vlo, vhi = resolved[lo_r], resolved[hi_r]
        if p == lo_r:
            out.append(vlo)
        else:
            out.append(vlo * (hi_r - p) + vhi * (p - lo_r))
    return spark.createDataFrame(
        [tuple(out)], ", ".join(f"{c} double" for c in out_cols)
    )
