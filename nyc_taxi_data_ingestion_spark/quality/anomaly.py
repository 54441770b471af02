"""Anomaly detection (SURVEY §2.9 Q4-Q8, §2.5 W2).

Parity with ``src/data_quality/anomaly_detection.py`` semantics, with
two engine-level redesigns:

1. The stats pass (mean/stddev/quantiles) and the outlier scan are the
   only two jobs; severity tiers are computed inside the scan, not in
   a driver loop over collected rows.
2. The time-series moving-average detector — the ONE operator the
   reference computes in pandas on the driver
   (``anomaly_detection.py:348-416``) — is a Spark window
   (``rowsBetween(-(w-1), 0)``), so it scales past driver memory.

Deterministic stddev: computed from exact decimal sums (see
functions/numeric.py) so bounds don't flap across partitionings.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _exact_stats(df: DataFrame, column: str) -> dict[str, float]:
    c = F.col(column)
    n = F.count(c)
    s = F.sum(c.cast("decimal(30,4)")).cast("double")
    sq = F.sum((c * c).cast("decimal(38,8)")).cast("double")
    row = df.agg(
        n.alias("n"),
        (s / n).alias("mean"),
        F.sqrt((sq - s * s / n) / (n - F.lit(1))).alias("stddev"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
    ).first()
    return dict(row.asDict())


def _severity(z_expr, thresholds=(3.0, 4.0, 5.0)):
    lo, mid, hi = thresholds
    return (
        F.when(z_expr >= hi, "critical")
        .when(z_expr >= mid, "high")
        .when(z_expr >= lo, "medium")
        .otherwise("low")
    )


def zscore_anomalies(
    df: DataFrame,
    column: str,
    k: float = 3.0,
    sample_limit: int = 100,
    with_sample: bool = True,
) -> dict[str, Any]:
    """Q4 — rows outside mean ± k·stddev with severity tiers
    (anomaly_detection.py:64-137). Two jobs: stats, then ONE pass over
    the filter (count via the collected sample when it fits in the
    limit, else one extra count job). ``with_sample=False`` skips the
    sample collection entirely — orchestration only needs the count."""
    stats = _exact_stats(df, column)
    mean, std = stats["mean"], stats["stddev"]
    if not std or std != std:  # zero/NaN stddev → no anomalies definable
        return {"stats": stats, "count": 0, "sample": [], "bounds": None}
    lower, upper = mean - k * std, mean + k * std
    c = F.col(column)
    z = F.abs(c - mean) / std
    outliers = df.filter((c < lower) | (c > upper)).withColumn(
        "severity", _severity(z, (k, k + 1, k + 2))
    )
    result: dict[str, Any] = {"stats": stats, "bounds": (lower, upper)}
    if not with_sample:
        result["count"] = outliers.count()
        result["sample"] = []
        return result
    sample = [r.asDict() for r in outliers.limit(sample_limit + 1).collect()]
    if len(sample) <= sample_limit:
        result["count"] = len(sample)  # sample is exhaustive — no count job
    else:
        sample = sample[:sample_limit]
        result["count"] = outliers.count()
    result["sample"] = sample
    return result


def iqr_anomalies(
    df: DataFrame,
    column: str,
    k: float = 1.5,
    relative_error: float = 0.01,
    sample_limit: int = 100,
) -> dict[str, Any]:
    """Q5 — IQR fences via approxQuantile (anomaly_detection.py:139-205).
    The GK sketch is single-pass and mergeable — the right tool at
    100 TB where exact quantiles would need a global sort."""
    q1, q3 = df.approxQuantile(column, [0.25, 0.75], relative_error)
    iqr = q3 - q1
    lower, upper = q1 - k * iqr, q3 + k * iqr
    c = F.col(column)
    outliers = df.filter((c < lower) | (c > upper))
    return {
        "q1": q1,
        "q3": q3,
        "iqr": iqr,
        "bounds": (lower, upper),
        "count": outliers.count(),
        "sample": [r.asDict() for r in outliers.limit(sample_limit).collect()],
    }


def rare_categories(
    df: DataFrame, column: str, min_frequency: float = 0.001
) -> DataFrame:
    """Q6 — categories with relative frequency below threshold
    (anomaly_detection.py:207-255). One groupBy + a window-free total
    via a scalar subquery-style cross join of the single-row count."""
    counts = df.groupBy(column).agg(F.count("*").alias("cnt"))
    total = df.agg(F.count("*").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("frequency", F.col("cnt") / F.col("total"))
        .filter(F.col("frequency") < min_frequency)
        .drop("total")
    )


def null_spike(
    df: DataFrame,
    column: str,
    historical_rate: float | None = None,
    factor: float = 2.0,
) -> dict[str, Any]:
    """Q7 — current null rate vs historical × factor
    (anomaly_detection.py:257-306). ``historical_rate=None`` falls back
    to the reference's conservative 5% estimate (:278-280); callers with
    a metrics store pass quality/store.historical_null_rate instead."""
    if historical_rate is None:
        historical_rate = 0.05
    row = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col(column).isNull(), 1)).alias("nulls"),
    ).first()
    rate = row["nulls"] / row["total"] if row["total"] else 0.0
    return {
        "null_rate": rate,
        "historical_rate": historical_rate,
        "is_spike": rate > historical_rate * factor,
    }


def moving_average_bands(
    df: DataFrame,
    time_col: str,
    value_col: str,
    window_size: int = 7,
    k: float = 2.0,
) -> DataFrame:
    """W2/Q8 — rolling mean ± k·rolling-std anomaly band as a Spark
    window (the reference drops to driver-side pandas here —
    anomaly_detection.py:348-416).

    Matches pandas ``rolling(window, min_periods=1)`` semantics: the
    frame is the last `window_size` rows inclusive; a single-row frame
    has NULL std (pandas NaN), which we treat as "not anomalous", the
    same way the reference's ``fillna(False)`` does.

    Rolling sums accumulate in exact decimal → deterministic bands.

    Scale: ``Window.orderBy`` without partitioning is a single-task
    sort — fine for pre-aggregated series (one row per day/hour), which
    is exactly the reference's use. For raw-event scale, aggregate to
    the series grain first (see q_moving_avg_band), or partition by
    series key.
    """
    w = (
        Window.orderBy(time_col)
        .rowsBetween(-(window_size - 1), 0)
    )
    v = F.col(value_col)
    n = F.count(v).over(w)
    s = F.sum(v.cast("decimal(30,4)")).over(w).cast("double")
    sq = F.sum((v * v).cast("decimal(38,8)")).over(w).cast("double")
    mean = s / n
    var = (sq - s * s / n) / (n - F.lit(1))
    std = F.when(n > 1, F.sqrt(F.greatest(var, F.lit(0.0)))).otherwise(F.lit(None))
    return (
        df.withColumn("moving_avg", mean)
        .withColumn("moving_std", std)
        .withColumn(
            "is_anomaly",
            F.when(
                F.col("moving_std").isNotNull()
                & (
                    (v > mean + k * F.col("moving_std"))
                    | (v < mean - k * F.col("moving_std"))
                ),
                True,
            ).otherwise(False),
        )
    )


def chi_square_drift(
    old: DataFrame,
    new: DataFrame,
    bucket_expr,
) -> DataFrame:
    """Distribution-drift detection between two table versions via the
    chi-square statistic over a shared bucketing (extension of the
    Q4-Q8 anomaly family to DISTRIBUTION shape — null_spike and zscore
    catch moment shifts, not reshuffled mass).

    Returns one row per bucket: observed counts on both sides, expected
    counts under the no-drift hypothesis (row-total x col-total /
    grand-total), and the bucket's chi-square contribution; the global
    statistic is the sum of ``contrib`` (dof = buckets - 1). Integer
    counts + identical rational arithmetic make the result bit-exact
    across engines — deliberately NOT PSI/KL, whose ln() is libm-
    dependent and can differ in the last ulp between JVM and C
    engines. Cost: one partial-agg pass per side, then arithmetic on
    ~|buckets| rows (the two scalar totals broadcast).
    """
    oc = (
        old.select(bucket_expr.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("old_cnt"))
    )
    nc = (
        new.select(bucket_expr.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("new_cnt"))
    )
    per = (
        oc.join(nc, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("old_cnt", F.lit(0)).alias("old_cnt"),
            F.coalesce("new_cnt", F.lit(0)).alias("new_cnt"),
        )
    )
    tot = per.agg(
        F.sum("old_cnt").alias("tot_old"), F.sum("new_cnt").alias("tot_new")
    )
    j = per.crossJoin(F.broadcast(tot))
    grand = (F.col("tot_old") + F.col("tot_new")).cast("double")
    row_tot = (F.col("old_cnt") + F.col("new_cnt")).cast("double")
    exp_old = row_tot * F.col("tot_old").cast("double") / grand
    exp_new = row_tot * F.col("tot_new").cast("double") / grand
    # squares via explicit multiply, not pow(): libm pow(x, 2.0) is not
    # guaranteed bit-equal to x*x across engines
    d_old = F.col("old_cnt").cast("double") - exp_old
    d_new = F.col("new_cnt").cast("double") - exp_new
    # an all-empty side yields exp == 0 (and d == 0): define the
    # contribution as 0 instead of 0/0, mirrored in oracle SQL
    contrib = (
        F.when(exp_old > 0, d_old * d_old / exp_old).otherwise(F.lit(0.0))
        + F.when(exp_new > 0, d_new * d_new / exp_new).otherwise(F.lit(0.0))
    )
    return j.select(
        "bucket",
        "old_cnt",
        "new_cnt",
        exp_old.alias("exp_old"),
        exp_new.alias("exp_new"),
        contrib.alias("contrib"),
    )


def ks_drift(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift statistic between two
    table versions of a numeric column: D = max over observed values of
    |ecdf_old(x) − ecdf_new(x)|. Complements ``chi_square_drift``:
    bucket-free, so it sees shifts chi-square's bucketing washes out,
    and it is the standard continuous-distribution drift test.

    Exactness contract: counts are exact integers, each ecdf is ONE
    IEEE division (cum/n), the difference and abs are exact IEEE ops,
    and max() is order-independent — bit-identical in any engine, no
    p-value approximation (threshold the D statistic directly; the
    α=0.05 critical value is c(α)·√((n+m)/nm), c=1.358, computable by
    the caller).

    Scale shape: one partial-agg per side on the value, a full-outer
    merge of per-value counts, then a DISTRIBUTED cumulative sum — a
    global ``Window.orderBy(v)`` would plan Exchange SinglePartition
    and put every distinct value in one task (for a continuous column,
    distinct-count ~ row count: the r3-advice scale bug). Instead:
    quantile boundaries over the distinct values (``percentile_approx``
    sketch, kept in-plan as one broadcast row) deterministically bucket
    values into ``n_buckets`` monotone ranges; the cumsum is a
    per-bucket window plus broadcast prefix offsets from an
    n_buckets-row subtotal table — the only single-partition window in
    the plan is over those ≤n_buckets rows. Per-bucket integer sums +
    exact offset adds keep the cumulative counts exact regardless of
    where the sketch places boundaries. Returns one row: (d_stat,
    n_old, n_new, at_value) with the arg-max value as the drift
    location (ties to the smallest value)."""
    from pyspark.sql import Window

    # per-value counts for BOTH sides in ONE aggregation (r12): tag
    # each side, union, and conditionally count — one shuffle with
    # map-side partial aggregation where the old shape paid two
    # groupBy shuffles plus a full-outer join (and this subtree is
    # re-evaluated by every consumer branch below, multiplying the
    # saving). count(when(...)) is the same exact integer as the
    # per-side count(*); absent values on a side count 0, exactly
    # what the old coalesce produced.
    tagged = (
        old.select(F.col(value_col).alias("v"))
        .where(F.col("v").isNotNull())
        .select("v", F.lit(1).alias("__side"))
        .unionByName(
            new.select(F.col(value_col).alias("v"))
            .where(F.col("v").isNotNull())
            .select("v", F.lit(0).alias("__side"))
        )
    )
    per = tagged.groupBy("v").agg(
        F.count(F.when(F.col("__side") == 1, True)).alias("oc"),
        F.count(F.when(F.col("__side") == 0, True)).alias("nc"),
    # materialized ONCE (r13): four branches consume this subtree
    # (boundary sketch, bucket subtotals, the cumsum, totals) and the
    # plan showed zero exchange reuse — the scan+union+groupBy ran per
    # branch (20 parquet scans in the executed plan). The frame is
    # (v, oc, nc): #distinct-value rows of three scalars, the same
    # narrow at-rest class as partitioned_prefix_sum's checkpoint.
    ).localCheckpoint(eager=True)
    # deterministic monotone bucketing: bucket(v) = #boundaries <= v.
    # Boundary placement only affects balance, never correctness.
    fracs = F.array(
        *[F.lit(i / n_buckets) for i in range(1, n_buckets)]
    )
    bounds = per.agg(
        F.percentile_approx("v", fracs, F.lit(10000)).alias("__bs")
    )
    bucketed = per.crossJoin(F.broadcast(bounds)).select(
        "v",
        "oc",
        "nc",
        F.size(
            F.filter("__bs", lambda b: b <= F.col("v"))
        ).alias("__b"),
    )
    sub = bucketed.groupBy("__b").agg(
        F.sum("oc").alias("__so"), F.sum("nc").alias("__sn")
    )
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sub.select(
        "__b",
        F.coalesce(F.sum("__so").over(wb), F.lit(0)).alias("__ooff"),
        F.coalesce(F.sum("__sn").over(wb), F.lit(0)).alias("__noff"),
    )
    wv = (
        Window.partitionBy("__b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = per.agg(F.sum("oc").alias("n_old"), F.sum("nc").alias("n_new"))
    cum = (
        bucketed.select(
            "v",
            "__b",
            F.sum("oc").over(wv).alias("__cop"),
            F.sum("nc").over(wv).alias("__cnp"),
        )
        .join(F.broadcast(offsets), "__b")
        .select(
            "v",
            (F.col("__cop") + F.col("__ooff")).alias("co"),
            (F.col("__cnp") + F.col("__noff")).alias("cn"),
        )
        .crossJoin(F.broadcast(tot))
    )
    # an empty side has no ecdf: emit NULL gaps (one NULL result row)
    # instead of an ANSI divide-by-zero
    gap = F.when(
        (F.col("n_old") > 0) & (F.col("n_new") > 0),
        F.abs(
            F.col("co") / F.col("n_old").cast("double")
            - F.col("cn") / F.col("n_new").cast("double")
        ),
    )
    return (
        cum.select(
            gap.alias("gap"), "v", "n_old", "n_new"
        )
        .orderBy(F.desc("gap"), F.asc("v"))
        .limit(1)
        .select(
            F.col("gap").alias("d_stat"),
            F.col("v").alias("at_value"),
            "n_old",
            "n_new",
        )
    )


def psi_drift(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    epsilon: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two table versions of a
    numeric column — the banking/deployment-standard drift score
    (rule of thumb: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25
    major shift). Buckets are quantile boundaries of the OLD (baseline)
    distribution, so each baseline bucket holds ~1/n of old mass and
    the score reads as reweighting of baseline deciles; fractions are
    floored at ``epsilon`` so empty buckets contribute finite mass.
    Returns one row per bucket: (bucket, n_old, n_new, frac_old,
    frac_new, psi_contrib); Σ psi_contrib is the index. Complements
    ks_drift (max-gap, bucket-free) and chi_square_drift (frequency)
    with the magnitude-weighted log-ratio form.

    Rows-only operator: ln() is engine-libm-dependent, so no SQL
    oracle — correctness is pytest-checked against an independent
    numpy implementation (the dsir_weights contract). Scale shape: the
    boundary row is one percentile_approx sketch broadcast; both count
    passes are partial aggs over bucket ids; output is n_buckets
    rows."""
    fracs = F.array(
        *[F.lit(i / n_buckets) for i in range(1, n_buckets)]
    )
    o = old.select(F.col(value_col).alias("v")).where(
        F.col("v").isNotNull()
    )
    nw = new.select(F.col(value_col).alias("v")).where(
        F.col("v").isNotNull()
    )
    bounds = o.agg(
        F.percentile_approx("v", fracs, F.lit(10000)).alias("__bs")
    )

    def bucketed(frame: DataFrame, alias: str) -> DataFrame:
        return (
            frame.crossJoin(F.broadcast(bounds))
            .select(
                F.size(
                    F.filter("__bs", lambda b: b <= F.col("v"))
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").alias(alias))
        )

    oc = bucketed(o, "n_old")
    nc = bucketed(nw, "n_new")
    per = oc.join(nc, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    tot = per.agg(
        F.sum("n_old").alias("__to"), F.sum("n_new").alias("__tn")
    )
    fo = F.greatest(
        F.col("n_old") / F.col("__to").cast("double"), F.lit(epsilon)
    )
    fn = F.greatest(
        F.col("n_new") / F.col("__tn").cast("double"), F.lit(epsilon)
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            F.col("n_old").cast("long").alias("n_old"),
            F.col("n_new").cast("long").alias("n_new"),
            fo.alias("frac_old"),
            fn.alias("frac_new"),
            ((fn - fo) * F.log(fn / fo)).alias("psi_contrib"),
        )
    )


def mad_outliers_approx(
    df: DataFrame,
    value_col: str,
    k: float = 3.0,
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch-backed twin of :func:`mad_outliers` — the registered
    100 TB default. Both medians come from ``percentile_approx``
    (Greenwald-Khanna: single-pass, mergeable, bounded-memory
    aggregation buffer), so no value set ever concentrates in one
    reducer; exact ``percentile`` buffers every value in a single
    aggregation buffer, which is the scale-killer the exact twin keeps
    only for oracle parity (mirror of the iqr_outliers /
    iqr_outliers_exact resolution, quality/anomaly.iqr_anomalies).
    Fences agree with the exact twin within the sketch's rank error
    (asserted in tests/test_quality.py). Same output schema as the
    exact form."""
    v = F.col(value_col)
    med_row = df.agg(
        F.percentile_approx(value_col, F.lit(0.5), F.lit(accuracy)).alias(
            "median"
        )
    )
    dev = df.crossJoin(F.broadcast(med_row)).select(
        "median", F.abs(v - F.col("median")).alias("__ad")
    )
    mad_row = dev.groupBy("median").agg(
        F.percentile_approx("__ad", F.lit(0.5), F.lit(accuracy)).alias("mad"),
        F.count("*").alias("n_rows"),
    )
    fenced = mad_row.select(
        "median",
        "mad",
        (F.col("median") - F.lit(k) * F.lit(1.4826) * F.col("mad")).alias(
            "lower_fence"
        ),
        (F.col("median") + F.lit(k) * F.lit(1.4826) * F.col("mad")).alias(
            "upper_fence"
        ),
        "n_rows",
    )
    return (
        df.crossJoin(F.broadcast(fenced))
        .groupBy("median", "mad", "lower_fence", "upper_fence", "n_rows")
        .agg(
            F.count(
                F.when(
                    (v < F.col("lower_fence")) | (v > F.col("upper_fence")), 1
                )
            ).alias("n_outliers")
        )
        .select(
            "median", "mad", "lower_fence", "upper_fence",
            F.col("n_outliers").cast("int").alias("n_outliers"),
            F.col("n_rows").cast("int").alias("n_rows"),
        )
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust outlier detection via median absolute deviation: flag
    values with |x − median| > k · 1.4826 · MAD (the normal-consistent
    robust z-score). Unlike the mean/σ z-score (Q4), a few extreme
    values cannot drag the fences — the median and MAD have a 50%
    breakdown point; unlike IQR fences (Q5), the threshold scales like
    σ under normality. Returns one row: (median, mad, lower_fence,
    upper_fence, n_outliers, n_rows).

    Exactness: exact percentiles both passes (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, the same interpolation — the proven
    iqr_outliers_exact parity); fences are products of exact doubles
    with the same literals. Cost: two passes (median, then MAD over
    |x − median|), each an exact DISTRIBUTED rank-selection
    (functions/numeric.exact_quantiles — bit-identical to `percentile`
    without its all-values-in-one-buffer aggregate); kept as the oracle
    twin while the registered default stays
    :func:`mad_outliers_approx` (GK sketch, single-pass mergeable)."""
    from nyc_taxi_data_ingestion_spark.functions.numeric import (
        exact_quantiles,
    )

    v = F.col(value_col)
    # exact_quantiles resolves to a one-row LOCAL relation (its
    # iterative selection runs bounded driver rounds), so each pass's
    # result broadcasts for free — the second pass never re-derives
    # the first through lineage. r12 job-count trim (the wall here is
    # sequential full-scan jobs, not compute): pass two reuses pass
    # one's non-null count (|x − median| is null exactly where x is,
    # so the counts are provably identical) and the old standalone
    # n_rows aggregation is folded into the final outlier count — 6
    # scan jobs down to 4.
    so: dict = {}
    med_row = exact_quantiles(df, value_col, [0.5], stats_out=so).select(
        F.col("q0").alias("median")
    )
    dev = df.crossJoin(F.broadcast(med_row)).select(
        "median", F.abs(v - F.col("median")).alias("__ad"), v.alias("__v")
    )
    mad_med = exact_quantiles(
        dev, "__ad", [0.5], known_n=so["n"]
    ).select(F.col("q0").alias("mad"))
    fenced = med_row.crossJoin(mad_med).select(
        "median",
        "mad",
        (
            F.col("median") - F.lit(k) * F.lit(1.4826) * F.col("mad")
        ).alias("lower_fence"),
        (
            F.col("median") + F.lit(k) * F.lit(1.4826) * F.col("mad")
        ).alias("upper_fence"),
    )
    return (
        df.crossJoin(F.broadcast(fenced))
        .groupBy("median", "mad", "lower_fence", "upper_fence")
        .agg(
            F.count(
                F.when(
                    (v < F.col("lower_fence")) | (v > F.col("upper_fence")), 1
                )
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "median", "mad", "lower_fence", "upper_fence",
            F.col("n_outliers").cast("int").alias("n_outliers"),
            F.col("n_rows").cast("int").alias("n_rows"),
        )
    )


def ks_drift_grouped(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    group_cols: list[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Per-group two-sample KS drift: one (d_stat, at_value, n_old,
    n_new) row per group key — the fleet form of :func:`ks_drift` for
    monitoring many segments (per event type, per source, per tenant)
    in one pass. Groups present on only one side report NULL d_stat
    (no ecdf to compare), not an error.

    Scale shape (the GROUPED form of ks_drift's two-pass cumulative —
    for a continuous column, distinct values per group ~ rows per
    group, so ``Window.partitionBy(group).orderBy(v)`` would sort N/k
    rows in one task when the group key is low-cardinality, exactly
    plans/audit's ``low-cardinality-window``): per-group quantile
    boundaries deterministically bucket each group's values into
    ``n_buckets`` monotone ranges, the cumsum windows on the
    HIGH-cardinality (group, bucket) key, and broadcast prefix offsets
    come from a subtotal table of ≤ groups×n_buckets rows — the only
    group-partitioned ordered window runs over those bounded subtotal
    rows. Per-side totals come from the NARROW inputs (not the merged
    per-value frame — the count-back-join rule in docs/SCALE.md); the
    arg-max is a per-group rank-1 window (WindowGroupLimit: map-side
    top-1 per task before the shuffle). Boundary placement only steers
    balance, never the result — per-bucket integer sums + exact offset
    adds reproduce the direct cumulative bit-for-bit. Exactness
    contract identical to ks_drift."""
    from pyspark.sql import Window

    g = list(group_cols)

    def totals(frame: DataFrame, alias: str) -> DataFrame:
        return (
            frame.select(*g, F.col(value_col).alias("v"))
            .where(F.col("v").isNotNull())
            .groupBy(*g)
            .agg(F.count("*").alias(alias))
        )

    # one tagged union + conditional count instead of two groupBys +
    # full-outer join — see ks_drift (r12); identical exact integers
    tagged = (
        old.select(*g, F.col(value_col).alias("v"))
        .where(F.col("v").isNotNull())
        .select(*g, "v", F.lit(1).alias("__side"))
        .unionByName(
            new.select(*g, F.col(value_col).alias("v"))
            .where(F.col("v").isNotNull())
            .select(*g, "v", F.lit(0).alias("__side"))
        )
    )
    per = tagged.groupBy(*g, "v").agg(
        F.count(F.when(F.col("__side") == 1, True)).alias("oc"),
        F.count(F.when(F.col("__side") == 0, True)).alias("nc"),
    # materialized ONCE — see ks_drift: three consumer branches, no
    # exchange reuse, narrow (group, v, oc, nc) rows
    ).localCheckpoint(eager=True)
    # deterministic per-group monotone bucketing: bucket(v) =
    # #boundaries <= v (ks_drift's rule, grouped)
    fracs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    bounds = per.groupBy(*g).agg(
        F.percentile_approx("v", fracs, F.lit(10000)).alias("__bs")
    )
    bucketed = per.join(F.broadcast(bounds), g).select(
        *g,
        "v",
        "oc",
        "nc",
        F.size(F.filter("__bs", lambda b: b <= F.col("v"))).alias("__b"),
    )
    sub = bucketed.groupBy(*g, "__b").agg(
        F.sum("oc").alias("__so"), F.sum("nc").alias("__sn")
    )
    # ≤ n_buckets subtotal rows per group: the one group-partitioned
    # ordered window, bounded by construction
    wb = (
        Window.partitionBy(*g)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sub.select(
        *g,
        "__b",
        F.coalesce(F.sum("__so").over(wb), F.lit(0)).alias("__ooff"),
        F.coalesce(F.sum("__sn").over(wb), F.lit(0)).alias("__noff"),
    )
    wv = (
        Window.partitionBy(*g, "__b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        bucketed.select(
            *g,
            "v",
            "__b",
            F.sum("oc").over(wv).alias("__cop"),
            F.sum("nc").over(wv).alias("__cnp"),
        )
        .join(F.broadcast(offsets), [*g, "__b"])
        .select(
            *g,
            "v",
            (F.col("__cop") + F.col("__ooff")).alias("co"),
            (F.col("__cnp") + F.col("__noff")).alias("cn"),
        )
    )
    tot = totals(old, "n_old").join(totals(new, "n_new"), g, "full_outer")
    gap = F.when(
        (F.col("n_old") > 0) & (F.col("n_new") > 0),
        F.abs(
            F.col("co") / F.col("n_old").cast("double")
            - F.col("cn") / F.col("n_new").cast("double")
        ),
    )
    pick = Window.partitionBy(*g).orderBy(
        F.desc_nulls_last("gap"), F.asc("v")
    )
    return (
        cum.join(tot, g, "left")
        .select(*g, gap.alias("gap"), "v", "n_old", "n_new")
        .withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select(
            *g,
            F.col("gap").alias("d_stat"),
            F.col("v").alias("at_value"),
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )


# log10(1 + 1/d) for d = 1..9, written out as double literals so both
# engines parse the identical IEEE value — no libm call anywhere
BENFORD_P = {
    1: 0.30102999566398120,
    2: 0.17609125905568124,
    3: 0.12493873660829993,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def benford_drift(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated/synthetic-data and unit-mixing detector for
    financial-style columns (Nigrini's digit analysis). Returns one
    row per digit 1-9: observed count, observed fraction, expected
    Benford fraction, and the chi-square contribution
    ``n·(obs−exp)²/exp``; Σ contrib vs χ²₈ thresholds is the test.

    Exactness contract: the digit comes from the DECIMAL string form
    (exact in both engines — never double formatting); expected
    probabilities are hard double literals (no libm); contributions
    are rational arithmetic over exact counts. Scale: one partial-agg
    pass; output is 9 rows.

    The column must be a DECIMAL type with values ≥ 1 (financial
    amounts); rows ≤ 0 are excluded (no first significant digit)."""
    v = F.col(value_col)
    digit = F.substring(v.cast("string"), 1, 1).cast("int")
    observed = (
        df.where(v >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n_obs"))
    )
    # All nine digits always appear: a digit with ZERO occurrences is
    # the strongest Benford deviation (its full n·p_d chi-square mass),
    # so dropping absent digits understates the statistic exactly when
    # it matters most (r3 advice). Left-join observed counts onto the
    # 1-9 spine and coalesce to 0.
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    counts = spine.join(observed, "digit", "left").select(
        "digit", F.coalesce("n_obs", F.lit(0)).alias("n_obs")
    )
    total = counts.agg(F.sum("n_obs").alias("n_total"))
    expected = F.create_map(
        *[F.lit(x) for kv in BENFORD_P.items() for x in kv]
    )
    # guard the all-excluded input (n_total = 0): NULL fractions, not
    # an ANSI divide-by-zero
    nz = F.col("n_total") > 0
    obs_frac = F.when(nz, F.col("n_obs") / F.col("n_total").cast("double"))
    exp_frac = expected[F.col("digit")]
    dev = obs_frac - exp_frac
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.col("n_obs").cast("int").alias("n_obs"),
            obs_frac.alias("obs_frac"),
            exp_frac.alias("benford_frac"),
            F.when(nz, F.col("n_total") * dev * dev / exp_frac).alias(
                "chi2_contrib"
            ),
        )
    )


def mad_outliers_grouped(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 3.0,
) -> DataFrame:
    """Fleet form of :func:`mad_outliers`: robust median/MAD fences and
    outlier counts per group key, for monitoring many segments in one
    job. Same exactness contract (grouped exact percentiles — Spark
    ``percentile`` == DuckDB ``quantile_cont``); three grouped passes
    (median, MAD, fence scan) with the small per-group stat tables
    broadcast back onto the fact side."""
    g = list(group_cols)
    v = F.col(value_col)
    med = df.groupBy(*g).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("median")
    )
    dev = df.join(F.broadcast(med), g).select(
        *g, "median", F.abs(v - F.col("median")).alias("__ad")
    )
    stats = dev.groupBy(*g, "median").agg(
        F.expr("percentile(__ad, 0.5)").alias("mad"),
        F.count("*").alias("n_rows"),
    )
    fenced = stats.select(
        *g,
        "median",
        "mad",
        (F.col("median") - F.lit(k) * F.lit(1.4826) * F.col("mad")).alias(
            "lower_fence"
        ),
        (F.col("median") + F.lit(k) * F.lit(1.4826) * F.col("mad")).alias(
            "upper_fence"
        ),
        "n_rows",
    )
    return (
        df.join(F.broadcast(fenced), g)
        .groupBy(*g, "median", "mad", "lower_fence", "upper_fence", "n_rows")
        .agg(
            F.count(
                F.when(
                    (v < F.col("lower_fence")) | (v > F.col("upper_fence")), 1
                )
            ).alias("n_outliers")
        )
        .select(
            *g, "median", "mad", "lower_fence", "upper_fence",
            F.col("n_outliers").cast("int").alias("n_outliers"),
            F.col("n_rows").cast("int").alias("n_rows"),
        )
    )


def seasonal_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    k: float = 3.0,
    id_col: str = "event_id",
) -> DataFrame:
    """Seasonal-profile outliers: each event is scored against the
    mean/variance of its OWN (day-of-week, hour) cell — the weekly
    seasonality baseline that a global z-score (``zscore_anomalies``)
    or a time-adjacent band (``moving_avg_band``) both miss: 3 a.m.
    Sunday traffic is not anomalous for being below the weekday mean.

    Exactness contract (the ``corr_stats`` moment pattern): per-cell
    n / Σv / Σv² accumulate in exact decimal (order-independent;
    testdata values are ≤4 dp so the casts are lossless), and the flag
    avoids sqrt entirely — n·(v−mean)² > k²·(s2 − s·mean) compares
    squared deviation to k²·variance with every float op a single
    IEEE expression mirrored in the oracle.

    Scale shape: one partial-agg shuffle on the 168-cell key, profile
    broadcasts back onto the stream; flagging is a narrow map."""
    dow = F.dayofweek(F.col(ts_col)).cast("int")
    hr = F.hour(F.col(ts_col)).cast("int")
    v = F.col(value_col)
    cells = df.select(
        dow.alias("dow"), hr.alias("hr"), v.alias("v"),
        F.col(id_col).alias("event_id"),
    )
    prof = cells.groupBy("dow", "hr").agg(
        F.count("*").alias("n"),
        F.sum(F.col("v").cast("decimal(30,4)")).cast("double").alias("s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,4)"))
        .cast("double")
        .alias("s2"),
    )
    joined = cells.join(F.broadcast(prof), ["dow", "hr"])
    mean = F.col("s") / F.col("n").cast("double")
    dev = F.col("v") - mean
    # n·dev² > k²·(s2 − s·mean)  ⇔  dev² > k²·var   (var·n both sides)
    flagged = joined.where(
        (F.col("n") > 1)
        & (
            F.col("n").cast("double") * (dev * dev)
            > F.lit(k * k) * (F.col("s2") - F.col("s") * mean)
        )
    )
    return flagged.select(
        "event_id", "dow", "hr", "v", mean.alias("cell_mean")
    )
