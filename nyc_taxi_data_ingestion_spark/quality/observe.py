"""Zero-cost pipeline metrics via ``df.observe()``.

The reference logs row counts and null tallies between every pipeline
step with eager ``.count()`` / ``.filter().count()`` jobs — ~10 extra
full passes per run (``bronze_to_silver.py``, SURVEY §3.2). Spark's
``observe`` attaches aggregate expressions to a plan and harvests them
from the SAME action that materializes the data: the metrics ride the
write job for free. At 100 TB the difference is N full scans vs zero.

Only whole-plan aggregates are observable (no distinct, no sorting —
Spark enforces this); counts, conditional counts, sums, min/max cover
the reference's entire between-step logging surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def standard_metrics(df: DataFrame, null_cols: list[str] | None = None) -> dict[str, Column]:
    """The reference's between-step logging bundle: row count plus a
    null tally per listed column (defaults to every column — same
    coverage as its full-frame isna scan, at zero extra jobs)."""
    cols = df.columns if null_cols is None else null_cols
    metrics: dict[str, Column] = {"row_count": F.count(F.lit(1))}
    for c in cols:
        metrics[f"null_{c}"] = F.count(F.lit(1)) - F.count(F.col(c))
    return metrics


def attach(df: DataFrame, metrics: dict[str, Column], name: str = "dq") -> tuple[DataFrame, Observation]:
    """Attach observed metrics to a plan. Returns (df, observation);
    read ``observation.get`` only AFTER an action has run on the
    returned frame (it blocks until then). Each Observation is
    single-use — attach a fresh one per action."""
    obs = Observation(name)
    return df.observe(obs, *[e.alias(n) for n, e in metrics.items()]), obs


def write_observed(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column] | None = None,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    audit: bool = True,
) -> dict[str, object]:
    """Partitioned parquet write that harvests observed metrics from
    the write job itself — one action, data + metrics. Returns the
    metric dict (e.g. ``{"row_count": 12345, "null_ts": 0}``).

    ``audit=True`` additionally runs the ``plans/audit`` plan review
    on the frame before writing and returns its findings under
    ``plan_findings`` — config-declared pipelines get their scale
    smells (single-task windows, row-Python, unpushed filters)
    surfaced in the run metrics, not in a postmortem. String analysis
    of the formatted plan only; no extra Spark jobs."""
    if metrics is None:
        metrics = standard_metrics(df)
    findings: list[dict[str, str]] = []
    if audit:
        from nyc_taxi_data_ingestion_spark.plans.audit import audit_plan

        findings = [
            {"severity": f.severity, "code": f.code} for f in audit_plan(df)
        ]
    observed, obs = attach(df, metrics)
    writer = observed.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    out = dict(obs.get)
    if audit:
        out["plan_findings"] = findings
    return out
