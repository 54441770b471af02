"""Physical-plan introspection — the plan-quality contract as an API.

The difference between a plan that survives a 100 TB scale-up and one
that silently costs 100x is visible in the physical plan: did filters
reach the scan, did the dim join broadcast, did the aggregate keep its
partial stage, did anything fall out of whole-stage codegen into a
Python eval node. ``plan_summary`` extracts those signals as data so
pipelines can ASSERT them (tests/test_plan_quality.py builds on this)
and operators can log them next to run metrics.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The `formatted` explain output as a string (what
    ``df.explain("formatted")`` prints)."""
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def _node_counts(plan: str) -> dict[str, int]:
    counts: dict[str, int] = {}
    for m in re.finditer(r"^\(\d+\) (\w[\w ]*?)(?: \[codegen id : \d+\])?$", plan, re.M):
        name = m.group(1).strip()
        counts[name] = counts.get(name, 0) + 1
    return counts


def plan_summary(df: DataFrame) -> dict[str, object]:
    """Summarize scale-relevant physical-plan properties:

    - ``n_exchanges`` — shuffle count (each is a full network pass)
    - ``n_broadcast_exchanges`` — broadcasts (cheap for small sides)
    - ``n_scans`` / ``scan_paths`` — source scans and what they read
    - ``pushed_filters`` — predicates that reached the parquet reader
    - ``read_schemas`` — pruned per-scan column sets
    - ``partial_aggregate`` — map-side combine present
    - ``python_eval`` — True if any Batch/ArrowEvalPython node exists
      (a per-expression Python boundary — the slow path; the engine's
      hot paths keep this False everywhere)
    - ``n_arrow_stages`` — deliberate Arrow-batched Python stages
      (MapInPandas / FlatMapGroupsInPandas / applyInPandasWithState):
      the sanctioned escape hatch for sketch/decode logic Catalyst
      can't express
    - ``codegen_ids`` — distinct whole-stage-codegen spans (wider
      spans = more fused operators)
    - ``node_counts`` — raw per-operator node tally
    """
    plan = explain_formatted(df)
    nodes = _node_counts(plan)
    scans = [
        m.group(1)
        for m in re.finditer(r"^\(\d+\) Scan \w+ ?(.*)$", plan, re.M)
    ]
    return {
        "n_exchanges": nodes.get("Exchange", 0),
        "n_broadcast_exchanges": nodes.get("BroadcastExchange", 0),
        "n_scans": sum(v for k, v in nodes.items() if k.startswith("Scan")),
        "scan_paths": scans,
        "pushed_filters": re.findall(r"PushedFilters: \[(.*?)\]", plan),
        "read_schemas": re.findall(r"ReadSchema: (\S+)", plan),
        "partial_aggregate": "partial_" in plan,
        "python_eval": ("BatchEvalPython" in plan) or ("ArrowEvalPython" in plan),
        "n_arrow_stages": sum(
            v
            for k, v in nodes.items()
            if k
            in ("MapInPandas", "FlatMapGroupsInPandas", "FlatMapGroupsInPandasWithState")
        ),
        "codegen_ids": sorted(
            {int(x) for x in re.findall(r"\[codegen id : (\d+)\]", plan)}
        ),
        "node_counts": nodes,
    }
