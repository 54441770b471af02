"""SQL-model layer — the dbt twin, executed by Spark SQL itself.

The reference runs its Gold marts twice: once as PySpark CTAS strings
(``build_gold_layer.py:62-184``) and once as dbt models that Jinja-
compile and hand the SAME SQL to a second engine, Trino
(``gold/models/analytics/*.sql``, ``gold/profiles.yml``). This module
replaces the second engine with Spark SQL: models are plain SQL
strings with dbt-style ``{{ ref('model') }}`` / ``{{ source('schema',
'table') }}`` templating, dependency-ordered by their refs, executed
with ``spark.sql`` against temp views, and materialized as views,
tables, or incremental merges (``unique_key``, mirroring dbt's
``incremental_strategy='merge'`` — ``daily_trip_stats.sql:1-11``).

Scale notes: compilation is driver-side string work; execution is one
Catalyst plan per model (SQL goes through the same optimizer as the
DataFrame API — predicate pushdown/partial aggregation identical), so
the SQL surface costs nothing over the native one. Incremental
materialization delegates to ``sources.sinks.merge_upsert`` (the
parquet MERGE whose contract mirrors Iceberg's MERGE INTO).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_REF_RE = re.compile(r"\{\{\s*ref\(\s*'([^']+)'\s*\)\s*\}\}")
_SOURCE_RE = re.compile(r"\{\{\s*source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}")


@dataclass
class SqlModel:
    """One model: a SELECT with ``{{ ref }}``/``{{ source }}`` holes.

    materialized: 'view' (temp view only), 'table' (parquet overwrite)
    or 'incremental' (parquet MERGE on ``unique_key`` by ``order_col``).
    """

    name: str
    sql: str
    materialized: str = "view"
    unique_key: list[str] = field(default_factory=list)
    order_col: str | None = None


def model_refs(model: SqlModel) -> set[str]:
    """Model names this model depends on (its ``{{ ref }}`` holes)."""
    return set(_REF_RE.findall(model.sql))


def render(model: SqlModel, sources: dict[tuple[str, str], str]) -> str:
    """Resolve templating to concrete view names. ``sources`` maps
    (schema, table) → registered view name; refs resolve to the
    model-name views ``run_sql_models`` registers."""

    def _src(m: re.Match) -> str:
        key = (m.group(1), m.group(2))
        if key not in sources:
            raise KeyError(f"unregistered source {key} in model {model.name}")
        return sources[key]

    out = _SOURCE_RE.sub(_src, model.sql)
    return _REF_RE.sub(lambda m: f"__model_{m.group(1)}", out)


def topo_order(models: list[SqlModel]) -> list[SqlModel]:
    """Kahn's algorithm over ref edges; raises on cycles and on refs
    to models that are not in the list."""
    by_name = {m.name: m for m in models}
    if len(by_name) != len(models):
        from collections import Counter

        dupes = sorted(
            n for n, c in Counter(m.name for m in models).items() if c > 1
        )
        # a silently-deduplicated list would drop one definition and
        # bind downstream refs to whichever survived (r3 advice) —
        # duplicate names are a build error like cycles / unknown refs
        raise ValueError(f"duplicate model names {dupes}")
    deps = {}
    for m in models:
        refs = model_refs(m)
        unknown = refs - by_name.keys()
        if unknown:
            raise KeyError(f"model {m.name} refs unknown models {sorted(unknown)}")
        deps[m.name] = set(refs)
    order: list[SqlModel] = []
    ready = sorted(n for n, d in deps.items() if not d)
    while ready:
        n = ready.pop(0)
        order.append(by_name[n])
        del deps[n]
        newly = sorted(
            x for x, d in deps.items() if n in d and len(d) == 1
        )
        for x in deps:
            deps[x].discard(n)
        ready = sorted(set(ready) | {x for x in newly})
    if deps:
        raise ValueError(f"ref cycle among models {sorted(deps)}")
    return order


def run_sql_models(
    spark: SparkSession,
    models: list[SqlModel],
    sources: dict[tuple[str, str], DataFrame],
    target_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Compile and execute models in dependency order.

    Registers each source DataFrame and each model's result as a temp
    view (``__model_<name>``) so downstream refs resolve; materializes
    'table'/'incremental' models under ``target_dir`` (required for
    those). Returns {model name: result DataFrame}."""
    src_views: dict[tuple[str, str], str] = {}
    for (schema, table), df in sources.items():
        vname = f"__src_{schema}_{table}"
        df.createOrReplaceTempView(vname)
        src_views[(schema, table)] = vname

    out: dict[str, DataFrame] = {}
    for m in topo_order(models):
        df = spark.sql(render(m, src_views))
        if m.materialized in ("table", "incremental"):
            if target_dir is None:
                raise ValueError(
                    f"model {m.name} is materialized={m.materialized!r}"
                    " but no target_dir was given"
                )
            path = f"{target_dir}/{m.name}"
            if m.materialized == "table":
                df.write.mode("overwrite").parquet(path)
            else:
                from nyc_taxi_data_ingestion_spark.sources.sinks import (
                    merge_upsert,
                )

                if not m.unique_key or not m.order_col:
                    raise ValueError(
                        f"incremental model {m.name} needs unique_key + order_col"
                    )
                merge_upsert(
                    spark, path, df, keys=m.unique_key, order_col=m.order_col
                )
            df = spark.read.parquet(path)
        df.createOrReplaceTempView(f"__model_{m.name}")
        out[m.name] = df
    return out
