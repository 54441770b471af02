"""Config system: validate / overlay / expand / migrate.

Parity with the reference's config stack, re-expressed as plain Python
(it is engine-independent):

- JSON-Schema-style validation       → ``src/config_validator.py:68-108``
- environment overlay deep-merge     → ``src/environment_config_manager.py:92-112``
- ``${ENV_VAR}`` expansion           → ``src/environment_config_manager.py:149-177``
- version detection + migration      → ``src/config_version_manager.py:33-124``

A pipeline config is a dict of the shape::

    {
      "version": "2.0",
      "pipeline": {"name": str},
      "source": {"table": str} | {"path": str, "format": "parquet"|"csv"},
      "silver": {
         "renames": {old: new}, "casts": {col: type}, "derived": {col: sql},
         "filters": [sql_pred, ...],
         "dedupe": {"keys": [...], "order_by": "col DIR", "tie_breakers": [...]},
         "partition_by": [...],
      },
      "gold": [{"name": str, "group_by": [...],
                "measures": [{"name": str, "expr": sql}],
                "materialization": "full" | "incremental",
                "lookback": {"column": str, "days": int},
                "partition_by": [...]}],
      "quality": {"checks": [...]},         # optional, see quality/checks.py
      "performance": {...},                 # wired to Spark confs for real
    }
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any

CURRENT_VERSION = "2.0"

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::-([^}]*))?\}")


class ConfigError(ValueError):
    """Invalid pipeline configuration."""


# -- validation --------------------------------------------------------------

def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ConfigError(msg)


def validate_config(cfg: dict) -> dict:
    """Validate a pipeline config dict; returns it unchanged on success.

    Two passes, mirroring the reference's validator stack
    (``src/config_validator.py:68-108`` against
    ``config/schemas/lakehouse_config_schema_v1.json``):

    1. declarative JSON-Schema (draft-07 subset) validation —
       ``plans/schema.py`` (types, required, enums, patterns, ranges);
    2. cross-field checks the schema language can't express (exactly one
       of table|path, incremental needs lookback + partition_by).
    """
    _require(isinstance(cfg, dict), "config must be a mapping")

    from nyc_taxi_data_ingestion_spark.plans.schema import SchemaValidator

    errors = SchemaValidator().get_validation_errors(cfg)
    if errors:
        raise ConfigError("; ".join(errors))

    src = cfg["source"]
    if src.get("format") == "kafka":
        # streaming source: addressed by topic, not table/path
        _require(
            bool(src.get("topic")),
            "kafka source needs a topic",
        )
        _require(
            bool(src.get("bootstrap_servers")) or bool(src.get("local_substitute")),
            "kafka source needs bootstrap_servers or a local_substitute",
        )
    else:
        _require(
            bool(src.get("table")) ^ bool(src.get("path")),
            "source needs exactly one of table|path",
        )

    for i, mart in enumerate(cfg.get("gold", [])):
        mat = mart.get("materialization", "full")
        if mat == "incremental":
            lb = mart.get("lookback")
            _require(
                isinstance(lb, dict) and lb.get("column") and lb.get("days") is not None,
                f"gold[{i}].lookback.column/days required for incremental",
            )
            _require(
                bool(mart.get("partition_by")),
                f"gold[{i}].partition_by required for incremental "
                "(partition-overwrite is the MERGE replacement)",
            )
    return cfg


# -- environment overlay -----------------------------------------------------


def merge_environment(base: dict, overlay: dict) -> dict:
    """Deep-merge ``overlay`` onto ``base`` (dicts merge recursively,
    everything else replaces — ``environment_config_manager.py:92-112``)."""
    out = copy.deepcopy(base)

    def _merge(dst: dict, src: dict) -> None:
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                _merge(dst[k], v)
            else:
                dst[k] = copy.deepcopy(v)

    _merge(out, overlay)
    return out


def expand_env_vars(cfg: Any, env: dict[str, str] | None = None) -> Any:
    """Recursively expand ``${VAR}`` / ``${VAR:-default}`` in string
    values (``environment_config_manager.py:149-177``). Missing vars
    without a default raise ConfigError (fail fast, not at runtime)."""
    env = os.environ if env is None else env

    def _sub(m: re.Match) -> str:
        name, default = m.group(1), m.group(2)
        if name in env:
            return env[name]
        if default is not None:
            return default
        raise ConfigError(f"environment variable {name} is not set and has no default")

    if isinstance(cfg, str):
        return _ENV_RE.sub(_sub, cfg)
    if isinstance(cfg, dict):
        return {k: expand_env_vars(v, env) for k, v in cfg.items()}
    if isinstance(cfg, list):
        return [expand_env_vars(v, env) for v in cfg]
    return cfg


# -- version migration -------------------------------------------------------


def migrate_config(cfg: dict) -> dict:
    """Detect + migrate old config versions to CURRENT_VERSION
    (``config_version_manager.py:80-124``).

    v1 configs used ``transformations:`` with ``column_mappings`` /
    ``type_casts`` / ``derived_columns`` / ``quality_filters`` keys; v2
    nests them under ``silver:`` with the shorter names.
    """
    cfg = copy.deepcopy(cfg)
    version = str(cfg.get("version", "1.0"))
    if version == CURRENT_VERSION:
        return cfg
    if version.split(".")[0] == "1":
        t = cfg.pop("transformations", {})
        silver = cfg.setdefault("silver", {})
        for old, new in (
            ("column_mappings", "renames"),
            ("type_casts", "casts"),
            ("derived_columns", "derived"),
            ("quality_filters", "filters"),
        ):
            if old in t and new not in silver:
                silver[new] = t[old]
        if "deduplication" in t and "dedupe" not in silver:
            d = t["deduplication"]
            silver["dedupe"] = {
                "keys": d.get("key_columns", []),
                "order_by": d.get("order_by"),
            }
        cfg["version"] = CURRENT_VERSION
        return cfg
    raise ConfigError(f"unknown config version {version!r}")


# -- performance wiring ------------------------------------------------------

# Declared keys → Spark confs. The reference declares these
# (lakehouse_config.yaml:336-373) but never applies them (SURVEY §4);
# here they reach the session for real.
_PERF_CONF_MAP = {
    "adaptive_query_execution": ("spark.sql.adaptive.enabled", None),
    "shuffle_partitions": ("spark.sql.shuffle.partitions", None),
    "broadcast_threshold": ("spark.sql.autoBroadcastJoinThreshold", None),
    "dynamic_partition_pruning": (
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", None),
    "collect_statistics": ("spark.sql.cbo.enabled", None),
    "max_partition_bytes": ("spark.sql.files.maxPartitionBytes", None),
}


def apply_performance_confs(spark, perf: dict | None) -> dict[str, str]:
    """Wire the config's performance block into runtime-settable Spark
    confs. Returns the confs applied (for lineage/audit)."""
    applied: dict[str, str] = {}
    for key, value in (perf or {}).items():
        if key not in _PERF_CONF_MAP:
            continue
        conf, _ = _PERF_CONF_MAP[key]
        sval = str(value).lower() if isinstance(value, bool) else str(value)
        try:
            spark.conf.set(conf, sval)
            applied[conf] = sval
        except Exception:
            # static confs (e.g. at session-build time only) are skipped
            pass
    return applied


def prepare_config(
    base: dict,
    env_overlay: dict | None = None,
    env: dict[str, str] | None = None,
) -> dict:
    """Full config pipeline: overlay → expand → migrate → validate —
    the same order as ``enhanced_config_loader.py:74-138``."""
    cfg = merge_environment(base, env_overlay or {})
    cfg = expand_env_vars(cfg, env)
    cfg = migrate_config(cfg)
    return validate_config(cfg)
