"""JSON-Schema (draft-07 subset) config validation.

Parity: the reference validates configs against
``config/schemas/lakehouse_config_schema_v1.json`` with the ``jsonschema``
package (``src/config_validator.py:68-108``: version auto-detection from
``config["version"]``, ``v1.0`` → ``v1`` normalization, ``iter_errors``
collecting ``path: message`` strings). That dependency isn't available
here, so the subset the reference's schema actually uses is implemented
directly: ``type``, ``required``, ``properties``,
``additionalProperties`` (bool or schema), ``enum``, ``pattern``,
``minLength``/``maxLength``, ``minimum``/``maximum``, ``items``,
``minItems``, and light ``format`` checks (email / uri).

The schema instance here (`PIPELINE_SCHEMA_V2`) describes THIS engine's
config shape (``plans/config.py`` module docstring), carrying over the
reference's enum semantics (storage formats, check types, source types).
"""

from __future__ import annotations

import re
from typing import Any

_FORMAT_RES = {
    "email": re.compile(r"^[^@\s]+@[^@\s]+\.[^@\s]+$"),
    "uri": re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://\S+$"),
}

_TYPE_CHECKS = {
    "object": lambda v: isinstance(v, dict),
    "array": lambda v: isinstance(v, list),
    "string": lambda v: isinstance(v, str),
    # bool is an int subclass in Python; JSON Schema says it is NOT a number
    "number": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "integer": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "boolean": lambda v: isinstance(v, bool),
    "null": lambda v: v is None,
}


def iter_schema_errors(
    instance: Any, schema: dict, path: str = "root"
) -> list[str]:
    """Validate ``instance`` against a draft-07-subset ``schema``;
    returns ``"<path>: <message>"`` strings (the reference's
    ``get_validation_errors`` shape), empty when valid."""
    errs: list[str] = []

    typ = schema.get("type")
    if typ is not None:
        allowed = typ if isinstance(typ, list) else [typ]
        if not any(_TYPE_CHECKS[t](instance) for t in allowed if t in _TYPE_CHECKS):
            errs.append(
                f"{path}: {instance!r} is not of type "
                + ", ".join(f"'{t}'" for t in allowed)
            )
            return errs  # further keyword checks assume the right type

    if "enum" in schema and instance not in schema["enum"]:
        errs.append(f"{path}: {instance!r} is not one of {schema['enum']}")

    if isinstance(instance, str):
        if "pattern" in schema and not re.search(schema["pattern"], instance):
            errs.append(
                f"{path}: {instance!r} does not match {schema['pattern']!r}"
            )
        if "minLength" in schema and len(instance) < schema["minLength"]:
            errs.append(f"{path}: {instance!r} is shorter than {schema['minLength']}")
        if "maxLength" in schema and len(instance) > schema["maxLength"]:
            errs.append(f"{path}: {instance!r} is longer than {schema['maxLength']}")
        fmt = schema.get("format")
        if fmt in _FORMAT_RES and not _FORMAT_RES[fmt].match(instance):
            errs.append(f"{path}: {instance!r} is not a {fmt!r}")

    if isinstance(instance, (int, float)) and not isinstance(instance, bool):
        if "minimum" in schema and instance < schema["minimum"]:
            errs.append(f"{path}: {instance} is less than the minimum of {schema['minimum']}")
        if "maximum" in schema and instance > schema["maximum"]:
            errs.append(f"{path}: {instance} is greater than the maximum of {schema['maximum']}")

    if isinstance(instance, dict):
        for req in schema.get("required", []):
            if req not in instance:
                errs.append(f"{path}: {req!r} is a required property")
        props = schema.get("properties", {})
        for key, sub in props.items():
            if key in instance:
                errs.extend(iter_schema_errors(instance[key], sub, f"{path} -> {key}"))
        addl = schema.get("additionalProperties")
        if addl is not None:
            for key in instance:
                if key in props:
                    continue
                if addl is False:
                    errs.append(f"{path}: additional property {key!r} is not allowed")
                elif isinstance(addl, dict):
                    errs.extend(
                        iter_schema_errors(instance[key], addl, f"{path} -> {key}")
                    )

    if isinstance(instance, list):
        if "minItems" in schema and len(instance) < schema["minItems"]:
            errs.append(f"{path}: has fewer than {schema['minItems']} items")
        items = schema.get("items")
        if isinstance(items, dict):
            for i, v in enumerate(instance):
                errs.extend(iter_schema_errors(v, items, f"{path} -> {i}"))

    return errs


# -- this engine's pipeline-config schema ------------------------------------

_STORAGE_FORMATS = ["parquet", "orc", "avro", "csv", "json"]

PIPELINE_SCHEMA_V2: dict = {
    "title": "Pipeline Configuration Schema v2",
    "type": "object",
    "required": ["pipeline", "source"],
    "properties": {
        "version": {"type": "string", "pattern": r"^v?[0-9]+\.[0-9]+(\.[0-9]+)?$"},
        "pipeline": {
            "type": "object",
            "required": ["name"],
            "properties": {
                "name": {"type": "string", "minLength": 1},
                "description": {"type": "string"},
                "owner": {"type": "string", "format": "email"},
                "schedule": {"type": "string"},
                "enabled": {"type": "boolean"},
            },
        },
        "source": {
            "type": "object",
            "properties": {
                "table": {"type": "string"},
                "path": {"type": "string"},
                "format": {"type": "string", "enum": ["parquet", "csv", "jdbc", "http", "json", "orc", "kafka", "rate"]},
                "options": {"type": "object", "additionalProperties": {"type": ["string", "number", "boolean"]}},
                # streaming (kafka) source surface — the reference's
                # schema enumerates `kafka` but its ingestor never
                # implements it; here it compiles (see plans/compiler.
                # read_stream_source)
                "topic": {"type": "string"},
                "bootstrap_servers": {"type": "string"},
                "starting_offsets": {"type": "string", "enum": ["earliest", "latest"]},
                "local_substitute": {
                    "type": "object",
                    "properties": {
                        "format": {"type": "string", "enum": ["rate", "parquet", "json"]},
                        "path": {"type": "string"},
                        "rows_per_second": {"type": "integer", "minimum": 1},
                        "key_column": {"type": "string"},
                        "timestamp_column": {"type": "string"},
                    },
                },
            },
        },
        "silver": {
            "type": "object",
            "properties": {
                "renames": {"type": "object", "additionalProperties": {"type": "string"}},
                "casts": {"type": "object", "additionalProperties": {"type": "string"}},
                "derived": {"type": "object", "additionalProperties": {"type": "string"}},
                "filters": {"type": "array", "items": {"type": "string"}},
                "dedupe": {
                    "type": "object",
                    "required": ["keys"],
                    "properties": {
                        "keys": {"type": "array", "items": {"type": "string"}, "minItems": 1},
                        "order_by": {"type": "string"},
                        "tie_breakers": {"type": "array", "items": {"type": "string"}},
                    },
                },
                "partition_by": {"type": "array", "items": {"type": "string"}},
                "storage": {
                    "type": "object",
                    "properties": {
                        "format": {"type": "string", "enum": _STORAGE_FORMATS},
                        "compression": {"type": "string", "enum": ["snappy", "gzip", "lz4", "zstd", "none"]},
                    },
                },
            },
        },
        "curation": {
            "type": "object",
            "properties": {
                "id_column": {"type": "string"},
                "text_column": {"type": "string"},
                "stages": {
                    "type": "array",
                    "items": {
                        "type": "object",
                        "required": ["type"],
                        "properties": {
                            "type": {
                                "type": "string",
                                "enum": [
                                    "gopher_filter",
                                    "pii_redact",
                                    "quality_classifier",
                                    "exact_dedup",
                                    "line_dedup",
                                    "stratified_sample",
                                    "token_shards",
                                ],
                            },
                            "options": {"type": "object"},
                        },
                    },
                },
            },
        },
        "gold": {
            "type": "array",
            "items": {
                "type": "object",
                "required": ["name", "group_by", "measures"],
                "properties": {
                    "name": {"type": "string", "minLength": 1},
                    "group_by": {"type": "array", "items": {"type": "string"}, "minItems": 1},
                    "measures": {
                        "type": "array",
                        "minItems": 1,
                        "items": {
                            "type": "object",
                            "required": ["name", "expr"],
                            "properties": {
                                "name": {"type": "string"},
                                "expr": {"type": "string"},
                            },
                        },
                    },
                    "window": {
                        "type": "object",
                        "required": ["duration"],
                        "properties": {"duration": {"type": "string"}},
                    },
                    "grouping": {
                        "type": "string",
                        "enum": ["groupby", "rollup", "cube"],
                    },
                    "grouping_id_as": {"type": "string"},
                    "materialization": {"type": "string", "enum": ["full", "incremental"]},
                    "lookback": {
                        "type": "object",
                        "required": ["column", "days"],
                        "properties": {
                            "column": {"type": "string"},
                            "days": {"type": "integer", "minimum": 0},
                        },
                    },
                    "partition_by": {"type": "array", "items": {"type": "string"}},
                },
            },
        },
        "streaming": {
            "type": "object",
            "properties": {
                "watermark": {
                    "type": "object",
                    "required": ["column", "delay"],
                    "properties": {
                        "column": {"type": "string"},
                        "delay": {"type": "string"},
                    },
                },
                "value_schema": {"type": "string"},
                "dedupe_within_watermark": {"type": "boolean"},
            },
        },
        "quality": {
            "type": "object",
            "properties": {
                "enabled": {"type": "boolean"},
                "fail_on_error": {"type": "boolean"},
                "min_quality_score": {"type": "number", "minimum": 0, "maximum": 100},
                "checks": {
                    "type": "array",
                    "items": {
                        "type": "object",
                        "required": ["type"],
                        "properties": {
                            "type": {
                                "type": "string",
                                "enum": [
                                    "null_check",
                                    "range_check",
                                    "uniqueness_check",
                                    "positive_values",
                                    "custom",
                                ],
                            },
                            "column": {"type": "string"},
                            "columns": {"type": "array", "items": {"type": "string"}},
                            "min": {"type": "number"},
                            "max": {"type": "number"},
                        },
                    },
                },
            },
        },
        "performance": {
            "type": "object",
            "properties": {
                "adaptive_query_execution": {"type": "boolean"},
                "shuffle_partitions": {"type": "integer", "minimum": 1},
                "broadcast_threshold": {"type": ["integer", "string"]},
                "dynamic_partition_pruning": {"type": "boolean"},
                "collect_statistics": {"type": "boolean"},
                "max_partition_bytes": {"type": ["integer", "string"]},
            },
        },
    },
}


class SchemaValidator:
    """Versioned schema registry + validator (``src/config_validator.py``
    behavior: ``validate() -> bool``, ``get_validation_errors() ->
    list[str]``, ``'v1.0'``/``'1.0.0'`` → ``'v1'`` normalization)."""

    def __init__(self, schemas: dict[str, dict] | None = None) -> None:
        self._schemas = schemas if schemas is not None else {"v2": PIPELINE_SCHEMA_V2}

    @staticmethod
    def _normalize_version(version: str) -> str:
        return "v" + str(version).lower().lstrip("v").split(".")[0]

    def _schema_for(self, config: dict, version: str | None) -> tuple[str, dict | None]:
        v = self._normalize_version(version or config.get("version", "v2.0"))
        return v, self._schemas.get(v)

    def get_validation_errors(
        self, config: dict, version: str | None = None
    ) -> list[str]:
        v, schema = self._schema_for(config, version)
        if schema is None:
            return [f"No schema found for version {v}"]
        return iter_schema_errors(config, schema)

    def validate(self, config: dict, version: str | None = None) -> bool:
        return not self.get_validation_errors(config, version)

    def list_available_versions(self) -> list[str]:
        return list(self._schemas)
