"""Declarative pipeline layer: config → validated plan → DataFrames.

The reference's de-facto query language is a 716-line YAML
(``config/pipelines/lakehouse_config.yaml``) interpreted by three
separate jobs (bronze ingestor, silver transformer, gold builder).
Here the same declarative surface compiles to a single lazy Catalyst
plan per layer (see ``compiler.py``), with the config machinery
(validation, environment overlay, ${ENV} expansion, version migration)
as plain engine-independent Python (``config.py``) and lineage capture
over the compiled plan (``lineage.py``).
"""

from nyc_taxi_data_ingestion_spark.plans.compiler import (  # noqa: F401
    PipelinePlan,
    compile_curation,
    compile_pipeline,
    compile_stream_pipeline,
    run_pipeline,
)
from nyc_taxi_data_ingestion_spark.plans.audit import (  # noqa: F401
    Finding,
    audit_plan,
)
from nyc_taxi_data_ingestion_spark.plans.inspect import (  # noqa: F401
    explain_formatted,
    plan_summary,
)
from nyc_taxi_data_ingestion_spark.plans.runner import (  # noqa: F401
    TaskResult,
    run_medallion,
)
from nyc_taxi_data_ingestion_spark.plans.config import (  # noqa: F401
    ConfigError,
    expand_env_vars,
    merge_environment,
    migrate_config,
    prepare_config,
    validate_config,
)
