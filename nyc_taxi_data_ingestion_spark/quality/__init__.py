from nyc_taxi_data_ingestion_spark.quality.checks import (
    Check,
    NullCheck,
    PositiveCheck,
    RangeCheck,
    SetCheck,
    run_checks,
)
from nyc_taxi_data_ingestion_spark.quality.expectations import (
    Expectation,
    run_expectations,
)
from nyc_taxi_data_ingestion_spark.quality.ge_adapter import (
    run_with_great_expectations,
    to_ge_call,
)
from nyc_taxi_data_ingestion_spark.quality.metrics import quality_score
from nyc_taxi_data_ingestion_spark.quality.observe import (
    attach,
    standard_metrics,
    write_observed,
)

__all__ = [
    "Check",
    "Expectation",
    "NullCheck",
    "PositiveCheck",
    "RangeCheck",
    "SetCheck",
    "attach",
    "quality_score",
    "standard_metrics",
    "write_observed",
    "run_checks",
    "run_expectations",
    "run_with_great_expectations",
    "to_ge_call",
]
