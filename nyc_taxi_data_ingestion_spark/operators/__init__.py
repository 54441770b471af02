from nyc_taxi_data_ingestion_spark.operators.transform import (
    apply_transformations,
    cast_columns,
    dedupe_keep_first,
    derive_columns,
    filter_rows,
    rename_columns,
)

__all__ = [
    "apply_transformations",
    "cast_columns",
    "dedupe_keep_first",
    "derive_columns",
    "filter_rows",
    "rename_columns",
]
