from nyc_taxi_data_ingestion_spark.sources.readers import (
    add_ingestion_metadata,
    drop_all_null_columns,
    read_csv,
    read_http,
    read_jdbc,
    read_parquet,
    read_table,
)
from nyc_taxi_data_ingestion_spark.sources.sinks import (
    append_table,
    compact_parquet_dir,
    overwrite_partitions,
    write_partitioned,
)

__all__ = [
    "add_ingestion_metadata",
    "append_table",
    "compact_parquet_dir",
    "drop_all_null_columns",
    "overwrite_partitions",
    "read_csv",
    "read_http",
    "read_jdbc",
    "read_parquet",
    "read_table",
    "write_partitioned",
]
