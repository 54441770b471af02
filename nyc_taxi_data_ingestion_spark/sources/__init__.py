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
from nyc_taxi_data_ingestion_spark.sources.snapshots import (
    ConcurrentSnapshotError,
    current_version,
    expire_snapshots,
    list_snapshots,
    read_snapshot,
    snapshot_compact,
    snapshot_delete,
    snapshot_merge,
    snapshot_write,
)

__all__ = [
    "ConcurrentSnapshotError",
    "add_ingestion_metadata",
    "append_table",
    "compact_parquet_dir",
    "current_version",
    "drop_all_null_columns",
    "expire_snapshots",
    "list_snapshots",
    "overwrite_partitions",
    "read_csv",
    "read_http",
    "read_jdbc",
    "read_parquet",
    "read_snapshot",
    "read_table",
    "snapshot_compact",
    "snapshot_delete",
    "snapshot_merge",
    "snapshot_write",
    "write_partitioned",
]
