from nyc_taxi_data_ingestion_spark.functions.numeric import (
    davg,
    dsum,
    dsum_sql,
    davg_sql,
)

__all__ = ["davg", "dsum", "dsum_sql", "davg_sql"]
