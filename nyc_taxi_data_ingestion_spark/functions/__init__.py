from nyc_taxi_data_ingestion_spark.functions.numeric import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    exact_quantiles,
)

__all__ = ["davg", "davg_sql", "dsum", "dsum_sql", "exact_quantiles"]
