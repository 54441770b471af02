"""nyc_taxi_data_ingestion_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
medallion-lakehouse platform ``dumisanimagagula/nyc-taxi-data-ingestion``
(see SURVEY.md) as one idiomatic Spark engine:

- one engine (DataFrame/SQL/Catalyst) for Bronze/Silver/Gold instead of
  pandas+pyiceberg / PySpark / Trino+dbt;
- the reference's YAML pipeline spec re-imagined as a declarative
  compiler over DataFrame plans (``plans/``);
- the data-quality framework redesigned as single-pass aggregations
  (``quality/``);
- plus LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing) designed for 100 TB scale (``llm/``).

Nothing in this package is copied from the reference; citations in
docstrings are ``file:line`` pointers into ``/root/reference`` used only
to document behavioral parity.
"""

from nyc_taxi_data_ingestion_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
