"""Source operators (SURVEY §2.1 S1-S7, S10, S14).

The reference's Bronze layer fetches HTTP parquet/CSV into pandas in the
driver process, chunked at 50k rows to avoid OOM
(``ingest_to_iceberg.py:239-298,479-515``). In Spark that entire
machinery collapses into declarative reads — distributed, columnar,
with pushdown — so these functions are thin, and exist to carry the
reference's *semantics* (metadata columns, all-null drop, partition
injection) rather than its mechanics.
"""

from __future__ import annotations

import os
import tempfile
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S1/S10 — parquet scan. Catalyst gives pushdown + pruning for free
    (the reference's pyiceberg ``row_filter`` scan, S14, is subsumed by
    ``.filter`` on this DataFrame)."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    """S2 — CSV source (reference data, e.g. the 265-row zones dim).
    Explicit schema preferred; inference only for ad-hoc use."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_http(
    spark: SparkSession,
    url: str,
    fmt: str = "parquet",
    staging_dir: str | None = None,
) -> DataFrame:
    """S1/S2 — HTTP source via download-to-staging (Spark cannot scan
    http:// directly; parity with ``ingest_to_iceberg.py:239-298``).

    At cluster scale the staging dir should be shared storage (S3/HDFS);
    the download itself is inherently single-stream — the reference has
    the same property.
    """
    staging_dir = staging_dir or tempfile.mkdtemp(prefix="http_staging_")
    local = os.path.join(staging_dir, os.path.basename(url.split("?")[0]))
    urllib.request.urlretrieve(url, local)  # noqa: S310
    df = read_parquet(spark, local) if fmt == "parquet" else read_csv(spark, local)
    return add_ingestion_metadata(df, source=url)


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan across files with DRIFTED schemas
    (``mergeSchema=true``): the union of all file schemas, missing
    columns NULL per file — how a month-partitioned Bronze table whose
    upstream added columns over time reads as one frame. Costs a
    footer read per file at planning (why it is not the default);
    pair with ``operators.transform.conform_schema`` to pin the result
    to the declared table schema."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = "_corrupt_record",
) -> DataFrame:
    """JSON-Lines source (extension): the interchange format every
    LLM-corpus pipeline ingests (one JSON document per line — WebText,
    Dolma, FineWeb all ship this way). Schema is REQUIRED: on a 100 TB
    corpus, inference means one full extra read just to guess types —
    and a wrong guess on a sparse field. ``PERMISSIVE`` mode lands
    malformed lines in ``corrupt_col`` instead of failing the job
    (route them to the Q15 error sink); pass mode="FAILFAST" for
    strict ingestion. JSONL splits by line, so Spark parallelizes a
    single huge file fine — unlike multiline JSON, which is
    one-task-per-file (never ship multiline at scale)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if corrupt_col and mode.upper() == "PERMISSIVE":
        if corrupt_col not in [f.name for f in schema.fields]:
            schema = schema.add(corrupt_col, T.StringType())
    reader = spark.read.schema(schema).option("mode", mode)
    if corrupt_col:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (extension; Spark-native — same pushdown/pruning
    contract as parquet: predicate pushdown into stripe/row-group
    stats, column projection into the reader schema). Interchange
    format for Hive-era lakes a migration would ingest from."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """ORC sink (extension). zstd default — best size/speed on modern
    Spark; partitioning mirrors the parquet sinks."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
) -> None:
    """JSON-Lines sink (extension): export a curated corpus in the
    format training loaders consume. Compressed shards; one file per
    partition — pair with ``repartition(n)``/``token_shards`` upstream
    to control shard count and size."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jdbc(
    spark: SparkSession, url: str, table: str, properties: dict | None = None
) -> DataFrame:
    """S4 — JDBC source (reference declares Postgres, raises
    NotImplementedError — ``ingest_to_iceberg.py:305-308``; legacy
    SQLAlchemy path in ``src/config_loader.py``). Needs the JDBC driver
    jar on the classpath; partition options recommended at scale."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def add_ingestion_metadata(df: DataFrame, source: str) -> DataFrame:
    """S6 — `_ingestion_timestamp` + `_source_file` metadata columns
    (parity: ``ingest_to_iceberg.py:281-284``)."""
    return df.withColumns(
        {
            "_ingestion_timestamp": F.current_timestamp(),
            "_source_file": F.lit(source),
        }
    )


def inject_partition_columns(df: DataFrame, year: int, month: int) -> DataFrame:
    """S7 — literal year/month partition columns
    (parity: ``ingest_to_iceberg.py:287-290``)."""
    return df.withColumns({"year": F.lit(year), "month": F.lit(month)})


def drop_all_null_columns(df: DataFrame) -> DataFrame:
    """S5 — drop columns where every value is NULL
    (parity: ``ingest_to_iceberg.py:276-279``).

    One aggregate pass computes all per-column non-null counts (the
    reference does a pandas full-frame isna scan; here it's a single
    distributed job regardless of column count)."""
    counts = df.agg(
        *[F.count(F.col(c)).alias(c) for c in df.columns]
    ).first()
    dead = [c for c in df.columns if counts[c] == 0]
    return df.drop(*dead) if dead else df


# -- testdata access --------------------------------------------------------

_NANO_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a synthetic testdata table, normalizing the event-time column
    to plain TIMESTAMP regardless of how the generator wrote it.

    Two generator variants exist: TIMESTAMP(NANOS) (Spark 4 rejects it
    unless read as long; values are microsecond-aligned so ``div 1000``
    is lossless) and plain ``timestamp[us]`` with isAdjustedToUTC=false,
    which Spark 4 infers as TIMESTAMP_NTZ — a type the streaming
    watermark rejects (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). The session
    timezone is pinned UTC (session.py), so casting NTZ → TIMESTAMP
    preserves every value.
    """
    from nyc_taxi_data_ingestion_spark.session import ensure_package_shipped

    # every registry query reads through here — ship the package to the
    # workers once so UDF closures unpickle under ANY driver cwd
    ensure_package_shipped(spark)
    nano_cols = _NANO_TS_COLS.get(name, [])
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in nano_cols:
        dt = dict(df.dtypes).get(c)
        if dt == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df
