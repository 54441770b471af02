"""Bronze source-operator tests (SURVEY §2.1 S1-S7).

Parity target: the reference's ingest chain
``bronze/ingestors/ingest_to_iceberg.py:239-298`` (HTTP fetch, CSV
parse, all-null drop :276-279, metadata columns :281-284, partition
injection :287-290).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nyc_taxi_data_ingestion_spark.sources.readers import (
    add_ingestion_metadata,
    drop_all_null_columns,
    inject_partition_columns,
    read_csv,
    read_http,
    read_parquet,
)


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "zones.csv"
    p.write_text(
        "zone_id,zone_name,borough\n"
        "1,Newark Airport,EWR\n"
        '2,"Jamaica, Bay",Queens\n'
        "3,Allerton,Bronx\n"
    )
    return str(p)


def test_read_csv_inference_and_quoting(spark, csv_file):
    df = read_csv(spark, csv_file)
    assert df.count() == 3
    assert dict(df.dtypes)["zone_id"] == "int"
    # quoted embedded comma survives parsing
    assert (
        df.filter(F.col("zone_id") == 2).first().zone_name == "Jamaica, Bay"
    )


def test_read_csv_explicit_schema(spark, csv_file):
    schema = T.StructType(
        [
            T.StructField("zone_id", T.LongType()),
            T.StructField("zone_name", T.StringType()),
            T.StructField("borough", T.StringType()),
        ]
    )
    df = read_csv(spark, csv_file, schema=schema)
    assert dict(df.dtypes)["zone_id"] == "bigint"
    assert df.count() == 3


def test_read_http_csv_file_url(spark, csv_file, tmp_path):
    staging = tmp_path / "staging"
    staging.mkdir()
    df = read_http(
        spark, f"file://{csv_file}", fmt="csv", staging_dir=str(staging)
    )
    # S6 metadata attached by the ingest path
    assert "_ingestion_timestamp" in df.columns
    assert "_source_file" in df.columns
    rows = df.collect()
    assert len(rows) == 3
    assert rows[0]._source_file == f"file://{csv_file}"
    # the payload actually landed in the provided staging dir
    assert os.listdir(str(staging)) == ["zones.csv"]


def test_read_http_parquet_file_url(spark, sf_dir, tmp_path):
    src = f"{sf_dir}/region.parquet"
    df = read_http(spark, f"file://{src}", staging_dir=str(tmp_path))
    assert df.count() == read_parquet(spark, src).count()


def test_drop_all_null_columns(spark):
    df = spark.createDataFrame(
        [(1, None, None, "a"), (2, None, None, None)],
        "id int, dead1 string, dead2 int, partial string",
    )
    out = drop_all_null_columns(df)
    # all-null columns dropped, partially-null kept (reference drops
    # only fully-empty columns, ingest_to_iceberg.py:276-279)
    assert out.columns == ["id", "partial"]


def test_drop_all_null_columns_noop(spark):
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    assert drop_all_null_columns(df) is df


def test_ingestion_metadata_and_partition_injection(spark):
    df = spark.createDataFrame([(1,)], "id int")
    out = inject_partition_columns(
        add_ingestion_metadata(df, source="s3://bucket/file.parquet"),
        year=2024,
        month=3,
    )
    row = out.first()
    assert row._source_file == "s3://bucket/file.parquet"
    assert row._ingestion_timestamp is not None
    assert (row.year, row.month) == (2024, 3)
    assert dict(out.dtypes)["_ingestion_timestamp"] == "timestamp"


def test_bronze_ingest_registry_query(spark, sf_dir):
    """The registered bronze_ingest chain (S1+S2+S5+S6+S7) round-trips
    the nation dim losslessly and drops the injected all-null column."""
    from nyc_taxi_data_ingestion_spark.queries import REGISTRY

    out = REGISTRY["bronze_ingest"].fn(spark, sf_dir)
    assert out.columns == [
        "n_nationkey",
        "n_name",
        "n_regionkey",
        "source_name",
        "year",
        "month",
    ]
    rows = out.collect()
    nation = read_parquet(spark, f"{sf_dir}/nation.parquet")
    assert len(rows) == nation.count()
    assert all(r.source_name == "nation.csv" for r in rows)
    got = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in rows}
    want = {
        (r.n_nationkey, r.n_name, r.n_regionkey) for r in nation.collect()
    }
    assert got == want


def test_s3_and_jdbc_conf_assembly():
    """S3/S4 — conf assembly is pure and unit-testable (no network)."""
    from nyc_taxi_data_ingestion_spark.session import (
        _merge_confs,
        jdbc_confs,
        s3_confs,
    )

    s3 = s3_confs(
        access_key="AK",
        secret_key="SK",
        endpoint="http://minio:9000",
        path_style_access=True,
        hadoop_aws_version="3.4.0",
    )
    assert s3["spark.hadoop.fs.s3a.access.key"] == "AK"
    assert s3["spark.hadoop.fs.s3a.secret.key"] == "SK"
    assert s3["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert s3["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert s3["spark.jars.packages"] == "org.apache.hadoop:hadoop-aws:3.4.0"
    # credentials default to the provider chain — no provider pinned
    assert "spark.hadoop.fs.s3a.aws.credentials.provider" not in s3_confs()
    anon = s3_confs(anonymous=True)
    assert anon["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "AnonymousAWSCredentialsProvider"
    )

    jdbc = jdbc_confs(driver_packages=["org.postgresql:postgresql:42.7.3"])
    assert jdbc["spark.jars.packages"] == "org.postgresql:postgresql:42.7.3"

    # packages are additive across sources, other keys last-wins
    merged = _merge_confs(s3, jdbc, {"spark.hadoop.fs.s3a.endpoint": "x"})
    assert merged["spark.jars.packages"] == (
        "org.apache.hadoop:hadoop-aws:3.4.0,org.postgresql:postgresql:42.7.3"
    )
    assert merged["spark.hadoop.fs.s3a.endpoint"] == "x"


def test_compact_swap_preserves_data(spark, tmp_path):
    """Compaction swap never leaves a window with no data: output equals
    input, and the aside/tmp dirs are cleaned up."""
    import os

    from nyc_taxi_data_ingestion_spark.sources.sinks import compact_parquet_dir

    path = str(tmp_path / "t")
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    # many small files
    df.repartition(16).write.parquet(path)
    n = compact_parquet_dir(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg(F.sum("v")).first()[0] == 999 * 1000
    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_old")


def test_jsonl_roundtrip_and_corrupt_capture(spark, sf_dir, tmp_path):
    """JSONL sink → source round-trip preserves the corpus exactly;
    malformed lines land in _corrupt_record instead of failing the
    read (PERMISSIVE), and FAILFAST raises."""
    import glob
    import gzip

    import pytest as _pytest

    from nyc_taxi_data_ingestion_spark.sources.readers import (
        read_jsonl,
        read_table,
    )
    from nyc_taxi_data_ingestion_spark.sources.readers import write_jsonl

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    out = str(tmp_path / "corpus")
    write_jsonl(docs.repartition(4), out)
    files = glob.glob(out + "/*.json.gz")
    assert len(files) == 4  # shard count follows partitioning

    schema = "doc_id BIGINT, lang STRING, source STRING, text STRING"
    back = read_jsonl(spark, out, schema)
    assert back.count() == docs.count()
    a = {tuple(r) for r in docs.collect()}
    b = {(r.doc_id, r.lang, r.source, r.text) for r in back.collect()}
    assert a == b

    # corrupt line handling
    bad = str(tmp_path / "bad")
    import os

    os.makedirs(bad)
    with open(bad + "/part-0.jsonl", "w") as f:
        f.write('{"doc_id": 1, "lang": "en", "source": "s", "text": "ok"}\n')
        f.write("{not json at all\n")
    perm = read_jsonl(spark, bad, schema)
    rows = perm.collect()
    assert len(rows) == 2
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(corrupt) == 1 and r"{not json" in corrupt[0]._corrupt_record
    with _pytest.raises(Exception):
        read_jsonl(spark, bad, schema, mode="FAILFAST").collect()


def test_orc_roundtrip_partitioned_with_pushdown(spark, sf_dir, tmp_path):
    from nyc_taxi_data_ingestion_spark.sources.readers import (
        read_orc,
        read_table,
        write_orc,
    )

    docs = read_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_orc")
    write_orc(docs, out, partition_by=["lang"])
    back = read_orc(spark, out)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)
    # partition pruning: a lang filter must reach PartitionFilters
    plan = (
        back.filter(back.lang == "en")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "lang" in plan
