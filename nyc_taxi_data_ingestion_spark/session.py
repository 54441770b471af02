"""SparkSession factory with the performance surface actually wired.

The reference declares a ``performance:`` config block (AQE, shuffle
partitions, broadcast threshold, CBO — ``lakehouse_config.yaml:336-373``)
but never plumbs it into the SparkSession (``bronze_to_silver.py:115-195``
sets only app name/master/memory/catalog). Here every declared knob
reaches a real Spark conf.

Scale notes (100 TB / 1000 executors):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting
  means we don't have to guess ``spark.sql.shuffle.partitions`` per SF.
- ``spark.sql.session.timeZone=UTC`` pins naive-timestamp semantics
  (the reference strips tzinfo on ingest — ``ingest_to_iceberg.py:282-283``).
- Arrow enabled for every pandas-interop boundary (LLM operators).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Declared-surface defaults, mirroring the reference's performance block
# (lakehouse_config.yaml:162-172,336-373) but actually applied.
_DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(100 * 1024 * 1024),  # 100 MB
    "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
    # runtime bloom-filter join pruning: for a selective join, the small
    # side's keys build a bloom filter that is pushed into the large
    # side's scan — at 100 TB this skips row groups the join would
    # discard anyway (complements static pushdown + DPP)
    # (runtimeFilter.semiJoinReduction.enabled hangs Spark 4.1 session
    # startup on this build — bloom pruning alone carries the benefit)
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python-datasource filter pushdown, set at BUILD time so it is not
    # a per-registration session-global surprise (see
    # sources/pydatasource.register_snapshot_format, which still sets
    # it at runtime as the vanilla-session fallback)
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.sql.parquet.compression.codec": "snappy",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": "32",
}


def s3_confs(
    access_key: str | None = None,
    secret_key: str | None = None,
    endpoint: str | None = None,
    path_style_access: bool = False,
    anonymous: bool = False,
    hadoop_aws_version: str | None = None,
) -> dict[str, str]:
    """S3 conf assembly (SURVEY §2.1 S3) — the hadoop-aws/s3a surface a
    cluster deployment needs to make ``spark.read.parquet("s3a://…")``
    work. Credentials default to the provider chain (instance profile /
    env vars), the right default on a real cluster; pass keys only for
    non-IAM endpoints (MinIO etc.). Returns plain confs for
    ``get_spark(extra_confs=…)`` — assembly is unit-testable with no
    network or jars."""
    confs: dict[str, str] = {
        "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
    }
    if hadoop_aws_version:
        confs["spark.jars.packages"] = (
            f"org.apache.hadoop:hadoop-aws:{hadoop_aws_version}"
        )
    if anonymous:
        confs["spark.hadoop.fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
        )
    if access_key:
        confs["spark.hadoop.fs.s3a.access.key"] = access_key
    if secret_key:
        confs["spark.hadoop.fs.s3a.secret.key"] = secret_key
    if endpoint:
        confs["spark.hadoop.fs.s3a.endpoint"] = endpoint
    if path_style_access:
        confs["spark.hadoop.fs.s3a.path.style.access"] = "true"
    return confs


def jdbc_confs(
    driver_packages: list[str] | None = None,
    driver_jars: list[str] | None = None,
) -> dict[str, str]:
    """JDBC conf assembly (SURVEY §2.1 S4) — puts the driver on the
    executor classpath so ``sources/readers.read_jdbc`` can load (e.g.
    ``["org.postgresql:postgresql:42.7.3"]`` for the reference's
    declared Postgres source)."""
    confs: dict[str, str] = {}
    if driver_packages:
        confs["spark.jars.packages"] = ",".join(driver_packages)
    if driver_jars:
        confs["spark.jars"] = ",".join(driver_jars)
    return confs


def durable_catalog_confs(
    warehouse_dir: str,
    metastore_dir: str | None = None,
    metastore_uris: str | None = None,
) -> dict[str, str]:
    """Persistent multi-session catalog confs (SURVEY §1.4; the
    reference's Hive-metastore catalog —
    ``silver/jobs/bronze_to_silver.py:138-195`` configures
    ``hive.metastore.uris`` + warehouse). Tables created via
    ``sinks.create_table`` become durable ACROSS SparkSessions and
    processes: metadata lives in a Hive metastore instead of the
    default in-memory session catalog.

    Two deployments, one conf surface:

    - **Local/CI** — ``metastore_dir``: an embedded Derby database (no
      external service; SINGLE WRITER at a time — Derby takes an
      exclusive db.lck, so concurrent sessions must share one
      metastore-owning process, same bound as spark-shell's default).
      Cross-process durability is proven in ``tests/test_sinks.py``
      (write in one python process, read from a fresh one).
    - **Cluster** — ``metastore_uris``: the shared thrift Hive
      metastore service (the reference's deployment —
      ``bronze_to_silver.py:138-195`` + the docker-compose
      hive-metastore), e.g. ``"thrift://metastore:9083"``.
      Multi-writer semantics come from the service; everything else
      (create_table, scans, partition specs) is identical. Unreachable
      in this sandbox, so only conf assembly is tested — like S3/JDBC.

    Passing both is a contradiction (two different metastores) and
    raises. Pass the result to ``get_spark(extra_confs=...)``.
    """
    if metastore_dir and metastore_uris:
        raise ValueError(
            "pass metastore_dir (embedded Derby) OR metastore_uris "
            "(shared thrift service), not both"
        )
    confs = {
        "spark.sql.warehouse.dir": warehouse_dir,
        "spark.sql.catalogImplementation": "hive",
    }
    if metastore_dir:
        confs["spark.hadoop.javax.jdo.option.ConnectionURL"] = (
            f"jdbc:derby:;databaseName={metastore_dir};create=true"
        )
    if metastore_uris:
        confs["spark.hadoop.hive.metastore.uris"] = metastore_uris
    return confs


def _merge_confs(*conf_dicts: dict[str, str] | None) -> dict[str, str]:
    """Later dicts win, except ``spark.jars.packages``/``spark.jars``
    which are additive (S3 + JDBC must coexist)."""
    merged: dict[str, str] = {}
    for d in conf_dicts:
        for k, v in (d or {}).items():
            if k in ("spark.jars.packages", "spark.jars") and k in merged:
                parts = merged[k].split(",") + v.split(",")
                merged[k] = ",".join(dict.fromkeys(parts))
            else:
                merged[k] = v
    return merged


def get_spark(
    app_name: str = "nyc_taxi_data_ingestion_spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
    s3: dict[str, str] | None = None,
    jdbc: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's default confs.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster the caller passes the cluster master / relies on spark-submit.
    ``s3``/``jdbc`` take the outputs of :func:`s3_confs` /
    :func:`jdbc_confs`; ``extra_confs`` overrides any default.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"

    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(_DEFAULT_CONFS)
    if master.startswith("local"):
        confs.setdefault("spark.driver.memory", "24g")
        # Long-lived local sessions compile one generated class per
        # (query, stage); past ~240 MB (the JVM default) the code cache
        # fills, the JIT shuts off, and codegen-heavy queries late in
        # the session run interpreted at 5-10x cost. In local mode the
        # driver IS the executor, so size its cache for a whole
        # bench/test session worth of generated code.
        confs.setdefault(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
    confs = _merge_confs(confs, s3, jdbc, extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make this package importable by Python workers regardless of the
    driver's cwd/sys.path: zip the package tree once and ``addPyFile``
    it to the running context.

    The driver contract hands us a VANILLA session built by an external
    harness — its worker processes inherit neither our sys.path edit
    nor the repo cwd, so any Arrow/Pandas UDF whose closure references
    a module function would die with ModuleNotFoundError on unpickle.
    This is also exactly how the package ships to a real cluster
    (spark-submit --py-files equivalent, done programmatically). The
    zip is content-addressed (md5 of file names+mtimes+sizes) and
    cached in the system tempdir; shipping is once per SparkContext
    (attribute guard) and a no-op re-add is tolerated."""
    sc = spark.sparkContext
    if getattr(sc, "_nyc_pkg_shipped", False):
        return
    import hashlib
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    entries = []
    for root, _dirs, files in os.walk(pkg_dir):
        for f in sorted(files):
            if f.endswith(".py"):
                p = os.path.join(root, f)
                st = os.stat(p)
                entries.append(f"{os.path.relpath(p, pkg_dir)}:{st.st_mtime_ns}:{st.st_size}")
    digest = hashlib.md5("\n".join(sorted(entries)).encode()).hexdigest()[:16]
    zpath = os.path.join(
        tempfile.gettempdir(), f"nyc_taxi_data_ingestion_spark_{digest}.zip"
    )
    if not os.path.exists(zpath):
        # per-process tmp name: a SHARED tmp path lets two concurrent
        # processes interleave writes to one inode and os.replace then
        # publishes a corrupt zip (the replace is atomic, the write is
        # not exclusive — r3 advice)
        fd, tmp = tempfile.mkstemp(
            suffix=".tmp", prefix=os.path.basename(zpath) + ".",
            dir=os.path.dirname(zpath),
        )
        try:
            with os.fdopen(fd, "wb") as fh, zipfile.ZipFile(
                fh, "w", zipfile.ZIP_DEFLATED
            ) as z:
                for root, _dirs, files in os.walk(pkg_dir):
                    for f in sorted(files):
                        if f.endswith(".py"):
                            p = os.path.join(root, f)
                            arc = os.path.join(
                                os.path.basename(pkg_dir),
                                os.path.relpath(p, pkg_dir),
                            )
                            z.write(p, arc)
            os.replace(tmp, zpath)  # atomic publish
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
    sc.addPyFile(zpath)
    sc._nyc_pkg_shipped = True


TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> dict:
    """Load the synthetic testdata parquet tables and register temp views."""
    from nyc_taxi_data_ingestion_spark.sources.readers import read_table

    out = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
