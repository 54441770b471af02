"""Sink operators (SURVEY §2.1 S8-S13, S15 analogue; §2.11 M1/M2).

The reference writes through pyiceberg (Bronze, chunked appends —
``ingest_to_iceberg.py:459-515``) and Spark+Iceberg (Silver overwrite —
``bronze_to_silver.py:469-489``; Gold CTAS — ``build_gold_layer.py``).
Here everything is Spark's distributed Parquet writer: chunking is
unnecessary (executors write partitions in parallel), and Iceberg's
MERGE-incremental materialization (M1) becomes dynamic partition
overwrite — only the (year, month) partitions touched by the lookback
window are rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    bloom_cols: dict[str, int] | None = None,
) -> None:
    """S8/S11 — partitioned parquet write (Hive-style layout → static
    partition pruning on read). Overwrite gives the reference's
    idempotent-rerun semantics (``bronze_to_silver.py:469-489``).

    ``bloom_cols`` ({column: expected_ndv}) writes a parquet bloom
    filter per row group for those columns — the layout knob for POINT
    lookups on high-cardinality columns the sort order doesn't cover
    (user_id probes on a time-clustered 100 TB table): min/max stats
    can't prune what every row group's range contains, but a bloom
    filter rules out row groups that definitely lack the key.
    parquet-mr readers (Spark included) apply them to pushed equality
    predicates; sizing is ~1.2 MB per 10⁶ NDV per row group."""
    writer = df.write.mode(mode)
    for col, ndv in (bloom_cols or {}).items():
        writer = writer.option(
            f"parquet.bloom.filter.enabled#{col}", "true"
        ).option(f"parquet.bloom.filter.expected.ndv#{col}", str(ndv))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def append_table(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S9/S13 — append sink (lineage/error event tables)."""
    write_partitioned(df, path, partition_by or [], mode="append")


def overwrite_partitions(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_by: list[str],
) -> None:
    """M1 — incremental materialization without MERGE: dynamic partition
    overwrite replaces exactly the partitions present in ``df`` and
    leaves the rest of the table intact.

    This is the Parquet-native equivalent of the reference's dbt
    merge-incremental with 7-day lookback (``daily_trip_stats.sql:1-11``):
    the caller computes the lookback slice; only affected (year, month)
    partitions are rewritten. Equivalence `incremental == full recompute`
    is asserted in tests.
    """
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> int:
    """S15 analogue — small-file compaction (the reference calls Iceberg's
    ``rewrite_data_files`` — ``scripts/iceberg_maintenance.py:97-174``).

    Rewrites the dataset into ~`target_file_bytes` files. Returns the
    number of output partitions chosen. Uses a size estimate from the
    input files; at scale run per-partition to bound memory.

    LOCAL-FILESYSTEM ONLY: the size probe and directory swap below use
    os/glob/rename, which have no meaning on object storage. On
    S3/HDFS, compaction belongs to the table format's transactional
    rewrite (Iceberg ``rewrite_data_files`` / Delta OPTIMIZE — exactly
    what the reference's maintenance script calls); a plain-parquet
    directory cannot be swapped atomically there at all.

    Swap order keeps the data recoverable at every step: write tmp →
    rename live dir ASIDE → promote tmp → delete old. A crash before
    the promote leaves the original (possibly under the *_old name);
    never a window where both copies are gone.
    """
    import glob
    import os
    import shutil

    size = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    n = max(1, round(size / target_file_bytes))
    df = spark.read.parquet(path)
    base = path.rstrip("/")
    tmp, old = base + "__compact_tmp", base + "__compact_old"
    write_partitioned(df.repartition(n), tmp, partition_by or [])
    if os.path.exists(old):  # leftover from an interrupted earlier run
        shutil.rmtree(old)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)  # roll back — original promoted back intact
        raise
    shutil.rmtree(old)
    return n


def create_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S8/S12 — saveAsTable (CTAS analogue) into the session catalog.
    ``CREATE DATABASE IF NOT EXISTS`` for namespaced names."""
    if "." in name:
        db = name.rsplit(".", 1)[0]
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    writer = df.write.mode(mode).format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(name)


def create_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed CTAS: co-locate a table on its join/aggregation key so
    downstream equi-joins and groupBys on ``bucket_cols`` read
    pre-shuffled data — NO Exchange in the plan (asserted by
    ``test_plan_quality``). The 100 TB pattern for repeated fact-fact
    joins (e.g. lineitem ⋈ orders on orderkey every run): pay the
    shuffle once at write time, never again at read time. Sorted
    buckets additionally enable merge-join without a sort step.

    Spark buckets are hash(key) mod n files per partition; both sides
    of a join must be bucketed into the SAME number of buckets for the
    exchange to be elided."""
    if "." in name:
        db = name.rsplit(".", 1)[0]
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    partition_by: list[str] | None = None,
) -> None:
    """Row-level MERGE (upsert) on plain parquet — the semantics the
    reference DECLARES via dbt ``incremental_strategy='merge'`` +
    ``unique_key`` (``daily_trip_stats.sql:1-11``) but delegates to
    Iceberg. Without a transactional table format, MERGE becomes:
    read target ∪ updates → keep the highest-``order_col`` row per key
    (updates win ties) → rewrite via the same crash-recoverable
    directory swap compaction uses.

    Scale notes: this rewrites the WHOLE table — correct and simple,
    and the right call when updates touch most partitions. When they
    don't, ``overwrite_partitions`` (M1) already restricts the rewrite
    to touched partitions; and at real 100 TB scale row-level MERGE
    belongs to Iceberg/Delta's transactional MERGE INTO (copy-on-write
    planning prunes untouched files), which this function's contract
    mirrors 1:1 — same keys, same last-writer-wins. LOCAL-FILESYSTEM
    ONLY for the same reason as ``compact_parquet_dir``.
    """
    import os
    import shutil

    from nyc_taxi_data_ingestion_spark.operators.transform import (
        dedupe_keep_first,
    )

    # tie-breakers are ascending: updates carry the LOWER marker so
    # they win against existing rows at equal order values
    upd = updates.withColumn("__upd", F.lit(0))
    if os.path.exists(target_path):
        tgt = spark.read.parquet(target_path).withColumn("__upd", F.lit(1))
        merged_src = tgt.unionByName(upd)
    else:
        merged_src = upd
    merged = dedupe_keep_first(
        merged_src, keys, order_by=f"{order_col} DESC", tie_breakers=["__upd"]
    ).drop("__upd")

    base = target_path.rstrip("/")
    tmp, old = base + "__merge_tmp", base + "__merge_old"
    write_partitioned(merged, tmp, partition_by or [])
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(target_path):
        os.rename(target_path, old)
    try:
        os.rename(tmp, target_path)
    except OSError:
        if os.path.exists(old):
            os.rename(old, target_path)
        raise
    if os.path.exists(old):
        shutil.rmtree(old)


def zorder_key(
    cols: list[str],
    bounds: dict[str, tuple[float, float]],
    bits: int = 16,
):
    """Z-order (Morton) curve key for multi-dimensional data layout:
    each column is scaled to a ``bits``-bit integer against FIXED
    caller-supplied bounds, then the columns' bits are interleaved into
    one long. Sorting by this key clusters rows that are close in ALL
    dimensions, so parquet row-group min/max stats prune selective
    filters on ANY of the columns — single-column sort layouts only
    skip on the leading column. Same technique Delta/Iceberg expose as
    OPTIMIZE ZORDER BY; here it is a pure Catalyst column expression
    (shift/or/comparison — whole-stage-codegen friendly, no UDF).

    Bounds are explicit because deriving them costs a scan and makes
    the layout data-dependent; clamping handles outliers. 2-3 columns
    at 16 bits is the sweet spot (more dims dilute per-dim locality).
    """
    assert len(cols) * bits <= 63, "interleaved key must fit a signed long"
    scaled = []
    for c in cols:
        lo, hi = bounds[c]
        frac = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(
            float(hi - lo)
        )
        clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
        scaled.append(
            F.least(
                F.floor(clamped * (1 << bits)).cast("long"),
                F.lit((1 << bits) - 1),
            )
        )
    key = F.lit(0).cast("long")
    for bit in range(bits - 1, -1, -1):
        for s in scaled:
            key = F.shiftleft(key, 1).bitwiseOR(
                F.shiftright(s, bit).bitwiseAND(F.lit(1).cast("long"))
            )
    return key


def zorder_key_quantile(df: DataFrame, cols: list[str], bits: int = 8):
    """Quantile-quantized Z-order key: like :func:`zorder_key` but each
    column is rank-quantized against its own quantile-sketch boundaries
    (ONE ``percentile_approx`` row for all columns, broadcast) instead
    of fixed caller bounds — skewed distributions still fill every
    level, and no caller needs to know the data's range. Costs one
    sketch aggregate over the input (a write-once price); the
    fixed-bounds form stays preferable when the layout must be
    DATA-INDEPENDENT (stable across incremental writes). Returns ``df``
    with a ``__zkey`` column; NULLs quantize to level 0."""
    assert 1 <= len(cols) <= 6 and bits * len(cols) <= 63
    levels = 1 << bits
    fr = F.array(*[F.lit(i / levels) for i in range(1, levels)])
    bounds = df.agg(
        *[
            F.percentile_approx(
                F.col(c).cast("double"), fr, F.lit(10000)
            ).alias(f"__bs{i}")
            for i, c in enumerate(cols)
        ]
    )
    out = df.crossJoin(F.broadcast(bounds))
    for i, c in enumerate(cols):
        v = F.col(c).cast("double")
        out = out.withColumn(
            f"__q{i}",
            F.coalesce(
                F.size(F.filter(f"__bs{i}", lambda b: b <= v)), F.lit(0)
            ).cast("long"),
        )
    k = F.lit(0).cast("long")
    for b in range(bits):
        for i in range(len(cols)):
            bit = F.shiftright(F.col(f"__q{i}"), b).bitwiseAND(F.lit(1))
            k = k.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return out.withColumn("__zkey", k).drop(
        *[f"__q{i}" for i in range(len(cols))],
        *[f"__bs{i}" for i in range(len(cols))],
    )


def clustered_plan(
    df: DataFrame,
    sort_cols: list[str] | None = None,
    zorder: tuple[list[str], dict[str, tuple[float, float]]] | None = None,
    zorder_auto: list[str] | None = None,
    target_files: int | None = None,
) -> DataFrame:
    """The layout-shaping half of :func:`write_clustered`, writer-free
    so any sink (plain parquet, snapshot commits) can cluster:
    range-repartition + sortWithinPartitions on exactly one of a linear
    sort key, a fixed-bounds Z-order key, or a quantile-quantized
    Z-order key. Returns the re-planned frame; the caller writes it."""
    assert (
        sum(x is not None for x in (sort_cols, zorder, zorder_auto)) == 1
    ), "exactly one of sort_cols / zorder / zorder_auto"
    made_zkey = False
    if zorder is not None:
        zcols, zbounds = zorder
        df = df.withColumn("__zkey", zorder_key(zcols, zbounds))
        keys = ["__zkey"]
        made_zkey = True
    elif zorder_auto is not None:
        df = zorder_key_quantile(df, zorder_auto)
        keys = ["__zkey"]
        made_zkey = True
    else:
        keys = list(sort_cols)
    if target_files:
        df = df.repartitionByRange(target_files, *keys)
    else:
        df = df.repartitionByRange(*keys)
    df = df.sortWithinPartitions(*keys)
    if made_zkey:
        # drop only the key WE created — a user column that happens to
        # be named __zkey on the sort_cols path must survive the write
        df = df.drop("__zkey")
        # the sort order survives the projection; files stay clustered
    return df


def write_clustered(
    df: DataFrame,
    path: str,
    sort_cols: list[str] | None = None,
    zorder: tuple[list[str], dict[str, tuple[float, float]]] | None = None,
    zorder_auto: list[str] | None = None,
    partition_by: list[str] | None = None,
    target_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Layout-optimized write: range-repartition + sortWithinPartitions
    so every output file covers a narrow, non-overlapping slice of the
    sort key — the precondition for parquet min/max data skipping.
    ``sort_cols`` gives linear clustering (best for one dominant filter
    column, e.g. time); ``zorder`` interleaves several filter columns
    against fixed caller bounds (data-independent layout);
    ``zorder_auto`` interleaves against quantile-sketch boundaries
    derived from the data (skew-robust, no bounds needed — see
    :func:`zorder_key_quantile`).

    At 100 TB this is the difference between "read 100 TB" and "read
    the 3 row groups whose [min,max] intersect the predicate": Spark's
    parquet reader prunes row groups from footer stats before Arrow
    ever materializes a page — but only if the writer clustered the
    data. repartitionByRange samples the key (one extra pass over the
    keys, not the payload) to build balanced ranges.
    """
    df = clustered_plan(
        df,
        sort_cols=sort_cols,
        zorder=zorder,
        zorder_auto=zorder_auto,
        target_files=target_files,
    )
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
