"""Sink / maintenance tests (S8-S13, S15 analogue, M1)."""

from __future__ import annotations

import pytest

import glob
import os

from pyspark.sql import functions as F

from nyc_taxi_data_ingestion_spark.sources.sinks import (
    compact_parquet_dir,
    overwrite_partitions,
    write_partitioned,
)


def test_compaction_preserves_data_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)  # fragment into 64 small files
    before = len(glob.glob(f"{path}/*.parquet"))
    total_before = spark.read.parquet(path).agg(F.sum("v")).first()[0]

    n = compact_parquet_dir(spark, path, target_file_bytes=10 * 1024 * 1024)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert after < before and after <= n + 1
    assert spark.read.parquet(path).agg(F.sum("v")).first()[0] == total_before
    assert spark.read.parquet(path).count() == 10_000


def test_overwrite_partitions_touches_only_affected(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "c", 30)], "p int, k string, v int"
    )
    write_partitioned(base, path, ["p"])

    patch = spark.createDataFrame([(1, "z", 99)], "p int, k string, v int")
    overwrite_partitions(spark, patch, path, ["p"])

    got = {(r.p, r.k, r.v) for r in spark.read.parquet(path).collect()}
    # partition p=1 replaced wholesale; p=2 untouched
    assert got == {(1, "z", 99), (2, "c", 30)}


def test_merge_upsert_last_writer_wins(spark, tmp_path):
    from nyc_taxi_data_ingestion_spark.sources.sinks import merge_upsert

    path = str(tmp_path / "tgt")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "k long, v string, ver long"
    )
    merge_upsert(spark, path, base, keys=["k"], order_col="ver")

    upd = spark.createDataFrame(
        [(2, "B2", 20),   # newer version → replaces
         (3, "C0", 5),    # OLDER version → must NOT replace
         (4, "d", 10)],   # new key → inserted
        "k long, v string, ver long",
    )
    merge_upsert(spark, path, upd, keys=["k"], order_col="ver")
    got = {r.k: (r.v, r.ver) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10), 2: ("B2", 20), 3: ("c", 10), 4: ("d", 10)}

    # equal-version tie: the update wins (MERGE INTO WHEN MATCHED)
    tie = spark.createDataFrame([(1, "A_TIE", 10)], "k long, v string, ver long")
    merge_upsert(spark, path, tie, keys=["k"], order_col="ver")
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got[1] == "A_TIE"

    # idempotent re-run: applying the same updates changes nothing
    merge_upsert(spark, path, tie, keys=["k"], order_col="ver")
    assert spark.read.parquet(path).count() == 4


@pytest.mark.slow
def test_write_clustered_enables_row_group_skipping(spark, sf_dir, tmp_path):
    """Clustered layout must shrink per-row-group key ranges so that a
    selective predicate intersects only a few row groups — measured
    directly from the parquet footers a reader would prune with."""
    import pyarrow.parquet as pq
    import glob

    from nyc_taxi_data_ingestion_spark.sources.readers import read_table
    from nyc_taxi_data_ingestion_spark.sources.sinks import write_clustered

    ev = read_table(spark, sf_dir, "events").select("user_id", "value", "event_id")

    def rg_ranges(path, col):
        out = []
        for f in glob.glob(path + "/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            for i in range(meta.num_row_groups):
                rg = meta.row_group(i)
                for j in range(rg.num_columns):
                    c = rg.column(j)
                    if c.path_in_schema == col and c.statistics is not None:
                        out.append((c.statistics.min, c.statistics.max))
        return out

    base = str(tmp_path / "plain")
    ev.repartition(8).write.parquet(base)  # hash layout: every file spans all
    lin = str(tmp_path / "linear")
    write_clustered(ev, lin, sort_cols=["user_id"], target_files=8)
    zod = str(tmp_path / "zorder")
    lo, hi = 0.0, 200.0
    write_clustered(
        ev, zod,
        zorder=(["user_id", "value"], {"user_id": (0, 2000), "value": (lo, hi)}),
        target_files=8,
    )

    users = [u for (u, _v) in rg_ranges(base, "user_id")]
    probe = sorted(users)[0]  # any real user id

    def touched(path, col, point):
        return sum(1 for (mn, mx) in rg_ranges(path, col) if mn <= point <= mx)

    # a point predicate on user_id touches every hash-layout row group,
    # but only a sliver of the clustered layouts
    n_base = touched(base, "user_id", probe)
    n_lin = touched(lin, "user_id", probe)
    n_zod = touched(zod, "user_id", probe)
    assert n_base >= 8, n_base
    assert n_lin <= 2, n_lin
    assert n_zod < n_base, (n_zod, n_base)
    # z-order also narrows the SECOND dimension, which linear can't
    v_spans_zod = [mx - mn for (mn, mx) in rg_ranges(zod, "value")]
    v_spans_lin = [mx - mn for (mn, mx) in rg_ranges(lin, "value")]
    assert sorted(v_spans_zod)[len(v_spans_zod) // 2] < sorted(v_spans_lin)[
        len(v_spans_lin) // 2
    ]


@pytest.mark.slow
def test_zorder_write_prunes_on_both_columns(spark, sf_dir, tmp_path):
    """Z-order layout must give BOTH participating columns selective
    per-file min/max stats: a point predicate on either column may
    overlap only a minority of files (a single-column sort would leave
    the other column's stats useless; a hash layout leaves both
    useless). Verified from real parquet footer statistics."""
    import pyarrow.parquet as pq

    from nyc_taxi_data_ingestion_spark.sources.readers import read_table
    from nyc_taxi_data_ingestion_spark.sources.sinks import write_clustered

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zdir = str(tmp_path / "z")
    write_clustered(
        li, zdir, zorder_auto=["l_partkey", "l_suppkey"], target_files=16
    )

    # round-trip fidelity
    back = spark.read.parquet(zdir)
    assert back.count() == li.count()

    import os

    files = [
        os.path.join(zdir, f)
        for f in os.listdir(zdir)
        if f.endswith(".parquet")
    ]
    assert len(files) >= 8

    def overlap_frac(col: str, value) -> float:
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            fmin, fmax = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics:
                        s = c.statistics
                        fmin = s.min if fmin is None else min(fmin, s.min)
                        fmax = s.max if fmax is None else max(fmax, s.max)
            if fmin is not None and fmin <= value <= fmax:
                hit += 1
        return hit / len(files)

    # median-ish probe values: worst case for pruning. Bound is 0.7,
    # not 0.5: with 16 z-range files a probe ideally overlaps ~4-6 but
    # range-sampler boundary jitter can cut mid-cell (observed 9/16);
    # the claim under test is that BOTH columns prune — an unclustered
    # or single-column-sorted layout overlaps ~100% of files on (at
    # least) one of them.
    probes = li.agg(
        *[
            F.percentile_approx(c, F.lit(0.5), F.lit(1000)).alias(c)
            for c in ("l_partkey", "l_suppkey")
        ]
    ).collect()[0]
    for col in ("l_partkey", "l_suppkey"):
        frac = overlap_frac(col, probes[col])
        assert frac <= 0.7, (col, frac)


@pytest.mark.slow
def test_catalog_survives_process_restart(tmp_path):
    """Persistent multi-session catalog (reference Hive metastore,
    ``bronze_to_silver.py:138-195``): a table created through
    sinks.create_table under durable_catalog_confs must be listable
    and readable from a COMPLETELY FRESH python process — metadata in
    the embedded Derby metastore, not the dying session's memory.
    Subprocess-isolated because one JVM allows one SparkContext and
    the shared test session must survive this test."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, {repo!r})
        from nyc_taxi_data_ingestion_spark.session import (
            durable_catalog_confs, get_spark,
        )
        from nyc_taxi_data_ingestion_spark.sources.sinks import create_table

        confs = durable_catalog_confs({wh!r}, {ms!r})
        phase = sys.argv[1]
        spark = get_spark(
            app_name="catalog-durability-" + phase,
            master="local[2]",
            extra_confs=confs,
        )
        if phase == "write":
            create_table(
                spark, spark.range(13).toDF("n"), "silver.t_durable"
            )
        else:
            assert [t.name for t in spark.catalog.listTables("silver")] == [
                "t_durable"
            ], "table metadata lost across processes"
            assert spark.table("silver.t_durable").count() == 13
        spark.stop()
        print("PHASE_OK", phase)
        """
    ).format(
        repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        wh=str(tmp_path / "warehouse"),
        ms=str(tmp_path / "metastore"),
    )
    for phase in ("write", "read"):
        out = subprocess.run(
            [sys.executable, "-c", script, phase],
            capture_output=True,
            text=True,
            timeout=300,
            cwd=str(tmp_path),  # derby.log lands here, not in the repo
        )
        assert out.returncode == 0, (phase, out.stdout[-2000:], out.stderr[-2000:])
        assert f"PHASE_OK {phase}" in out.stdout


def test_write_partitioned_bloom_filters(spark, tmp_path):
    """Bloom-filter options must reach the parquet writer (the filter
    is stored per row group and inflates the file by ~its bitset size
    — pyarrow does not expose bloom offsets, so size delta is the
    observable) and must not perturb the data read back."""
    import glob
    import os

    from nyc_taxi_data_ingestion_spark.sources.sinks import (
        write_partitioned,
    )

    df = spark.range(200_000).withColumnRenamed("id", "k").coalesce(1)
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloom")
    write_partitioned(df, plain, [])
    write_partitioned(df, bloomed, [], bloom_cols={"k": 200_000})

    size = lambda p: sum(  # noqa: E731
        os.path.getsize(f) for f in glob.glob(p + "/*.parquet")
    )
    # ndv=200k bloom bitset is ~200+ KB; plain file is well under that delta
    assert size(bloomed) > size(plain) + 100_000
    got = spark.read.parquet(bloomed).filter("k = 123456").collect()
    assert [r.k for r in got] == [123456]
    assert spark.read.parquet(bloomed).count() == 200_000


def test_durable_catalog_thrift_passthrough():
    """Cluster deployment path: metastore_uris wires the shared thrift
    service (the reference's hive-metastore compose service,
    bronze_to_silver.py:138-195) instead of embedded Derby. Service
    unreachable in-sandbox, so this checks conf assembly only — the
    S3/JDBC discipline. Derby stays the local default and the two are
    mutually exclusive (two different metastores)."""
    import pytest as _pytest

    from nyc_taxi_data_ingestion_spark.session import durable_catalog_confs

    confs = durable_catalog_confs(
        "/wh", metastore_uris="thrift://metastore:9083"
    )
    assert confs["spark.hadoop.hive.metastore.uris"] == (
        "thrift://metastore:9083"
    )
    assert confs["spark.sql.catalogImplementation"] == "hive"
    assert confs["spark.sql.warehouse.dir"] == "/wh"
    assert "spark.hadoop.javax.jdo.option.ConnectionURL" not in confs
    local = durable_catalog_confs("/wh", metastore_dir="/ms")
    assert "derby" in local["spark.hadoop.javax.jdo.option.ConnectionURL"]
    with _pytest.raises(ValueError, match="not both"):
        durable_catalog_confs("/wh", metastore_dir="/ms",
                              metastore_uris="thrift://m:9083")
