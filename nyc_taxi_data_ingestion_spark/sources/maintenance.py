"""Dataset maintenance cycle (SURVEY §2.1 S15).

The reference runs a three-step Iceberg maintenance cycle per managed
table — compact data files, expire old snapshots, remove orphan files
(``scripts/iceberg_maintenance.py:97-216``), each step isolated so one
failure doesn't stop the cycle (``:199-214``).

Plain-parquet analogues:

- **compact**  → ``sinks.compact_parquet_dir`` (rewrite to ~target-size
  files).
- **snapshot expiry** → partition retention. Parquet has no snapshot
  log; the history that actually accumulates here is the append-only
  event tables (error / lineage / DQ-metrics stores) partitioned by
  day. Expiring means dropping partition directories older than the
  retention window — the same "bounded history" contract as
  ``expire_snapshots(older_than=...)``.
- **orphan removal** → deleting write-ahead debris that is not part of
  the dataset: Spark's ``_temporary`` staging dirs and the
  ``__compact_tmp`` / ``__compact_old`` directories a crashed
  compaction leaves behind. Only debris older than a retention window
  is touched, mirroring the reference's in-progress-write guard
  (``remove_orphan_files(older_than=...)``).

LOCAL-FILESYSTEM ONLY, like ``compact_parquet_dir``: directory listing
and deletion use ``os``/``shutil``. On object storage these operations
belong to a table format's transactional procedures (exactly what the
reference calls); a maintenance pass over raw S3 listings cannot be
made safe against concurrent writers.
"""

from __future__ import annotations

import os
import shutil
import time
from datetime import date, datetime, timedelta
from typing import Any

from pyspark.sql import SparkSession

from nyc_taxi_data_ingestion_spark.sources.sinks import compact_parquet_dir
from nyc_taxi_data_ingestion_spark.sources.snapshots import (
    expire_snapshots,
    snapshot_compact,
)

_ORPHAN_SUFFIXES = ("__compact_tmp", "__compact_old")


def expire_partitions(
    path: str,
    partition_col: str,
    retention_days: int,
    today: date | None = None,
) -> list[str]:
    """Drop Hive-style ``<partition_col>=<ISO date>`` partition dirs
    older than ``retention_days`` (reference ``expire_snapshots``,
    ``iceberg_maintenance.py:96-121``; ``retain_last=1`` becomes
    "never expire the newest partition").

    Returns the removed partition directory names. Values that don't
    parse as ISO dates are left untouched.
    """
    today = today or datetime.now().date()
    cutoff = today - timedelta(days=retention_days)
    prefix = partition_col + "="
    candidates: list[tuple[date, str]] = []
    for name in sorted(os.listdir(path)):
        if not name.startswith(prefix):
            continue
        try:
            candidates.append((date.fromisoformat(name[len(prefix):]), name))
        except ValueError:
            # non-date partition values (e.g. layer=silver) are not expirable
            continue
    removed: list[str] = []
    newest = max(candidates)[1] if candidates else None
    for value, name in candidates:
        if value < cutoff and name != newest:
            shutil.rmtree(os.path.join(path, name))
            removed.append(name)
    return removed


def remove_orphan_files(path: str, retention_hours: int = 72) -> list[str]:
    """Delete staging debris under ``path`` older than
    ``retention_hours`` (reference ``remove_orphan_files``,
    ``iceberg_maintenance.py:148-173``): Spark ``_temporary`` dirs and
    interrupted-compaction ``__compact_tmp`` / ``__compact_old`` dirs
    (which live NEXT to the dataset dir, so the parent is scanned for
    those). The age guard keeps in-progress writes safe.
    """
    cutoff_ts = time.time() - retention_hours * 3600
    removed: list[str] = []

    def _expired(p: str) -> bool:
        try:
            return os.path.getmtime(p) < cutoff_ts
        except OSError:
            return False

    base = path.rstrip("/")
    for cand in [os.path.join(base, "_temporary")] + [
        base + suf for suf in _ORPHAN_SUFFIXES
    ]:
        if os.path.isdir(cand) and _expired(cand):
            shutil.rmtree(cand)
            removed.append(cand)
    return removed


def run_maintenance(
    spark: SparkSession,
    tables: list[dict[str, Any]],
    retention_days: int = 7,
    target_file_size_mb: int = 128,
    remove_orphans: bool = True,
    orphan_retention_hours: int = 72,
) -> list[dict[str, Any]]:
    """Full maintenance cycle over managed datasets (reference
    ``run_maintenance``, ``iceberg_maintenance.py:178-216``): compact →
    expire → orphans per table, each step fault-isolated, missing
    tables skipped with a report row rather than an abort.

    ``tables`` entries: ``{"path": str, "partition_by": [cols...],
    "expire_on": "partition_day" | None, "snapshot_keep_last": int |
    None, "snapshot_compact": bool, "rewrite_delete_debt": bool,
    "rewrite_manifests_over": int}`` (shard count above which the
    versioned table's manifest metadata compacts per cycle; default
    16, ``0``/``None`` disables). An optional ``"ref_retention"``
    entry (fnmatch pattern → {"max_age_hours": h}) is passed through
    to ``expire_snapshots`` so abandoned WAP branches / stale tags age
    out per policy instead of pinning staged snapshots forever.
    Versioned tables (``snapshot_keep_last`` set) get an automatic
    merge-on-read delete-debt rewrite each cycle — it commits nothing
    when there is no debt, so it never rotates identical history
    through the retention window; pass ``"rewrite_delete_debt":
    False`` to opt out. Returns one report dict per table with
    per-step outcomes.
    """
    report: list[dict[str, Any]] = []
    for spec in tables:
        path = spec["path"]
        row: dict[str, Any] = {"path": path}
        if not os.path.isdir(path):
            row["skipped"] = "missing"
            report.append(row)
            continue
        if spec.get("snapshot_keep_last") is None:
            try:
                row["compacted_to_files"] = compact_parquet_dir(
                    spark,
                    path,
                    target_file_bytes=target_file_size_mb * 1024 * 1024,
                    partition_by=spec.get("partition_by"),
                )
            except Exception as exc:  # fault isolation, reference :199-202
                row["compact_error"] = str(exc)
        elif spec.get("snapshot_compact"):
            # versioned tables never compact in place (rewriting files
            # under a manifest breaks read-at-version); when opted in
            # (spec "snapshot_compact": true) they get the
            # transactional rewrite — head recommitted as a new
            # version sized to target_file_size_mb, fragments
            # reclaimed by the expiry step below. OPT-IN because every
            # rewrite consumes one slot of the snapshot retention
            # window: an unconditional per-cycle rewrite would rotate
            # real history out of keep_last with identical copies.
            try:
                row["compacted_to_version"] = snapshot_compact(
                    spark,
                    path,
                    partition_by=spec.get("partition_by"),
                    target_file_bytes=target_file_size_mb * 1024 * 1024,
                )
            except Exception as exc:
                row["compact_error"] = str(exc)
        if spec.get("snapshot_keep_last") is not None and spec.get(
            "rewrite_delete_debt", True
        ):
            # merge-on-read debt compaction (Iceberg's delete-file
            # rewrite): unconditional per cycle because it commits
            # NOTHING when there is no debt — unlike the full
            # snapshot_compact above, it can never rotate identical
            # history through the retention window
            from nyc_taxi_data_ingestion_spark.sources.snapshots import (
                snapshot_rewrite_data_files,
            )

            try:
                rep = snapshot_rewrite_data_files(spark, path)
                if rep["rewritten_files"]:
                    row["delete_debt_rewrite"] = rep
            except Exception as exc:
                row["delete_debt_error"] = str(exc)
        if spec.get("snapshot_keep_last") is not None:
            # metadata compaction (Iceberg's rewrite_manifests): a
            # long-appended table accumulates one manifest shard per
            # commit — compact once the descriptor list outgrows the
            # threshold. Unconditional per cycle like the debt
            # rewrite: below the threshold it commits NOTHING, and
            # incremental consumers tail straight across it when it
            # does (spec "rewrite_manifests_over": shard count that
            # triggers, default 16; 0/None disables)
            over = spec.get("rewrite_manifests_over", 16)
            if over:
                import json as _json

                from nyc_taxi_data_ingestion_spark.sources.snapshots import (
                    _manifest_path,
                    current_version,
                    snapshot_rewrite_manifests,
                )

                try:
                    head = current_version(path)
                    n_shards = 0
                    if head is not None:
                        # RAW read: counting descriptors must not pay
                        # a full shard resolution every cycle
                        with open(_manifest_path(path, head)) as fh:
                            n_shards = len(
                                _json.load(fh).get("shards") or []
                            )
                    if n_shards > over:
                        row["manifests_rewritten"] = (
                            snapshot_rewrite_manifests(path)
                        )
                except Exception as exc:
                    row["manifest_rewrite_error"] = str(exc)
        expire_on = spec.get("expire_on")
        if expire_on:
            try:
                row["expired_partitions"] = expire_partitions(
                    path, expire_on, retention_days
                )
            except Exception as exc:
                row["expire_error"] = str(exc)
        keep_last = spec.get("snapshot_keep_last")
        if keep_last is not None:
            # versioned (snapshot_write) tables: true snapshot expiry —
            # manifests past retention dropped, unreferenced commit
            # dirs GC'd (snapshots.expire_snapshots; the reference's
            # expire_snapshots + remove_orphan_files pair)
            try:
                row["expired_snapshots"] = expire_snapshots(
                    path,
                    keep_last=keep_last,
                    older_than_hours=retention_days * 24,
                    ref_retention=spec.get("ref_retention"),
                )
            except Exception as exc:
                row["snapshot_expire_error"] = str(exc)
        if remove_orphans:
            try:
                row["removed_orphans"] = remove_orphan_files(
                    path, orphan_retention_hours
                )
            except Exception as exc:
                row["orphan_error"] = str(exc)
        report.append(row)
    return report


def skipping_report(
    spark: SparkSession,
    path: str,
    column: str,
    lower: Any | None = None,
    upper: Any | None = None,
) -> "DataFrame":
    """Per-file parquet min/max data-skipping audit for the predicate
    ``lower <= column <= upper`` (either bound optional): for each data
    file, how many row groups the scan MUST read vs how many the
    footer statistics alone prove empty. This measures the thing
    :func:`~nyc_taxi_data_ingestion_spark.sources.sinks.compact_parquet_dir`'s
    sort/Z-order layouts exist to improve — on a well-clustered table a
    selective predicate skips almost every row group; on a random
    layout every row group's [min,max] straddles the predicate and the
    scan reads 100 TB to return 1 GB.

    Footer reads are DISTRIBUTED (one task per file batch via
    ``mapInPandas`` — a 100 TB table has 10⁵+ footers; reading them on
    the driver is the non-scalable shape), and only metadata is
    touched: cost is O(files), not O(bytes).

    Missing statistics (or the column absent from a file's schema) are
    counted must-read — pruning claims stay conservative. Returns one
    row per file: (file, row_groups, rows, prunable_row_groups,
    prunable_rows).
    """
    import pandas as pd
    from pyspark.sql import DataFrame  # noqa: F401

    files = []
    for dirpath, _dirs, names in os.walk(path):
        for n in sorted(names):
            if n.endswith(".parquet"):
                files.append(os.path.join(dirpath, n))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")

    def scan(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for f in pdf["file"]:
                meta = pq.ParquetFile(f).metadata
                names = {
                    meta.schema.column(i).name: i
                    for i in range(meta.num_columns)
                }
                ci = names.get(column)
                rg_total = meta.num_row_groups
                rows_total, rg_prun, rows_prun = 0, 0, 0
                for g in range(rg_total):
                    rg = meta.row_group(g)
                    rows_total += rg.num_rows
                    if ci is None:
                        continue  # column absent: must-read
                    st = rg.column(ci).statistics
                    if st is None or not st.has_min_max:
                        continue  # no stats: must-read
                    try:
                        entirely_above = (
                            upper is not None and st.min > upper
                        )
                        entirely_below = (
                            lower is not None and st.max < lower
                        )
                    except TypeError:
                        # stats/bound types incomparable (schema drift,
                        # mistyped bound): conservative must-read, the
                        # audit itself must never fail
                        continue
                    if entirely_above or entirely_below:
                        rg_prun += 1
                        rows_prun += rg.num_rows
                out.append((f, rg_total, rows_total, rg_prun, rows_prun))
            yield pd.DataFrame(
                out,
                columns=[
                    "file", "row_groups", "rows",
                    "prunable_row_groups", "prunable_rows",
                ],
            )

    listing = spark.createDataFrame([(f,) for f in files], "file string")
    # salt the file list across tasks: a footer read is ~ms, so one
    # task per DEFAULT-PARALLELISM slice, not one per file
    n_slices = min(len(files), spark.sparkContext.defaultParallelism)
    return listing.repartition(n_slices).mapInPandas(
        scan,
        schema=(
            "file string, row_groups long, rows long, "
            "prunable_row_groups long, prunable_rows long"
        ),
    )


def skipping_summary(report: "DataFrame") -> dict[str, Any]:
    """Collapse a :func:`skipping_report` into the numbers a layout
    decision needs: total/prunable row groups and rows, and the
    prunable fractions (0.0 when the table has no rows)."""
    from pyspark.sql import functions as F

    row = report.agg(
        F.count("*").alias("files"),
        F.sum("row_groups").alias("rg"),
        F.sum("rows").alias("rows"),
        F.sum("prunable_row_groups").alias("rg_p"),
        F.sum("prunable_rows").alias("rows_p"),
    ).collect()[0]
    return {
        "files": row.files,
        "row_groups": row.rg,
        "rows": row.rows,
        "prunable_row_groups": row.rg_p,
        "prunable_rows": row.rows_p,
        "prunable_row_group_fraction": (
            row.rg_p / row.rg if row.rg else 0.0
        ),
        "prunable_row_fraction": (
            row.rows_p / row.rows if row.rows else 0.0
        ),
    }
