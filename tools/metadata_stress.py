"""100k-file METADATA stress (r10 verdict item 8): how does the
snapshot layer's driver-side planning cost scale with file COUNT, and
what does shard-level hull pruning (r11) buy at that scale?

Synthesizes a sharded manifest over ~100k file ENTRIES — metadata
only, no data files are written (stats are synthetic range-disjoint
bounds, exactly what a 100 TB / 128 MB-file table's manifests would
record) — then measures, all driver-side (no Spark):

  1. append-commit wall + bytes written (the O(commit) claim);
  2. head resolve, FULL (every shard loaded — the pre-r11 path and
     the predicate-free read today);
  3. head resolve, PRUNED (a selective conjunct through the shard
     hulls — loads only surviving shards);
  4. scan_prune_stats parity counts.

Usage: python tools/metadata_stress.py [n_rels] [files_per_rel]
(defaults 1000 x 100 = 100k entries). Prints one human table and one
JSON line; SCALE.md records the headline numbers.
"""

from __future__ import annotations

import builtins
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_data_ingestion_spark.sources import snapshots as S  # noqa: E402

N_RELS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
FILES_PER_REL = int(sys.argv[2]) if len(sys.argv) > 2 else 100
KEYS_PER_REL = 1000  # synthetic key-range width per commit dir


def synth_table(path: str) -> None:
    """One committed version whose manifest covers N_RELS x
    FILES_PER_REL file entries with range-disjoint recorded bounds on
    'k' (rel i covers k in [i*W, (i+1)*W)), rebalanced into ~256
    hulled shards — the shape a long-appended 100 TB table's metadata
    converges to after rewrite_manifests."""
    n_shards = 256
    os.makedirs(S._snap_root(path), exist_ok=True)
    descriptors = []
    group_c: dict[str, list[str]] = {}
    group_s: dict[str, dict] = {}
    per_group = max(1, N_RELS // n_shards)
    for i in range(N_RELS):
        rel = os.path.join(S._DATA_DIR, f"c{i + 1:08d}-{i:08x}")
        files = [f"part-{j:05d}.parquet" for j in range(FILES_PER_REL)]
        group_c[rel] = files
        lo = i * KEYS_PER_REL
        width = max(1, KEYS_PER_REL // FILES_PER_REL)
        group_s[rel] = {
            f: {"k": [lo + j * width, lo + (j + 1) * width - 1, 0, width]}
            for j, f in enumerate(files)
        }
        if len(group_c) == per_group or i == N_RELS - 1:
            # _write_shard is THE production descriptor builder: the
            # stress measures exactly the hulls a real table records
            descriptors.append(S._write_shard(path, group_c, group_s, {}))
            group_c, group_s = {}, {}
    import pyarrow as pa

    manifest = {
        "version": 1,
        "parent": None,
        "operation": "overwrite",
        "timestamp": time.time(),
        "partition_by": [],
        "stats_cols": ["k"],
        "shards": descriptors,
        # the commit-time union-schema record (r12): real commits
        # compute this from footers; the synthetic table declares its
        # one column directly — schema() must then read ZERO shards
        "arrow_schema_b64": S._schema_to_b64(
            pa.schema([pa.field("k", pa.int64(), nullable=True)])
        ),
    }
    assert S._commit_manifest(path, 1, manifest)
    print(
        f"# synthesized {N_RELS * FILES_PER_REL} file entries across "
        f"{len(descriptors)} hulled shards"
    )


def shard_bytes_read(fn) -> tuple[float, int, int]:
    """(wall_sec, shard_files_opened, shard_bytes_read) of fn()."""
    opened: list[str] = []
    real_open = builtins.open

    def counting(p, *a, **k):
        if isinstance(p, str) and f"{S._SHARDS_DIR}/" in p.replace("\\", "/"):
            opened.append(p)
        return real_open(p, *a, **k)

    builtins.open = counting
    try:
        t0 = time.perf_counter()
        fn()
        wall = time.perf_counter() - t0
    finally:
        builtins.open = real_open
    return wall, len(opened), sum(os.path.getsize(p) for p in set(opened))


def main() -> None:
    path = tempfile.mkdtemp(prefix="spark_graft_metastress_") + "/t"
    try:
        t0 = time.perf_counter()
        synth_table(path)
        build = time.perf_counter() - t0

        # 1. append commit on top of 100k entries: O(commit) bytes
        rel = os.path.join(S._DATA_DIR, f"c{N_RELS + 9:08d}-deadbeef")
        t0 = time.perf_counter()
        head = S.commit_staged_files(
            path,
            rel,
            [f"part-{j:05d}.parquet" for j in range(8)],
            # stats_cols=[] skips footer reads: the files are synthetic
            # names (metadata-only stress), and inheriting the table's
            # 'k' property would try to open them
            stats_cols=[],
        )
        commit_wall = time.perf_counter() - t0
        commit_bytes = os.path.getsize(S._manifest_path(path, head))
        with open(S._manifest_path(path, head)) as f:
            descs = json.load(f)["shards"]
        new_shards = [
            d["name"]
            for d in descs
            if rel in (d.get("commits") or [])
        ]
        commit_bytes += sum(
            os.path.getsize(S._shard_path(path, n)) for n in new_shards
        )

        # 2. full head resolve (pre-r11 shape: every shard parsed)
        full_wall, full_n, full_bytes = shard_bytes_read(
            lambda: S._load_manifest(path, head)
        )
        # 3. hull-pruned resolve: one rel's key range
        lo = (N_RELS // 2) * KEYS_PER_REL + 7
        pruned_wall, pruned_n, pruned_bytes = shard_bytes_read(
            lambda: S._load_manifest(
                path, head, prune=[("k", lo, lo + 50)]
            )
        )
        st = S.scan_prune_stats(path, "k", lower=lo, upper=lo + 50)

        # 4. schema() from the manifest-head record (r12): one head
        # read, ZERO shard loads at any file count — previously this
        # resolved every shard and opened one footer per commit dir
        from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
            SnapshotDataSource,
        )

        ds = SnapshotDataSource(options={"path": path, "version": "1"})
        schema_wall, schema_n, schema_bytes = shard_bytes_read(ds.schema)

        total_files = N_RELS * FILES_PER_REL + 8
        print(f"{'':28s}{'wall':>10s}{'shards':>8s}{'bytes':>12s}")
        print(f"{'synth+rebalance':28s}{build:>9.2f}s")
        print(
            f"{'append commit':28s}{commit_wall:>9.3f}s"
            f"{len(new_shards):>8d}{commit_bytes:>12,d}"
        )
        print(
            f"{'head resolve FULL':28s}{full_wall:>9.3f}s"
            f"{full_n:>8d}{full_bytes:>12,d}"
        )
        print(
            f"{'head resolve PRUNED':28s}{pruned_wall:>9.3f}s"
            f"{pruned_n:>8d}{pruned_bytes:>12,d}"
        )
        print(
            f"{'schema() from head record':28s}{schema_wall:>9.4f}s"
            f"{schema_n:>8d}{schema_bytes:>12,d}"
        )
        print(
            f"# prune audit over {total_files} files: {st}"
        )
        print(json.dumps({
            "file_entries": total_files,
            "commit_sec": round(commit_wall, 4),
            "commit_bytes": commit_bytes,
            "full_resolve_sec": round(full_wall, 4),
            "full_shards": full_n,
            "full_bytes": full_bytes,
            "pruned_resolve_sec": round(pruned_wall, 4),
            "pruned_shards": pruned_n,
            "pruned_bytes": pruned_bytes,
            "schema_sec": round(schema_wall, 4),
            "schema_shards": schema_n,
            "kept_files": st["kept_files"],
            "skipped_shards": st["skipped_shards"],
        }))
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


if __name__ == "__main__":
    main()
