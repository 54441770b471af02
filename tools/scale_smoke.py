"""10× scale smoke: replicate sf0.1 into an sf≈1 layout and measure
how the headline operator families actually scale, not just argue it.

Builds ``/tmp/spark_graft_sf1x/<table>.parquet`` by unioning ten
id-shifted copies of each sf0.1 fact table (documents get a per-replica
tag token so cross-replica texts are near-dups of each other only
through their real content, never byte-identical; embeddings keep
exact duplicate structure deliberately), leaves dims as-is, then runs a
representative query per family at 1× and 10× on the same session and
prints the wall-clock ratio. A family whose ratio is ≫ the data ratio
has a superlinear term the plan audit missed; ~10× (or the output-bound
families' edge-count growth) is the pass condition recorded in
docs/SCALE.md.

Usage: python tools/scale_smoke.py [--rebuild]
"""

from __future__ import annotations

import gc
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG_DIR = "/tmp/spark_graft_sf1x"
REPLICAS = 10

# fact tables: (id columns to shift, optional text tag column)
_FACTS = {
    "documents": (["doc_id"], "text"),
    "events": (["event_id", "user_id"], None),
    "orders": (["o_orderkey", "o_custkey"], None),
    "lineitem": (["l_orderkey"], None),
    "customer": (["c_custkey"], None),
    "embeddings": (["vec_id"], None),
}
_DIMS = ["part", "supplier", "nation", "region"]

QUERIES = [
    "daily_stats",          # fact scan + multi-measure groupBy
    "tpch_q3_sql",          # fact-fact join + top-k
    "market_basket",        # self-join co-occurrence
    "sessionize_batch",     # user-key window
    "gini_concentration",   # two-pass bucketed prefix scan (rank stat)
    "lang_id",              # per-row text scoring
    "minhash_near_dup",     # sketch + band join
    "blocked_jaccard",      # prefix-filter + verify (output grows too)
    "dedup_clusters",       # edges + iterative CC
    "ivfpq_topk",           # ANN train/encode/search
    "knn_label_prop",       # IVF-routed label transfer (r7 rewrite)
    "skyline_suppliers",    # bucket-offset prefix-min frontier (r7)
    "graph_triangles",      # co-occurrence edges + 2-join closure (r7)
    "twap_by_user",         # user-key LEAD window + exact sums (r7)
    "chunk_windows",        # token-window chunking, scan-stage only (r8)
    "snapshot_format_write",  # format-API staged write + manifest commit (r8)
    "pagerank_exact",       # fixed-point power iteration, 5 rounds (r8)
    "top_paths",            # session entry-path counting (r8 family)
    "time_to_purchase",     # per-session conversion latency (r8 family)
    "entry_point_conversion",  # entry-type conversion ratio (r8 family)
    "price_rank_deciles",   # grouped distributed rank selection (r9 plan)
    "ntile_binning",        # grouped multi-rank selection (r9 plan)
    "ks_drift_grouped",     # per-group bucketed two-pass KS (r9 plan)
    "snapshot_format_partitioned",  # Hive-partitioned format read (r8)
    "snapshot_delete_mor",  # positional delete vectors + MoR read (r9)
    "snapshot_merge_mor",   # vector-masked upsert, one atomic commit (r9)
    "snapshot_update_mor",  # UPDATE..SET..WHERE via vectors (r9)
    "mart_from_cdc",        # changelog-folded mart maintenance (r9)
    "snapshot_schema_evolution",  # metadata-only rename/drop + evolved read (r9)
    "snapshot_null_skip",   # null-count data skipping + pruned scan (r9)
    "snapshot_rewrite_debt",  # partial delete-file compaction (r9)
    "snapshot_manifest_shards",  # sharded metadata + rewrite_manifests (r10)
    "snapshot_shard_skip",  # hull-pruned shard loading at scan planning (r11)
    "snapshot_delete_eq",   # zero-read equality delete + eq upsert (r11)
    "snapshot_upsert_eq",   # CDC upsert face: eq-delete + append, one commit (r12)
    "snapshot_projected_scan",  # row-group prune + decode projection (r12)
    "bloom_dedup",          # blocked-bloom prefilter + exact verify (r12)
    "tpch_q9_sql",          # 5-table star join x year rollup (r12)
    "tpch_q16_sql",         # NOT IN anti-subquery + count-distinct (r12)
    "snapshot_wap",         # branch stage -> DQ audit -> fast-forward (r10)
    "dq_metrics_exact",     # one-pass check counters + key integrity (r10)
    # lineage_edges_exact: config-derived constants, no data dependence
    "tpch_q12_sql",         # fact-fact join + conditional priority split (r9)
]


_SENTINEL = "_BUILT"


def build(spark) -> None:
    from nyc_taxi_data_ingestion_spark.sources.readers import read_table

    # a crashed build leaves a half-populated dir; the sentinel is
    # written last so reruns rebuild instead of measuring a partial
    # (or stale different-SF) corpus
    sentinel = os.path.join(BIG_DIR, _SENTINEL)
    if os.path.exists(sentinel):
        os.unlink(sentinel)
    os.makedirs(BIG_DIR, exist_ok=True)
    for name, (id_cols, tag_col) in _FACTS.items():
        out = f"{BIG_DIR}/{name}.parquet"
        if os.path.exists(out):
            shutil.rmtree(out)
        base = read_table(spark, SF_DIR, name)
        parts = []
        for i in range(REPLICAS):
            df = base
            for c in id_cols:
                df = df.withColumn(c, F.col(c) + F.lit(i * 10**9))
            if tag_col is not None and i > 0:
                df = df.withColumn(
                    tag_col, F.concat(F.col(tag_col), F.lit(f" r{i}"))
                )
            parts.append(df)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.parquet(out)
        print(f"built {name}: {spark.read.parquet(out).count()} rows")
    for name in _DIMS:
        out = f"{BIG_DIR}/{name}.parquet"
        if os.path.exists(out):
            shutil.rmtree(out)
        read_table(spark, SF_DIR, name).write.parquet(out)
    with open(os.path.join(BIG_DIR, _SENTINEL), "w") as fh:
        fh.write(SF_DIR)


def main() -> None:
    from nyc_taxi_data_ingestion_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark()
    sentinel = os.path.join(BIG_DIR, _SENTINEL)
    built_from = None
    if os.path.exists(sentinel):
        with open(sentinel) as fh:
            built_from = fh.read().strip()
    # rebuild on demand, on a missing/partial build, AND when the
    # existing build derives from a different base SF — otherwise the
    # 1x leg would measure one corpus and the 10x leg another
    if "--rebuild" in sys.argv or built_from != SF_DIR:
        build(spark)

    def measured(q, sf_dir):
        """Warm once, then best-of-2 (min) with heap hygiene before
        each timing — the same shared-VM steal guard bench.py uses;
        a single sample per leg can flip a family's conclusion."""
        q(spark, sf_dir).count()  # warm: codegen, listing, page cache
        best, n = float("inf"), 0
        for _ in range(2):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            n = q(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        return best, n

    qs = entry.queries()
    # positional args (non-flag) select a subset of QUERIES — re-measure
    # one family after a targeted change without paying the full sweep
    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]
    run_list = [n for n in QUERIES if not wanted or n in wanted]
    print(f"\n{'query':24s} {'1x sec':>8s} {'10x sec':>9s} {'ratio':>6s}")
    for name in run_list:
        small, n1 = measured(qs[name], SF_DIR)
        big_t, n10 = measured(qs[name], BIG_DIR)
        print(
            f"{name:24s} {small:8.2f} {big_t:9.2f} {big_t / small:6.1f}"
            f"   rows {n1} -> {n10}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
