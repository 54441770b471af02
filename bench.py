"""Benchmark harness — runs the registry's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (collect to the driver via
count/collect of the final result) — the same work the driver's oracle
check does, minus the pandas conversion.

Flags:
  --round N     label the in-repo BENCH_full artifact r{N} explicitly
                (without it the round is the newest CORRECTNESS
                artifact's round — right for the driver's
                end-of-round sweep, which runs after that artifact
                lands; mid-round manual sweeps should pass --round)
  --single NAME internal: measure ONE query in a fresh process and
                print {"query", "cold", "warm", "unstable", "rows"} —
                used by the parent sweep to retire unstable_queries
                flags (r7 verdict item 7) and to re-measure stable
                numbers that inflated >2x vs the prior same-sf
                artifact (session-state slowdowns the 25% flag
                cannot see)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _flag_value(name: str) -> str | None:
    """Value of ``name <value>`` in argv. A flag present WITHOUT a
    value exits loudly — silently ignoring `--round` would recreate
    the exact mislabeled-artifact failure the flag exists to prevent."""
    if name in sys.argv:
        i = sys.argv.index(name)
        if i + 1 >= len(sys.argv):
            print(f"error: {name} requires a value", file=sys.stderr)
            sys.exit(2)
        return sys.argv[i + 1]
    return None


def _newest_prior_artifact(sf) -> dict:
    """The newest committed BENCH_full artifact — the cross-round
    baseline for the inflated-number retry and the plan-drift flag
    (empty dict if none parse; both heuristics then never fire).
    Regex anchored to the canonical name (variant artifacts like
    *_definitive are not baselines), and an artifact measured at a
    DIFFERENT scale factor is skipped — comparing sf0.1 numbers
    against an sf1 run would flag every query as inflated and spawn
    hours of fresh-JVM retries."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    cands = []
    for p in glob.glob(os.path.join(here, "BENCH_full_r*.json")):
        m = re.match(r"BENCH_full_r(\d+)\.json$", os.path.basename(p))
        if m:
            cands.append((int(m.group(1)), p))
    for _, p in sorted(cands, reverse=True):
        try:
            with open(p) as f:
                d = json.load(f)
            if d.get("sf") != sf:
                continue
            if not isinstance(d.get("queries"), dict) or not d["queries"]:
                continue  # malformed artifact: fall back to the next
                # older baseline instead of silently disabling both
                # cross-round heuristics for the whole sweep
            return d
        except Exception:
            continue
    return {}


def _canonical_plan(s: str) -> str:
    """Strip the run-varying tokens from a physical-plan string —
    expression ids (#123), hex uuids, filesystem paths (lifecycle
    queries write temp tables), and every literal number (partition
    counts, AQE stats, plan node ids)."""
    import re

    s = re.sub(r"#\d+", "#", s)
    s = re.sub(r"(file:)?/[^\s,\])]+", "<path>", s)
    # digits BEFORE the hex rule: a pure-decimal token of 8+ digits
    # must canonicalize as <n> like its shorter siblings, not <hex> —
    # otherwise a run-varying count crossing the 8-digit boundary
    # between sweeps flips the hash (r12 review)
    s = re.sub(r"\b\d+\b", "<n>", s)
    s = re.sub(r"\b[0-9a-f]{8,}\b", "<hex>", s)
    return s


def _plan_fingerprint(df, inner_plans: list | None = None) -> str:
    """Canonicalized physical-plan fingerprint (r11 verdict item 4):
    a short hash over the final frame's executed-plan tree PLUS every
    plan captured at a localCheckpoint boundary during the run
    (``inner_plans``). The inner plans matter: 35 lifecycle queries
    return ``.localCheckpoint(eager=True)`` frames whose own plan is
    just a Scan-ExistingRDD — without the checkpoint-boundary capture
    their real plans would be invisible and plan_changed could never
    flag a code-driven change in the whole snapshot family. Two
    sweeps on identical code hash identically, and a wall-clock move
    WITHOUT a fingerprint move is environment, not code — the
    distinction r10/r11 had to prove by hand with git-diff and
    cross-sweep ratios."""
    import hashlib

    parts = [_canonical_plan(p) for p in (inner_plans or [])]
    try:
        parts.append(
            _canonical_plan(
                df._jdf.queryExecution().executedPlan().toString()
            )
        )
    except Exception:
        if not parts:
            return "unavailable"
    return hashlib.sha256("\n---\n".join(parts).encode()).hexdigest()[:16]


def _adopt_retry(was_unstable: bool, sweep_warm: float,
                 retry_warm: float) -> bool:
    """Whether a fresh-process retry's numbers replace the sweep's.

    Unstable-class: the sweep numbers were flapping, a stable retry is
    better information regardless of direction. Inflated-class: the
    retry exists to deflate session-state inflation, so a SLOWER retry
    is the retry process hitting a noisy VM window — keep the sweep
    number (r12 verdict item 2: 4.5 s sweep -> 11.1 s retry was kept,
    poisoning the artifact and the scaling ratios)."""
    return was_unstable or retry_warm < sweep_warm


def _artifact_suffix(cpus: str, sf_dir: str, sf) -> str:
    """Filename suffix for the in-repo BENCH_full artifact: empty only
    for the canonical config (32 cores, default SF dir), so variant
    runs never clobber the canonical artifact (r12 verdict item 3)."""
    suffix = "" if cpus == "32" else f"_c{cpus}"
    if sf_dir.rstrip("/") != "/root/testdata/sf0.1":
        suffix += f"_sf{sf}"
    return suffix


def _build_session():
    from nyc_taxi_data_ingestion_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        extra_confs={"spark.sql.shuffle.partitions": str(cpus)},
    )


def _warmup(spark, names=None) -> None:
    """Steady-state warmup: run each query once at the smallest SF so
    whole-stage-codegen compilation (Janino) is cached before timing —
    e.g. the 64-lane MinHash aggregate costs ~9 s to compile, once per
    session, and a cluster deployment pays it once per job, not per
    query."""
    from nyc_taxi_data_ingestion_spark.queries import REGISTRY

    spark.range(1).count()  # JVM + parquet-footer warmup
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001"
    )
    if not os.path.isdir(warm_dir):
        return
    for name, q in sorted(REGISTRY.items()):
        if names is not None and name not in names:
            continue
        try:
            q.fn(spark, warm_dir).count()
        except Exception as exc:  # never let warmup break the bench
            print(f"# warmup {name}: {exc}", file=sys.stderr)


def _measure(spark, q, sf_dir: str):
    """One query's fenced measurement: returns (cold, warm, unstable,
    rows). Per-query ISOLATION fence (r6 verdict item 3 —
    session-order sensitivity): before the cold run, clear EVERY
    cached/persisted block (clearCache unpersists cross-query cache
    residue a shared session accumulates — the r6 artifacts disagreed
    9x on knn_label_prop purely by position in the sweep) and GC both
    heaps so the ContextCleaner releases dead localCheckpoint blocks
    (180+ queries' worth otherwise build memory pressure that inflates
    late-session numbers — observed: a 3 s query measuring 17 s).
    COLD = first fenced run; WARM = best-of-N of the following runs
    (adaptive: this box is a shared VM with transient neighbor CPU
    steal — observed 5-10x inflation windows lasting minutes — so two
    warm runs, re-running while the two fastest disagree by >25%, up
    to 4, reporting the min: that measures the engine, not the
    neighbors). Deliberate cross-RUN artifacts (the persisted ANN
    index) stay: cold includes their probe/build, warm shows the
    steady state — both are real deployments."""
    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    n = q.fn(spark, sf_dir).count()
    cold = round(time.time() - t0, 3)
    runs: list[float] = []
    unstable = False
    df = None
    # capture each localCheckpoint boundary's pre-truncation plan
    # during the warm runs (driver-side string read, no re-execution):
    # checkpointed frames erase their lineage by design, so this is
    # the only place the lifecycle queries' real plans are observable.
    # Patch the CLASSIC DataFrame: in Spark 4 pyspark.sql.DataFrame is
    # the dispatch base and classic sessions run the subclass's own
    # localCheckpoint — patching the base never fires (measured).
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:  # older layout: one concrete class
        from pyspark.sql import DataFrame as _DF

    inner: list[str] = []
    real_lc = _DF.localCheckpoint

    def _capturing_lc(self, *a, **kw):
        try:
            inner.append(
                self._jdf.queryExecution().executedPlan().toString()
            )
        except Exception:
            pass
        return real_lc(self, *a, **kw)

    while len(runs) < 4:
        # capture only on the FIRST warm run: plans don't change
        # across runs, and stringifying a plan per checkpoint inside
        # the timed window would contaminate checkpoint-heavy
        # queries' warm numbers (min over runs takes the later,
        # unpatched runs) — r12 review
        if not runs:
            _DF.localCheckpoint = _capturing_lc
        try:
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            n = df.count()
            runs.append(time.time() - t0)
        finally:
            _DF.localCheckpoint = real_lc
        if len(runs) >= 2:
            a, b = sorted(runs)[:2]
            if b <= a * 1.25:
                break
    else:
        # the two fastest of 4 warm runs still disagree >25%: the
        # number is environment-noise-dominated (neighbor CPU steal
        # windows) — flag it so round-over-round comparisons discount
        # it instead of reading a regression into it
        unstable = True
    return (
        cold,
        round(min(runs), 3),
        unstable,
        n,
        _plan_fingerprint(df, inner),
    )


def _single(name: str) -> None:
    """Measure one query in this (fresh) process and print one JSON
    line — the clean-session retry for queries the sweep flagged
    unstable."""
    from nyc_taxi_data_ingestion_spark.queries import REGISTRY

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _build_session()
    _warmup(spark, names={name})
    cold, warm, unstable, n, _fp = _measure(spark, REGISTRY[name], sf_dir)
    print(
        json.dumps(
            {
                "query": name,
                "cold": cold,
                "warm": warm,
                "unstable": unstable,
                "rows": n,
            }
        )
    )
    spark.stop()


def main() -> None:
    # validate flags BEFORE the (long) sweep: a malformed --round must
    # fail in milliseconds, not after 15 minutes of measurement
    explicit_round = _flag_value("--round")
    if explicit_round is not None:
        try:
            explicit_round = int(explicit_round)
        except ValueError:
            print(
                f"error: --round must be an integer, got "
                f"{explicit_round!r}",
                file=sys.stderr,
            )
            sys.exit(2)
    single = _flag_value("--single")
    if single is not None:
        _single(single)
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from nyc_taxi_data_ingestion_spark.queries import REGISTRY

    spark = _build_session()
    _warmup(spark)

    # fault-isolated per query: one broken query must never zero the
    # whole artifact (round 2 lost all bench evidence to a single
    # streaming failure) — record the error string and keep going.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    errors: dict[str, str] = {}
    unstable: list[str] = []
    fingerprints: dict[str, str] = {}
    for name, q in sorted(REGISTRY.items()):
        try:
            c, w, u, n, fp = _measure(spark, q, sf_dir)
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        cold[name], timings[name], fingerprints[name] = c, w, fp
        if u:
            unstable.append(name)
        print(
            f"# {name}: {n} rows, cold {c}s, warm {w}s"
            + (" UNSTABLE" if u else ""),
            file=sys.stderr,
        )

    # Two classes of suspect numbers get a fresh-process retry,
    # sequential AFTER the sweep session stops (two concurrent local
    # JVMs would measure each other's CPU steal):
    # 1. unstable (r7 verdict item 7): the sweep's warm runs flapped —
    #    if the clean-session run is internally stable, its numbers
    #    replace the flapping ones and the flag drops.
    # 2. inflated-vs-prior (r8): STABLE numbers >2x (and >0.5 s over)
    #    the newest committed BENCH_full artifact's warm for the same
    #    query. The 25%-agreement flag can't see a session whose state
    #    consistently slows one query (observed: 2.0 s -> 12.3 s on an
    #    untouched query, isolated re-measure 2.3 s) — a prior-round
    #    artifact can. Both numbers are kept under singles_remeasured,
    #    so a REAL regression shows up as a retry that stays slow.
    sf_label = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    prior_art = _newest_prior_artifact(
        float(sf_label) if sf_label.replace(".", "").isdigit() else sf_label
    )
    prior = dict(prior_art.get("queries") or {})
    inflated = [
        n
        for n, w in timings.items()
        if n not in unstable
        and n in prior
        and w > 2 * prior[n]
        and w - prior[n] > 0.5
    ]
    remeasured: dict[str, dict] = {}
    if unstable or inflated:
        spark.stop()
        spark = None
        import subprocess

        still_unstable: list[str] = []
        for name in unstable + inflated:
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--single", name],
                    capture_output=True, text=True, timeout=1200,
                    check=True,
                )
                r = json.loads(out.stdout.strip().splitlines()[-1])
                if r["unstable"]:
                    if name in unstable:
                        still_unstable.append(name)
                    continue  # inflated + still noisy: sweep number stands
                remeasured[name] = {
                    "sweep_cold": cold[name],
                    "sweep_warm": timings[name],
                    "cold": r["cold"],
                    "warm": r["warm"],
                }
                # The retry exists to DEFLATE session-state-inflated
                # numbers. For the inflated class, an internally-stable
                # retry that is SLOWER than the sweep is the retry
                # process landing in a noisy VM window, not new truth —
                # adopting it poisoned r12's artifact (4.5 s sweep ->
                # 11.1 s retry kept) and the scaling ratios built on
                # it. Adopt only improvements; both numbers stay under
                # singles_remeasured either way. Unstable-class numbers
                # were flapping in the sweep, so a stable retry replaces
                # them regardless of direction.
                adopt = _adopt_retry(
                    name in unstable, timings[name], r["warm"]
                )
                if adopt:
                    cold[name], timings[name] = r["cold"], r["warm"]
                remeasured[name]["adopted"] = adopt
                why = "unstable" if name in unstable else (
                    f"inflated vs prior {prior.get(name)}s"
                )
                print(
                    f"# {name}: fresh-process retry ({why}), cold "
                    f"{r['cold']}s, warm {r['warm']}s"
                    + ("" if adopt else " (slower than sweep: kept sweep)"),
                    file=sys.stderr,
                )
            except Exception as exc:
                # the sweep numbers stand, flag kept for unstable ones
                if name in unstable:
                    still_unstable.append(name)
                print(f"# {name}: retry failed: {exc}", file=sys.stderr)
        unstable = still_unstable

    total = round(sum(timings.values()), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # BASELINE.md comparability: the reference's 42.9 s "total pipeline"
    # covers ONE silver transform + 3 gold aggregates on ~1.4 M rows.
    # These four registry queries are the equivalent workload (sf0.1
    # lineitem ≈ 600 K rows); the remaining queries are additional
    # surface the reference doesn't time.
    medallion = [
        "silver_transform", "daily_stats", "hourly_analysis",
        "revenue_by_group",
    ]
    payload = {
        "metric": "registry_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_cold": cold,
        "unstable_queries": sorted(unstable),
        "timing_method": (
            "per-query fence (clearCache+GC); cold = first fenced "
            "run; queries{} = warm best-of-adaptive-4; re-measured "
            "once in a fresh process: queries the sweep flagged "
            "unstable (two fastest warm runs >25% apart — "
            "unstable_queries lists only those still flapping there) "
            "AND stable numbers >2x the same query's warm in the "
            "newest same-sf BENCH_full artifact (both numbers kept "
            "under singles_remeasured)"
        ),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "baseline_comparable_pipeline_sec": round(
            sum(timings.get(q, 0.0) for q in medallion), 3
        ),
        "baseline_reference_pipeline_sec": 42.9,
        # canonicalized physical-plan hashes (r11 verdict item 4):
        # plan_changed separates code-driven moves from environment —
        # a wall-clock regression whose fingerprint is unchanged vs
        # the prior artifact is the VM, not the plan
        "plan_fingerprints": fingerprints,
    }
    prior_fp = prior_art.get("plan_fingerprints") or {}
    if prior_fp:
        payload["plan_changed"] = sorted(
            n
            for n, fp in fingerprints.items()
            if n in prior_fp and fp != prior_fp[n]
        )
        for n in payload["plan_changed"]:
            print(f"# {n}: PLAN CHANGED vs prior artifact",
                  file=sys.stderr)
    if remeasured:
        payload["singles_remeasured"] = remeasured
    if errors:
        payload["errors"] = errors
    # The driver's BENCH_r{N}.json artifact truncates this line (only
    # the tail of the per-query map survives), so also persist the FULL
    # payload in-repo: round-over-round regressions stay auditable for
    # every query, not just the alphabetic tail. Round label: --round N
    # wins; otherwise the newest CORRECTNESS artifact's round — the
    # driver's end-of-round bench runs AFTER it writes
    # CORRECTNESS_r{N}, so max(rounds) IS the current round (the old
    # max+1 inference stamped every end-of-round sweep with the NEXT
    # round's name — r9/r10 verdict wart). Mid-round manual sweeps
    # (before the driver's artifact lands) must pass --round N.
    here = os.path.dirname(os.path.abspath(__file__))
    rnd = explicit_round
    try:
        if rnd is None:
            import glob
            import re

            # Anchor to the basename: a directory component like
            # /ci/r5/ must not shadow the round number in the
            # filename, and a non-matching name is skipped rather
            # than crashing on .group.
            rounds = []
            for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
                m = re.match(
                    r"CORRECTNESS_r(\d+)\.json$", os.path.basename(p)
                )
                if m:
                    rounds.append(int(m.group(1)))
            rnd = max(rounds) if rounds else 1
        # Non-canonical configurations must not clobber the canonical
        # artifact: the driver's 8-core scaling run overwrote the
        # committed 32-core BENCH_full_r12.json in the working tree
        # (r12 verdict item 3). Suffix the filename when the core count
        # or data directory differs from the canonical sweep config, so
        # the variant is still recorded but `BENCH_full_r{N}.json`
        # always means 32 cores at the default SF dir. The baseline
        # reader (_newest_prior_artifact) anchors its regex to the
        # unsuffixed name, so variants never become cross-round
        # baselines.
        suffix = _artifact_suffix(
            os.environ.get("SPARK_GRAFT_CPUS", "32"), sf_dir, sf
        )
        with open(
            os.path.join(here, f"BENCH_full_r{rnd:02d}{suffix}.json"), "w"
        ) as f:
            json.dump(payload, f, indent=1, sort_keys=True)
    except Exception as exc:  # read-only checkout must not kill the bench
        print(f"# BENCH_full write skipped: {exc}", file=sys.stderr)
    print(json.dumps(payload))
    if spark is not None:
        spark.stop()


if __name__ == "__main__":
    main()
