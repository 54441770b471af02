"""Optimization-round measurement harness (r13, guide §1).

Measures a NAMED SUBSET of registry queries with the exact fence
bench.py uses (clearCache + GC, cold + adaptive-warm best-of-4,
count() action — the bench contract), and dumps each query's
``explain("formatted")`` to ``plans/r13/<query>_<tag>.txt`` so plan
claims in OPTIMIZATION_r13.md are auditable without running Spark.

Usage:
  python tools/optbench.py --tag before q1 q2 ...
  python tools/optbench.py --tag after --top 20     # slowest 20 from
                                                    # newest BENCH_full
  python tools/optbench.py --plans-only --tag before q1 ...

Prints one JSON line {"tag": ..., "queries": {name: {"cold":..,
"warm":..}}} and appends it to plans/r13/measurements.jsonl.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402


def _top_from_artifact(n: int) -> list[str]:
    import glob
    import re

    cands = []
    for p in glob.glob(os.path.join(HERE, "BENCH_full_r*.json")):
        m = re.match(r"BENCH_full_r(\d+)\.json$", os.path.basename(p))
        if m:
            cands.append((int(m.group(1)), p))
    _, path = max(cands)
    with open(path) as f:
        d = json.load(f)
    q = d["queries"]
    return [k for k, _ in sorted(q.items(), key=lambda kv: -kv[1])[:n]]


def main() -> None:
    args = sys.argv[1:]
    tag = "adhoc"
    plans_only = False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--tag":
            tag = args[i + 1]
            i += 2
        elif a == "--top":
            names.extend(_top_from_artifact(int(args[i + 1])))
            i += 2
        elif a == "--plans-only":
            plans_only = True
            i += 1
        else:
            names.append(a)
            i += 1
    if not names:
        print("no queries named", file=sys.stderr)
        sys.exit(2)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from nyc_taxi_data_ingestion_spark.queries import REGISTRY

    spark = bench._build_session()
    bench._warmup(spark, names=set(names))

    plans_dir = os.path.join(HERE, "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        q = REGISTRY[name]
        # plan dump: explain("formatted") of the final frame. Lifecycle
        # queries that return a localCheckpoint frame show only a
        # Scan-ExistingRDD here; for those the checkpoint-boundary
        # plans captured below (same hook as bench.py) are appended.
        try:
            from pyspark.sql.classic.dataframe import DataFrame as _DF
        except ImportError:
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

        _DF.localCheckpoint = _capturing_lc
        try:
            df = q.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        finally:
            _DF.localCheckpoint = real_lc
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
            for i_, p in enumerate(inner):
                f.write(f"\n\n=== localCheckpoint boundary {i_} ===\n")
                f.write(p)
        if plans_only:
            print(f"# {name}: plan dumped", file=sys.stderr)
            continue
        c, w, u, n, _fp = bench._measure(spark, q, sf_dir)
        out[name] = {"cold": c, "warm": w, "unstable": u, "rows": n}
        print(f"# {name}: {n} rows, cold {c}s, warm {w}s"
              + (" UNSTABLE" if u else ""), file=sys.stderr)

    line = json.dumps({"tag": tag, "sf_dir": sf_dir, "queries": out})
    with open(os.path.join(plans_dir, "measurements.jsonl"), "a") as f:
        f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
