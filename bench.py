"""Benchmark harness — runs the registry's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (collect to the driver via
count/collect of the final result) — the same work the driver's oracle
check does, minus the pandas conversion.
"""

from __future__ import annotations

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

    timings: dict[str, float] = {}
    t_all = time.time()
    for name, q in sorted(REGISTRY.items()):
        t0 = time.time()
        df = q.fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
    total = round(time.time() - t_all, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "registry_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
