"""Driver simulation — the /verify harness (see
.claude/skills/verify/SKILL.md): a VANILLA SparkSession (not the
engine's get_spark factory, so anything silently depending on our
session confs fails here the way it would under the real round
driver), an entry() smoke at sf0.001, an N-prefix oracle compare at
sf0.01 through tests/oracle.compare_query, and nothing else.

Usage: python tools/driver_sim.py [N]       (default N=50)
       python tools/driver_sim.py name ...  (named subset)

~1-2 s per query; the full 50-prefix is ~90 s. Exit code 1 on any
compare failure.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    names = [a for a in args if not a.isdigit()]
    n = int(args[0]) if args and args[0].isdigit() else 50

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0, "entry smoke: 0 rows"
    print(f"entry smoke OK: {len(rows)} rows", flush=True)

    from tests.oracle import compare_query

    registered = list(e.queries())
    if names:
        unknown = sorted(set(names) - set(registered))
        assert not unknown, f"unknown queries: {unknown}"
        prefix = names
    else:
        prefix = registered[:n]
    failed = []
    t0 = time.time()
    for i, name in enumerate(prefix):
        t = time.time()
        try:
            compare_query(spark, "/root/testdata/sf0.01", name)
            print(
                f"[{i + 1}/{len(prefix)}] {name}: OK "
                f"({time.time() - t:.1f}s)",
                flush=True,
            )
        except Exception as ex:
            failed.append((name, str(ex)[:300]))
            print(
                f"[{i + 1}/{len(prefix)}] {name}: FAIL {str(ex)[:300]}",
                flush=True,
            )
    print(
        f"prefix {len(prefix)} done in {time.time() - t0:.0f}s; "
        f"failures: {len(failed)}"
    )
    for name, msg in failed:
        print("FAILED:", name, msg)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
