"""Print the _PRIOR_GREEN update for queries.py from the newest
CORRECTNESS_r{N}.json.

Round-start maintenance (see memory/round-start checklist): every query
the driver hash-verified green joins _PRIOR_GREEN so the bounded
correctness prefix (~50 rows) is spent on queries WITHOUT a verdict.
Run:  python tools/refresh_prior_green.py
then paste the printed names into the _PRIOR_GREEN list and re-check
`pytest tests/test_oracle_parity.py -k budget`.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    arts = sorted(glob.glob("CORRECTNESS_r*.json"))
    if not arts:
        raise SystemExit("no CORRECTNESS_r*.json found — run from repo root")
    latest = max(arts, key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    rows = json.load(open(latest))
    greens = sorted(
        n for n, v in rows.items() if isinstance(v, dict) and v.get("hash_match")
    )
    reds = sorted(
        n
        for n, v in rows.items()
        if isinstance(v, dict) and not v.get("hash_match")
    )
    from nyc_taxi_data_ingestion_spark import queries as Q

    prior = set(Q._PRIOR_GREEN)
    new = [n for n in greens if n not in prior and n in Q.REGISTRY]
    stale = [n for n in prior if n not in Q.REGISTRY]
    print(f"# {latest}: {len(greens)} green, {len(reds)} red")
    if reds:
        print(f"# RED (diagnose before anything else): {reds}")
    print(
        "# review before pasting: a query whose REGISTERED SEMANTICS "
        "changed since its\n# verdict (renamed default, different "
        "oracle) must re-earn one — leave it out."
    )
    print(f"# add to _PRIOR_GREEN ({len(new)}):")
    for n in new:
        print(f'    "{n}",')
    if stale:
        print(f"# names in _PRIOR_GREEN no longer in REGISTRY: {stale}")
    remaining = [
        n
        for n, q in Q.REGISTRY.items()
        if q.oracle is not None and n not in prior and n not in greens
    ]
    print(f"# still never-verified after refresh: {len(remaining)}")


if __name__ == "__main__":
    main()
