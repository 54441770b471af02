"""Physical-plan audit — the repo's plan-quality GATES as a library.

tests/test_plan_quality.py pins the shipped queries' plans; this module
makes the same checks available to users on ANY DataFrame before they
launch it against 100 TB: the review a Spark expert does on
``.explain("formatted")`` output, mechanized. Findings are advisory
(driver-side string analysis of the formatted plan — no execution),
ordered by severity.

Checks:
- ``global-ordered-window``: a Window whose sort runs under an
  ``Exchange SinglePartition`` — the whole input lands in ONE task
  (the single most common silent scale-killer; every ks_drift/
  token_shards rewrite in this repo removed one of these).
- ``python-row-eval``: ``BatchEvalPython`` in the plan — row-at-a-time
  Python in the hot path (~10-100× slower than Arrow/JVM).
- ``python-arrow-eval``: ``ArrowEvalPython`` — acceptable when needed,
  flagged info-level so it is a decision, not an accident.
- ``nested-loop-join``: ``BroadcastNestedLoopJoin``/
  ``CartesianProduct`` — usually a missing equi-condition (bucketed-bin
  rewrites turn range joins into equi-joins; see interval_join).
- ``unpushed-filter``: a parquet scan with ``PushedFilters: []`` while
  a Filter sits in the plan — predicates evaluated after the read
  instead of skipping row groups (casts/UDFs on the filtered column
  are the usual cause).
- ``wide-scan``: a scan whose ReadSchema reads ≥ ``wide_scan_cols``
  columns — often a missing projection before a cache/shuffle.
- ``low-cardinality-window``: a Window partitioned ONLY by columns the
  caller declares low-cardinality (``low_card_cols``) — a 5-value key
  sorts N/5 rows in one task, the quiet sibling of the global-order
  window (a plan string cannot know cardinality, so this check runs on
  declared schema knowledge; ``DEFAULT_LOW_CARD_COLS`` covers the tiny
  enum domains of the shipped test schema).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

SEVERITIES = ("error", "warn", "info")

# Tiny enum-domain columns of the shipped test schema (≤ ~30 distinct
# values at ANY scale factor — partitioning a window by one of these
# alone caps parallelism at the domain size, not the cluster size).
DEFAULT_LOW_CARD_COLS = frozenset(
    {
        "o_orderpriority", "o_orderstatus", "l_returnflag",
        "l_linestatus", "l_shipmode", "r_name", "event_type",
    }
)


def _top_level_brackets(s: str) -> list[str]:
    """The top-level ``[...]`` group contents of a string, in order —
    nested brackets (array literals, lambda params) stay inside their
    group."""
    out, depth, start = [], 0, -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start >= 0:
                out.append(s[start:i])
                start = -1
    return out


@dataclass(frozen=True)
class Finding:
    severity: str  # error | warn | info
    code: str
    message: str


def formatted_plan(df: DataFrame) -> str:
    """The 'formatted' explain string, or "" when the JVM gateway is
    unreachable (Spark Connect exposes no `_jvm`). Callers treat "" as
    no-plan-available — an empty audit, never a crashed write: the
    audit is advisory plan review, and a connect-mode session must not
    lose its writes over it."""
    try:
        mode = (
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
        return df._jdf.queryExecution().explainString(mode)
    except Exception:
        return ""


def audit_plan(
    df: DataFrame,
    wide_scan_cols: int = 20,
    low_card_cols: frozenset = DEFAULT_LOW_CARD_COLS,
) -> list[Finding]:
    """Audit a DataFrame's physical plan for scale smells. Returns
    findings ordered most-severe first (empty list = clean).
    ``low_card_cols`` is the caller's schema knowledge: columns whose
    domain is tiny at any scale (pass your own set for your schema)."""
    plan = formatted_plan(df)
    lines = plan.splitlines()
    findings: list[Finding] = []

    # global ordered window: in the formatted tree a Window node sits
    # above (Sort/Project/Filter …) above an Exchange; the exchange's
    # partitioning lives in its DETAIL block. Parse detail blocks
    # BLOCK-SCOPED (a lazy multiline regex would cross block
    # boundaries and attribute SinglePartition to the wrong node id),
    # then walk each Window's INPUT CHAIN — only through single-child
    # operators, so a sibling branch of a join can never be paired
    # with the window.
    blocks = re.split(r"(?m)^(?=\(\d+\) )", plan)
    single_part_ids = set()
    for b in blocks:
        m = re.match(r"\((\d+)\) Exchange\b", b)
        if m and re.search(r"(?m)^Arguments: SinglePartition", b):
            single_part_ids.add(m.group(1))
    if single_part_ids:
        tree_end = next(
            (i for i, l in enumerate(lines) if l.startswith("(1)")),
            len(lines),
        )
        tree = lines[:tree_end]
        chain_ops = ("Sort", "Project", "Filter", "WindowGroupLimit")
        for i, line in enumerate(tree):
            if not re.search(r"\bWindow \(\d+\)", line):
                continue
            hit = False
            for below in tree[i + 1 :]:
                m = re.search(r"\b(\w+) \((\d+)\)", below)
                if not m:
                    break
                node, nid = m.group(1), m.group(2)
                if node == "Exchange":
                    hit = nid in single_part_ids
                    break
                if node not in chain_ops:
                    break  # multi-child or opaque op: stop the walk
            if hit:
                findings.append(
                    Finding(
                        "error",
                        "global-ordered-window",
                        "Window over Exchange SinglePartition: the "
                        "entire input is sorted in ONE task. Partition "
                        "the window, or use the two-pass bucketed "
                        "pattern (operators.transform."
                        "partitioned_prefix_sum).",
                    )
                )
                break
    # low-cardinality window: partition spec (the second-to-last
    # top-level bracket group of a Window block's Arguments) made up
    # ONLY of declared tiny-domain columns — parallelism capped at the
    # domain size. The empty-partition case is global-ordered-window's.
    # A Window fed by a WindowGroupLimit is EXEMPT: Spark's rank-filter
    # pushdown already capped each partition's input at k rows per map
    # task, so the per-group task merges parallelism×k rows, not N/k.
    low_card_ids = set()
    for b in blocks:
        m = re.match(r"\((\d+)\) Window\b", b)
        if not m:
            continue
        am = re.search(r"(?m)^Arguments: (.*)$", b)
        if not am:
            continue
        groups = _top_level_brackets(am.group(1))
        if len(groups) < 3:
            continue
        part_names = set(re.findall(r"(\w+)#\d+", groups[-2]))
        if part_names and part_names <= low_card_cols:
            low_card_ids.add(m.group(1))
    if low_card_ids:
        tree_end = next(
            (i for i, l in enumerate(lines) if l.startswith("(1)")),
            len(lines),
        )
        tree = lines[:tree_end]
        chain_ops = ("Sort", "Project", "Filter")
        hit = False
        for i, line in enumerate(tree):
            wm = re.search(r"\bWindow \((\d+)\)", line)
            if not wm or wm.group(1) not in low_card_ids:
                continue
            limited = False
            for below in tree[i + 1 :]:
                m = re.search(r"\b(\w+) \((\d+)\)", below)
                if not m:
                    break
                node = m.group(1)
                if node == "WindowGroupLimit":
                    limited = True
                    break
                if node not in chain_ops:
                    break
            if not limited:
                hit = True
                break
        if hit:
            findings.append(
                Finding(
                    "error",
                    "low-cardinality-window",
                    "Window partitioned only by tiny-domain column(s): "
                    "each partition sorts N/domain rows in ONE task. "
                    "Add a high-cardinality key to the partition spec, "
                    "or compute the rank statistic via distributed "
                    "selection (functions.numeric.grouped_select_at_rank "
                    "/ exact_quantiles cut points).",
                )
            )
    if "BatchEvalPython" in plan:
        findings.append(
            Finding(
                "error",
                "python-row-eval",
                "BatchEvalPython: row-at-a-time Python UDF in the plan. "
                "Use built-in functions or an Arrow-batched pandas_udf.",
            )
        )
    if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
        findings.append(
            Finding(
                "warn",
                "nested-loop-join",
                "Nested-loop/cartesian join: no equi-condition reached "
                "the planner. Range conditions can be bucketed into "
                "equi-joins (see interval_join's bin rewrite).",
            )
        )
    # unpushed filters: a Filter node exists but no scan received a
    # usable predicate — PushedFilters empty or only the IsNotNull
    # guards Spark always emits (a cast/function on the filtered
    # column leaves exactly that residue)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    if pushed and re.search(r"^\(\d+\) Filter", plan, re.M):
        def _useful(entries: str) -> bool:
            items = [e.strip() for e in entries.split(",") if e.strip()]
            return any(not e.startswith("IsNotNull") for e in items)

        if not any(_useful(p) for p in pushed):
            findings.append(
                Finding(
                    "warn",
                    "unpushed-filter",
                    "Filter nodes exist but no scan received a usable "
                    "pushed predicate (IsNotNull guards only) — "
                    "common causes: casts or functions applied to the "
                    "filtered column.",
                )
            )
    if "ArrowEvalPython" in plan:
        findings.append(
            Finding(
                "info",
                "python-arrow-eval",
                "ArrowEvalPython: vectorized Python stage present — "
                "fine when the logic needs Python; confirm it is not "
                "in the per-row hot path of a larger pipeline.",
            )
        )
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        ncols = m.group(1).count(",") + 1 if m.group(1) else 0
        if ncols >= wide_scan_cols:
            findings.append(
                Finding(
                    "info",
                    "wide-scan",
                    f"A scan reads {ncols} columns — if downstream uses "
                    "few of them, add a select() so column pruning can "
                    "reach the reader.",
                )
            )
            break
    order = {s: i for i, s in enumerate(SEVERITIES)}
    return sorted(findings, key=lambda f: order[f.severity])
