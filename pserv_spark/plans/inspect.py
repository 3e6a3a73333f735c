"""Physical-plan introspection helpers.

The reference delegates all planning to MySQL and exposes nothing;
this engine's planner is Catalyst, and these helpers make its physical
choices (join strategy, pushdown, pruning, shuffle count) first-class
inspectable properties — used by the plan-audit tests and available to
users tuning a query the same way they'd read EXPLAIN on the reference
stack.  All pure string inspection over the executed-plan rendering;
no private JVM state beyond ``queryExecution``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Current physical plan (pre-execution: AQE initial plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


def final_plan(df: DataFrame) -> str:
    """AQE-final plan — requires the query to have been executed."""
    df.collect()
    return physical_plan(df)


def final_plan_section(plan: str) -> str:
    """Slice an ``AdaptiveSparkPlan`` rendering to its ``== Final Plan
    ==`` section only.

    ``executedPlan().toString()`` on an adaptive plan prints BOTH the
    final (executed) plan and the ``== Initial Plan ==`` it replaced;
    a detector run over the whole string would report a hazard that
    exists only in the never-executed initial section — and the
    indent-depth stacks in :func:`exploded_broadcast` /
    :func:`global_window_unbounded` would leak state across the
    section boundary (header lines carry depth -1 and never pop).
    Non-adaptive plan strings are returned unchanged."""
    m = re.search(r"^\s*\+?-?\s*== Final Plan ==\s*$", plan, flags=re.M)
    if not m:
        return plan
    end = re.search(r"^\s*\+?-?\s*== Initial Plan ==\s*$", plan, flags=re.M)
    return plan[m.end() : end.start() if end else len(plan)]


def _scan_fields(plan: str, label: str) -> list[str]:
    # Scan metadata is rendered width-limited: a long filter list is cut
    # with "..." before its closing bracket, so accept either terminator.
    out = []
    for m in re.finditer(rf"{label}: \[(.*?)(?:\]|\.\.\.)", plan):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """Predicates pushed into the parquet reader (row-group skipping)."""
    return _scan_fields(physical_plan(df), "PushedFilters")


def partition_filters(df: DataFrame) -> list[str]:
    """Predicates pruning partition directories (zone/chunk pruning)."""
    return _scan_fields(physical_plan(df), "PartitionFilters")


def read_schema(df: DataFrame) -> list[str]:
    """Column names that actually reach the scan (pruning check)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", physical_plan(df)):
        cols.extend(f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip())
    return cols


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges — the scale-limiting resource."""
    return len(re.findall(r"Exchange (?:hash|range|Single)", physical_plan(df)))


def has_nested_loop(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan


#: Operators that bound the size of everything beneath them, for the
#: exploded-broadcast check.
_BOUNDING = re.compile(
    r"\b(HashAggregate|ObjectHashAggregate|SortAggregate|"
    r"TakeOrderedAndProject|CollectLimit|GlobalLimit|LocalLimit)\b"
)


def exploded_broadcast(plan: str) -> bool:
    """True if a STATIC ``BroadcastExchange`` has a ``Generate``
    (explode) beneath it with no size-bounding aggregate/limit on the
    path between — the fan-out-blind estimate trap: Catalyst sizes the
    exploded stream from its pre-explode child, and AQE never
    DOWNGRADES a planned broadcast (it only upgrades shuffle joins),
    so a locally-fine plan OOMs at cluster scale.  Fix sites pin the
    partitioned join with ``hint("merge")`` (DataFrame) or a
    ``/*+ MERGE(x) */`` comment hint (SQL — DuckDB oracles read it as
    a plain comment, so shared strings stay identical)."""
    stack: list[tuple[int, str]] = []  # (indent-depth, "bx" | "bound")
    for line in plan.splitlines():
        m = re.search(r"(?:\+|:)- ", line)
        depth = m.start() if m else -1
        label = line[m.end():] if m else line
        while stack and stack[-1][0] >= depth >= 0:
            stack.pop()
        if "BroadcastExchange" in label:
            stack.append((depth, "bx"))
        elif _BOUNDING.search(label):
            stack.append((depth, "bound"))
        elif re.search(r"\bGenerate\b", label):
            for _d, kind in reversed(stack):
                if kind == "bound":
                    break
                if kind == "bx":
                    return True
    return False


def has_exploded_broadcast(df: DataFrame) -> bool:
    """DataFrame convenience wrapper over :func:`exploded_broadcast`."""
    return exploded_broadcast(physical_plan(df))


#: Operators that bound row count for the global-window check — the
#: exploded-broadcast set plus WindowGroupLimit (Spark's rank-limit
#: pushdown keeps only k rows per map partition before the exchange).
_WIN_BOUNDING = re.compile(
    r"\b(HashAggregate|ObjectHashAggregate|SortAggregate|"
    r"TakeOrderedAndProject|CollectLimit|GlobalLimit|LocalLimit|"
    r"WindowGroupLimit)\b"
)


def global_window_unbounded(plan: str) -> bool:
    """True if an ``Exchange SinglePartition`` feeds a ``Window`` and
    nothing in the exchange's subtree bounds its row count — the
    single-partition window trap: an unpartitioned ``OVER (ORDER BY
    ...)`` funnels the ENTIRE input through one task, fine at test
    scale and a stuck straggler (or OOM) at 100 TB.  Safe shapes pass
    automatically: a ``TakeOrderedAndProject``/limit planned below the
    window (Catalyst's LimitPushDownThroughWindow), a
    ``WindowGroupLimit`` rank-pushdown, or an aggregate whose output
    (rollup/spine/metadata-sized frame) is what the window consumes.
    Companion rule to :func:`exploded_broadcast`; same plan-string
    walk."""
    parsed: list[tuple[int, str]] = []
    for line in plan.splitlines():
        m = re.search(r"(?:\+|:)- ", line)
        depth = m.start() if m else -1
        parsed.append((depth, line[m.end():] if m else line))
    stack: list[tuple[int, str]] = []  # (indent-depth, "win" | "bound" | "exch")
    for i, (depth, label) in enumerate(parsed):
        while stack and stack[-1][0] >= depth >= 0:
            stack.pop()
        if re.search(r"\bWindow(GroupLimit)?\b", label):
            # WindowGroupLimit bounds; a plain Window marks the hazard.
            kind = "bound" if "WindowGroupLimit" in label else "win"
            stack.append((depth, kind))
        elif _WIN_BOUNDING.search(label):
            stack.append((depth, "bound"))
        elif "Exchange" in label and "Reused" not in label:
            if "SinglePartition" in label:
                nearest = next((k for _d, k in reversed(stack)), None)
                if nearest == "win":
                    bounded = False
                    for d2, l2 in parsed[i + 1:]:
                        if 0 <= d2 <= depth:
                            break  # left the exchange's subtree
                        if _WIN_BOUNDING.search(l2):
                            bounded = True
                            break
                    if not bounded:
                        return True
            stack.append((depth, "exch"))
    return False


def has_global_window_unbounded(df: DataFrame) -> bool:
    """DataFrame convenience wrapper over :func:`global_window_unbounded`."""
    return global_window_unbounded(physical_plan(df))
