"""Physical-plan introspection: the engine's performance guardrails.

The reference exposes `query --plan` and per-query metrics
(/root/reference/src/main.rs:44-58, src/execution/context.rs:294-309).
Here the equivalent surface is Catalyst's formatted explain, plus
assertions used by tests/test_plans.py to pin the plan *shapes* that
make queries 100 TB-viable: filters pushed to the parquet scan, small
dimensions broadcast, no accidental cartesian products, bounded
shuffle counts.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    """Simple-mode plan AFTER an action (AQE-final when collected)."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_op(df: DataFrame, op: str) -> int:
    """Count operator instances via the formatted plan's detail headers
    ('(N) OpName') — the tree section would double-count."""
    pat = re.compile(r"^\(\d+\) " + re.escape(op) + r"\b")
    return sum(1 for line in formatted_plan(df).splitlines() if pat.match(line))


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (broadcasts excluded)."""
    return count_op(df, "Exchange")


def broadcast_count(df: DataFrame) -> int:
    return count_op(df, "BroadcastExchange")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    plan = formatted_plan(df)
    return any(
        fragment in line for line in plan.splitlines() if "PushedFilters" in line
    )


def has_cartesian(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "CartesianProduct" in plan


def _spec_is_unpartitioned(args_line: str) -> bool:
    """True if any windowspecdefinition in a formatted-plan Arguments
    line has an EMPTY partition spec. The spec prints as
    `windowspecdefinition(part..., order... ASC|DESC ..., frame)`;
    partition columns print bare, order columns carry ASC/DESC, the
    frame is `specifiedwindowframe(...)`. So the window is
    unpartitioned iff the FIRST argument is an order column (has
    ASC/DESC before any paren) or is directly the frame (neither
    partition nor order). Verified empirically on Spark 4.1."""
    for m in re.finditer(r"windowspecdefinition\(", args_line):
        start = m.end()
        depth = 1
        i = start
        first_arg_end = None
        while i < len(args_line) and depth > 0:
            c = args_line[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1 and first_arg_end is None:
                first_arg_end = i
            i += 1
        first = args_line[start : first_arg_end if first_arg_end else i - 1]
        if first.startswith("specifiedwindowframe(") or re.search(
            r"\b(ASC|DESC)\b", first
        ):
            return True
    return False


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Arguments lines of Window/WindowInPandas nodes with an EMPTY
    partition spec — i.e. windows that execute on ONE task regardless
    of cluster size (Spark's own `WARN WindowExec: No Partition
    Defined`). WindowGroupLimit is excluded: it only ever accompanies
    a Window node with the same spec."""
    lines = formatted_plan(df).splitlines()
    hits: list[str] = []
    node = re.compile(r"^\(\d+\) Window(InPandas)?\b")
    for i, line in enumerate(lines):
        if not node.match(line):
            continue
        for j in range(i + 1, min(len(lines), i + 6)):
            if lines[j].startswith("Arguments: "):
                if _spec_is_unpartitioned(lines[j]):
                    hits.append(lines[j])
                break
    return hits


def scan_columns(df: DataFrame, table_fragment: str) -> list[str]:
    """Columns actually read from the scan whose location matches
    table_fragment (column-pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Location" in line and table_fragment in line:
            for j in range(max(0, i - 4), min(len(lines), i + 4)):
                if lines[j].startswith("ReadSchema"):
                    schema = lines[j].split("struct<", 1)[-1].rstrip(">")
                    cols = [c.split(":")[0] for c in schema.split(",") if c]
                    return cols
    return cols
