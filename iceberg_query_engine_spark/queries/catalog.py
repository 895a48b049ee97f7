"""Master registry of every query the engine exposes to the driver.

Each module contributes (queries, oracles); keys must line up. Queries
without an oracle get the driver's weaker rows-only check (reserved
for genuinely non-SQL-expressible ops, e.g. streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import tpch

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    out.update(tpch.QUERIES)
    for mod in _extension_modules():
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(tpch.ORACLE)
    for mod in _extension_modules():
        out.update(mod.ORACLE)
    return out


def _extension_modules():
    mods = []
    for name in ("tpch_full", "functions_suite", "subqueries", "setops", "windows", "dedup_suite",
                 "similarity_suite", "text_suite", "events_suite", "streaming_suite",
                 "compat_suite", "multimodal_suite", "operators_suite",
                 "iceberg_suite", "edge_suite", "joins_suite"):
        # No silent skips: a broken suite import must fail the driver
        # loudly, not shrink the query surface unnoticed (a swallowed
        # ImportError here would silently drop every query in the
        # module from the correctness gate).
        mods.append(__import__(f"{__package__}.{name}", fromlist=[name]))
    return mods
