"""Join-type coverage suite (SURVEY.md §2.3).

Covers the join kinds not already exercised by the TPC-H suite
(inner/left/semi/anti appear there): RIGHT OUTER, FULL OUTER, explicit
CROSS, the Mark join (IN-subquery as a boolean projection column —
Catalyst ExistenceJoin), and the Single join (scalar subquery per
outer row). Reference join types:
/root/reference/src/planner/logical_plan.rs:8-21, probe loops
/root/reference/src/physical/operators/hash_join.rs:1589-1860.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .subqueries import _sql
from .tpch import tables


def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every nation keeps a row even with no high-balance supplier."""
    nation, supplier = tables(spark, sf_dir, "nation", "supplier")
    rich = supplier.filter(F.col("s_acctbal") > 9000)
    return (
        rich.join(nation, F.col("s_nationkey") == F.col("n_nationkey"), "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_rich"))
        .orderBy("n_name")
    )


JOIN_RIGHT_OUTER_SQL = """
SELECT n_name, CAST(COUNT(s_suppkey) AS BIGINT) AS n_rich
FROM (SELECT * FROM supplier WHERE s_acctbal > 9000) s
RIGHT OUTER JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer: regions 0-2 vs nations in regions 2-4 — unmatched
    rows survive on both sides."""
    nation, region = tables(spark, sf_dir, "nation", "region")
    r = region.filter(F.col("r_regionkey") <= 2)
    n = nation.filter(F.col("n_regionkey") >= 2)
    return (
        r.join(n, F.col("r_regionkey") == F.col("n_regionkey"), "full")
        .select(
            F.coalesce(F.col("r_regionkey"), F.lit(-1)).cast("bigint").alias("rk"),
            F.coalesce(F.col("n_nationkey"), F.lit(-1)).cast("bigint").alias("nk"),
            "r_name",
            "n_name",
        )
        .orderBy("rk", "nk")
    )


JOIN_FULL_OUTER_SQL = """
SELECT CAST(coalesce(r_regionkey, -1) AS BIGINT) AS rk,
       CAST(coalesce(n_nationkey, -1) AS BIGINT) AS nk,
       r_name, n_name
FROM (SELECT * FROM region WHERE r_regionkey <= 2) r
FULL OUTER JOIN (SELECT * FROM nation WHERE n_regionkey >= 2) n
  ON r_regionkey = n_regionkey
ORDER BY rk, nk
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (reference Cross join type)."""
    (region,) = tables(spark, sf_dir, "region")
    a = region.select(F.col("r_name").alias("a_name"))
    b = region.select(F.col("r_name").alias("b_name"))
    return a.crossJoin(b).orderBy("a_name", "b_name")


JOIN_CROSS_SQL = """
SELECT a.r_name AS a_name, b.r_name AS b_name
FROM region a CROSS JOIN region b
ORDER BY a_name, b_name
"""


# Mark join: IN-subquery projected as a boolean column (ExistenceJoin).
_MARK_SQL = """
    SELECT n_name,
           n_nationkey IN (SELECT s_nationkey FROM supplier
                           WHERE s_acctbal > 9000) AS has_rich_supplier
    FROM nation ORDER BY n_name
"""

# Single join: scalar subquery per outer row (≤1 row guaranteed).
_SINGLE_SQL = """
    SELECT r_name,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
            WHERE n_regionkey = r_regionkey) AS n_nations
    FROM region ORDER BY r_name
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "join_right_outer": join_right_outer,
    "join_full_outer": join_full_outer,
    "join_cross": join_cross,
    "join_mark": lambda s, d: _sql(s, d, _MARK_SQL),
    "join_single": lambda s, d: _sql(s, d, _SINGLE_SQL),
}

ORACLE: dict[str, str] = {
    "join_right_outer": JOIN_RIGHT_OUTER_SQL,
    "join_full_outer": JOIN_FULL_OUTER_SQL,
    "join_cross": JOIN_CROSS_SQL,
    "join_mark": _MARK_SQL,
    "join_single": _SINGLE_SQL,
}
