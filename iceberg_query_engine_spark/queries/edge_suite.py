"""Edge-case / null-semantics suite.

Parity with the reference's sql_comprehensive null_handling /
edge_cases / error_handling modules
(/root/reference/tests/sql_comprehensive.rs:222-1373): NULL
propagation through joins/aggregates/predicates, NOT IN + NULL
(three-valued logic), empty inputs, division semantics, DISTINCT with
NULLs, ORDER BY null placement. These are where engines silently
diverge — every one here is oracle-checked.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .subqueries import _sql
from .tpch import tables

# Shared SQL (runs verbatim on Spark and DuckDB).
_SHARED: dict[str, str] = {
    # correlated scalar subquery under ORDER BY + LIMIT — the SURVEY §7
    # risk-register shape (the reference's row-by-row SubqueryExecutor
    # tolerates it; Catalyst decorrelates it since Spark 3.4)
    "edge_correlated_limit": """
        SELECT c_custkey,
          (SELECT o_totalprice FROM orders WHERE o_custkey = c_custkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) AS top_order
        FROM customer WHERE c_custkey < 50 ORDER BY c_custkey
    """,
    # NOT IN with NULL in the inner set → empty (3-valued logic)
    "edge_not_in_with_null": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation
        WHERE n_nationkey NOT IN (SELECT CASE WHEN r_regionkey = 3 THEN NULL
                                              ELSE r_regionkey END
                                  FROM region)
    """,
    # aggregates over empty input: COUNT=0, SUM/MIN/MAX/AVG=NULL
    "edge_empty_aggregates": """
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(COUNT(n_name) AS BIGINT) AS cnt_col,
               CAST(SUM(n_nationkey) AS BIGINT) AS s,
               MIN(n_name) AS mn, MAX(n_name) AS mx, AVG(n_nationkey) AS av
        FROM nation WHERE n_nationkey < -1
    """,
    # nulls ignored by aggregates, counted by COUNT(*)
    "edge_null_aggregates": """
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(COUNT(v) AS BIGINT) AS cnt_v,
               CAST(SUM(v) AS BIGINT) AS s,
               AVG(v) AS av
        FROM (SELECT CASE WHEN n_nationkey % 3 = 0 THEN NULL
                          ELSE n_nationkey END AS v FROM nation)
    """,
    # DISTINCT treats NULLs as equal
    "edge_distinct_nulls": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
          SELECT DISTINCT CASE WHEN n_nationkey % 2 = 0 THEN NULL
                               ELSE n_regionkey END AS v
          FROM nation
        )
    """,
    # NULL-producing join keys never match
    "edge_join_null_keys": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT CASE WHEN n_nationkey < 5 THEN NULL ELSE n_regionkey END AS k
              FROM nation) a
        JOIN (SELECT r_regionkey AS k FROM region) b ON a.k = b.k
    """,
    # ORDER BY null placement, both directions
    "edge_order_by_nulls": """
        SELECT v FROM (
          SELECT CASE WHEN n_nationkey % 7 = 0 THEN NULL ELSE n_nationkey END AS v
          FROM nation
        ) ORDER BY v ASC NULLS FIRST, v DESC NULLS LAST
    """,
    # arithmetic null/zero semantics (non-ANSI: x/0 → NULL both engines)
    "edge_division": """
        SELECT n_nationkey,
               n_nationkey / nullif(n_regionkey, 0) AS div_nullif,
               CAST(n_nationkey AS DOUBLE) / 4 AS fdiv,
               n_nationkey % 4 AS m
        FROM nation ORDER BY n_nationkey
    """,
    # LIKE edge patterns: empty, %, _, escaped literal %
    "edge_like_patterns": """
        SELECT CAST(count_if(n_name LIKE 'NATION%') AS BIGINT) AS a,
               CAST(count_if(n_name LIKE '%_1%') AS BIGINT) AS b,
               CAST(count_if(n_name LIKE 'NATION!_1' ESCAPE '!') AS BIGINT) AS c,
               CAST(count_if(n_name LIKE '') AS BIGINT) AS d
        FROM nation
    """,
    # string edge: empty strings vs NULL in concat/length
    "edge_empty_strings": """
        SELECT CAST(length('') AS BIGINT) AS len_empty,
               '' || 'x' AS cat_empty,
               CAST(NULL AS VARCHAR(10)) IS NULL AS null_str,
               coalesce(CAST(NULL AS VARCHAR(10)), 'fb') AS coal
    """,
    # CASE with no matching branch and no ELSE → NULL
    "edge_case_no_else": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_null FROM (
          SELECT CASE WHEN n_nationkey > 99 THEN 'x' END AS v FROM nation
        ) WHERE v IS NULL
    """,
    # LIMIT 0 / OFFSET beyond end
    "edge_limit_offset": """
        SELECT CAST((SELECT COUNT(*) FROM (SELECT * FROM nation LIMIT 0)) AS BIGINT) AS lim0,
               CAST((SELECT COUNT(*) FROM (SELECT * FROM nation LIMIT 5 OFFSET 23)) AS BIGINT) AS off_tail,
               CAST((SELECT COUNT(*) FROM (SELECT * FROM nation LIMIT 5 OFFSET 100)) AS BIGINT) AS off_past
    """,
}


def _wrap(q: str):
    return lambda spark, sf_dir: _sql(spark, sf_dir, q)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: _wrap(q) for name, q in _SHARED.items()
}

ORACLE: dict[str, str] = dict(_SHARED)
