"""Subquery suite — the reference's signature feature (SURVEY.md §2.8).

The reference decorrelates EXISTS/NOT EXISTS/IN/NOT IN/scalar
subqueries into Semi/Anti/Single joins
(/root/reference/src/optimizer/rules/subquery_decorrelation.rs) with a
row-at-a-time fallback executor
(/root/reference/src/physical/operators/subquery.rs). In Spark the same
rewrites are native Catalyst rules (RewritePredicateSubquery,
DecorrelateInnerQuery), so this suite goes through ``spark.sql`` over
registered views — exercising exactly that machinery — with the
identical SQL as the DuckDB oracle wherever both dialects accept it.

Scale notes: Catalyst turns each of these into semi/anti/single hash
joins with the filter pushed below the join; no per-row subquery
execution anywhere (verified via explain — no SubqueryExec in the
final plans except broadcast-reused scalar subqueries).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.registry import register_sf_dir

# view names are session-global: remember which sf_dir is currently
# registered per session and re-register whenever it changes (a cached
# "seen this pair before" check would serve stale views if one session
# alternates between scale factors)
_ACTIVE_SF: dict[int, tuple[str, int]] = {}


def _sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    # cache key includes the registration epoch: tpch_full._register
    # re-points the SAME view names at the full 8-table schema, so a
    # plain per-session sf_dir memo would trust stale views after any
    # tpchfull_* query ran in this session (found round 6: the catalog
    # plan sweep runs tpchfull before the property suite).
    from .tpch_full import REGISTRATION_EPOCH

    sid = id(spark._jsparkSession)
    key = (sf_dir, REGISTRATION_EPOCH[0])
    if _ACTIVE_SF.get(sid) != key:
        register_sf_dir(spark, sf_dir)
        _ACTIVE_SF[sid] = key
    return spark.sql(query)


# Each entry: identical SQL text runs on Spark and DuckDB.
_SHARED_SQL: dict[str, str] = {
    # uncorrelated scalar subquery in WHERE
    "sub_scalar_uncorrelated": """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) * 1.8 FROM customer)
        ORDER BY c_custkey
    """,
    # correlated scalar subquery in SELECT list
    "sub_scalar_correlated_select": """
        SELECT n_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier
                WHERE s_nationkey = n_nationkey) AS n_suppliers
        FROM nation ORDER BY n_name
    """,
    # correlated scalar subquery in WHERE (per-group threshold)
    "sub_scalar_correlated_where": """
        SELECT s_suppkey, s_acctbal FROM supplier s1
        WHERE s_acctbal > (SELECT AVG(s2.s_acctbal) + 2500 FROM supplier s2
                           WHERE s2.s_nationkey = s1.s_nationkey)
        ORDER BY s_suppkey
    """,
    # EXISTS -> semi join
    "sub_exists": """
        SELECT c_custkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        ORDER BY c_custkey
    """,
    # NOT EXISTS -> anti join
    "sub_not_exists": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    # IN subquery -> semi join
    "sub_in": """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        ORDER BY s_suppkey
    """,
    # NOT IN with non-null inner (anti join; null-aware path)
    "sub_not_in": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)
    """,
    # EXISTS with extra correlated predicate (residual filter semi join)
    "sub_exists_theta": """
        SELECT o_orderkey FROM orders
        WHERE o_totalprice > 400000
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_extendedprice > o_totalprice / 8)
        ORDER BY o_orderkey
    """,
    # subquery in FROM (derived table) + join
    "sub_derived_table": """
        SELECT n_name, t.cnt FROM nation
        JOIN (SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM supplier GROUP BY s_nationkey) t
          ON t.s_nationkey = n_nationkey
        WHERE t.cnt > 3 ORDER BY n_name
    """,
    # CTE (WITH) referenced twice
    "sub_cte_reuse": """
        WITH big AS (SELECT o_custkey, o_totalprice FROM orders
                     WHERE o_totalprice > 300000)
        SELECT CAST(a.o_custkey % 10 AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS pairs
        FROM big a JOIN big b ON a.o_custkey = b.o_custkey
        GROUP BY 1 ORDER BY 1
    """,
    # scalar subquery pair in projection (min/max of another table)
    "sub_scalar_minmax": """
        SELECT r_name,
               (SELECT MIN(n_nationkey) FROM nation WHERE n_regionkey = r_regionkey) AS min_n,
               (SELECT MAX(n_nationkey) FROM nation WHERE n_regionkey = r_regionkey) AS max_n
        FROM region ORDER BY r_name
    """,
}

# ALL/ANY quantified comparisons: Spark SQL has no `> ALL(...)` syntax;
# the standard rewrite is the scalar MAX/MIN aggregate (what the
# reference's binder would emit too). Oracle keeps the ALL form so the
# semantic equivalence is what's being checked.
_SPARK_ONLY_SQL = {
    "sub_all_rewrite": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM supplier
        WHERE s_acctbal > (SELECT MAX(c_acctbal / 2) FROM customer WHERE c_custkey < 5)
    """,
}
_ORACLE_ONLY_SQL = {
    "sub_all_rewrite": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM supplier
        WHERE s_acctbal > ALL (SELECT c_acctbal / 2 FROM customer WHERE c_custkey < 5)
    """,
}

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: (lambda s, d, q=q: _sql(s, d, q))
    for name, q in {**_SHARED_SQL, **_SPARK_ONLY_SQL}.items()
}

ORACLE: dict[str, str] = {**_SHARED_SQL, **_ORACLE_ONLY_SQL}
