"""Set-operation suite (SURVEY.md §2.6).

Reference: UNION [ALL] via UnionExec (+ distinct-agg wrapper),
INTERSECT/EXCEPT bound as Semi/Anti joins over all columns
(/root/reference/src/planner/binder.rs:193-276,
/root/reference/src/physical/operators/union.rs). Spark primitives:
union/unionAll/intersect/intersectAll/exceptAll/subtract — all native
shuffle-based set ops (distinct variants are hash-aggregates on all
columns, identical strategy to the reference but distributed).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tpch import tables


def _split(spark: SparkSession, sf_dir: str):
    """Two overlapping customer-key sets built from orders/customer."""
    customer, orders = tables(spark, sf_dir, "customer", "orders")
    a = customer.filter(F.col("c_custkey") < 600).select("c_custkey")
    b = orders.filter(F.col("o_custkey").between(300, 900)).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a, b


def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _split(spark, sf_dir)
    return a.unionAll(b).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("c_custkey").cast("bigint").alias("s")
    )


SET_UNION_ALL_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c_custkey) AS BIGINT) AS s FROM (
  SELECT c_custkey FROM customer WHERE c_custkey < 600
  UNION ALL
  SELECT o_custkey AS c_custkey FROM orders WHERE o_custkey BETWEEN 300 AND 900
)
"""


def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _split(spark, sf_dir)
    return a.union(b).distinct().orderBy("c_custkey")


SET_UNION_DISTINCT_SQL = """
SELECT c_custkey FROM customer WHERE c_custkey < 600
UNION
SELECT o_custkey AS c_custkey FROM orders WHERE o_custkey BETWEEN 300 AND 900
ORDER BY c_custkey
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _split(spark, sf_dir)
    return a.intersect(b).orderBy("c_custkey")


SET_INTERSECT_SQL = """
SELECT c_custkey FROM customer WHERE c_custkey < 600
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_custkey BETWEEN 300 AND 900
ORDER BY c_custkey
"""


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _split(spark, sf_dir)
    return a.intersectAll(b).groupBy().agg(F.count(F.lit(1)).alias("n"))


SET_INTERSECT_ALL_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT c_custkey FROM customer WHERE c_custkey < 600
  INTERSECT ALL
  SELECT o_custkey AS c_custkey FROM orders WHERE o_custkey BETWEEN 300 AND 900
)
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _split(spark, sf_dir)
    return a.subtract(b).orderBy("c_custkey")


SET_EXCEPT_SQL = """
SELECT c_custkey FROM customer WHERE c_custkey < 600
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_custkey BETWEEN 300 AND 900
ORDER BY c_custkey
"""


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _split(spark, sf_dir)
    return a.exceptAll(b).groupBy().agg(F.count(F.lit(1)).alias("n"))


SET_EXCEPT_ALL_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT c_custkey FROM customer WHERE c_custkey < 600
  EXCEPT ALL
  SELECT o_custkey AS c_custkey FROM orders WHERE o_custkey BETWEEN 300 AND 900
)
"""


def set_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES inline relation + EmptyRelation-style SELECT-without-FROM
    (reference binder.rs:279-311, 428-437)."""
    vals = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], ["id", "word"]
    )
    return vals.withColumn("doubled", F.col("id") * 2).orderBy("id")


SET_VALUES_SQL = """
SELECT id, word, id * 2 AS doubled
FROM (VALUES (1, 'one'), (2, 'two'), (3, 'three')) AS t(id, word)
ORDER BY id
"""


def set_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over multiple columns (hash-agg on all columns)."""
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


SET_DISTINCT_MULTI_SQL = """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
ORDER BY o_orderstatus, o_orderpriority
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "set_union_all": set_union_all,
    "set_union_distinct": set_union_distinct,
    "set_intersect": set_intersect,
    "set_intersect_all": set_intersect_all,
    "set_except": set_except,
    "set_except_all": set_except_all,
    "set_values_inline": set_values_inline,
    "set_distinct_multi": set_distinct_multi,
}

ORACLE: dict[str, str] = {
    "set_union_all": SET_UNION_ALL_SQL,
    "set_union_distinct": SET_UNION_DISTINCT_SQL,
    "set_intersect": SET_INTERSECT_SQL,
    "set_intersect_all": SET_INTERSECT_ALL_SQL,
    "set_except": SET_EXCEPT_SQL,
    "set_except_all": SET_EXCEPT_ALL_SQL,
    "set_values_inline": SET_VALUES_SQL,
    "set_distinct_multi": SET_DISTINCT_MULTI_SQL,
}
