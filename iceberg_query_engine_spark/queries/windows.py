"""Window-function suite — surplus surface the reference lacks.

The reference has NO window functions (SURVEY.md "What it is NOT";
its roadmap lists them at /root/reference/README.md:277-281). Spark
gives them natively; we expose ranking, offset, framed-aggregate and
distribution functions over deterministic (unique) orderings so the
DuckDB oracle compares exactly.

Scale notes: each window here partitions by a bounded-cardinality key
before sorting, so at 100 TB every partition sorts locally after a
hash shuffle — no global sort. Frames are bounded (rowsBetween) so
state stays O(frame).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .tpch import tables


def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    (supplier,) = tables(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_suppkey"))
    return (
        supplier.select(
            "s_suppkey",
            F.col("s_nationkey").cast("bigint").alias("nk"),
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rk"),
            F.dense_rank().over(w).cast("bigint").alias("drk"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
        )
        .orderBy("s_suppkey")
    )


WIN_RANKING_SQL = """
SELECT s_suppkey, CAST(s_nationkey AS BIGINT) AS nk,
  CAST(row_number() OVER w AS BIGINT) AS rn,
  CAST(rank() OVER w AS BIGINT) AS rk,
  CAST(dense_rank() OVER w AS BIGINT) AS drk,
  CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_suppkey)
ORDER BY s_suppkey
"""


def win_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return (
        o.select(
            "o_orderkey",
            F.lag("o_totalprice", 1).over(w).alias("prev_price"),
            F.lead("o_totalprice", 1).over(w).alias("next_price"),
            F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
            F.first("o_totalprice").over(w).alias("first_price"),
        )
        .orderBy("o_orderkey")
    )


WIN_OFFSET_SQL = """
SELECT o_orderkey,
  lag(o_totalprice, 1) OVER w AS prev_price,
  lead(o_totalprice, 1) OVER w AS next_price,
  lag(o_totalprice, 2, -1.0) OVER w AS prev2_price,
  first_value(o_totalprice) OVER w AS first_price
FROM orders WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
ORDER BY o_orderkey
"""


def win_framed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running + moving aggregates with explicit ROWS frames."""
    (orders,) = tables(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_custkey") < 50)
    run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mov = Window.partitionBy("o_custkey").orderBy("o_orderkey").rowsBetween(-2, 0)
    return (
        o.select(
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(run), 4).alias("run_sum"),
            F.count(F.lit(1)).over(run).cast("bigint").alias("run_cnt"),
            F.round(F.avg("o_totalprice").over(mov), 4).alias("mov_avg3"),
            F.max("o_totalprice").over(mov).alias("mov_max3"),
        )
        .orderBy("o_orderkey")
    )


WIN_FRAMED_AGG_SQL = """
SELECT o_orderkey,
  round(sum(o_totalprice) OVER run, 4) AS run_sum,
  CAST(count(*) OVER run AS BIGINT) AS run_cnt,
  round(avg(o_totalprice) OVER mov, 4) AS mov_avg3,
  max(o_totalprice) OVER mov AS mov_max3
FROM orders WHERE o_custkey < 50
WINDOW
  run AS (PARTITION BY o_custkey ORDER BY o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  mov AS (PARTITION BY o_custkey ORDER BY o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey
"""


def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    (nation,) = tables(spark, sf_dir, "nation")
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    return (
        nation.select(
            "n_nationkey",
            F.round(F.percent_rank().over(w), 9).alias("prk"),
            F.round(F.cume_dist().over(w), 9).alias("cd"),
        )
        .orderBy("n_nationkey")
    )


WIN_DISTRIBUTION_SQL = """
SELECT n_nationkey,
  round(percent_rank() OVER w, 9) AS prk,
  round(cume_dist() OVER w, 9) AS cd
FROM nation
WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_nationkey)
ORDER BY n_nationkey
"""


def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic top-k-per-group pattern (row_number + filter)."""
    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 2) & (F.col("o_custkey") < 30))
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("bigint").alias("rn"))
        .orderBy("o_custkey", "rn")
    )


WIN_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 2 AND o_custkey < 30
ORDER BY o_custkey, rn
"""


def win_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — GROUPING SETS family (reference roadmap gap)."""
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
        .orderBy(
            F.col("gid"),
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


WIN_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def win_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


WIN_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def win_grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not just rollup/cube) via SQL."""
    (orders,) = tables(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__gs_orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """)


WIN_GROUPING_SETS_EXPLICIT_SQL = """
SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames (value-based, peer-inclusive — deterministic under
    ties, unlike ROWS): how many orders fall within $5000 below each
    order's total, per status. Only order-free aggregates (COUNT/MIN/
    MAX) appear so float summation order can't diverge the oracle."""
    (orders,) = tables(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-5000, 0)
    )
    return (
        orders.filter(F.col("o_orderkey") < 300)
        .select(
            "o_orderkey",
            F.count(F.lit(1)).over(w).alias("n_in_range"),
            F.round(F.min("o_totalprice").over(w), 2).alias("range_min"),
            F.round(F.max("o_totalprice").over(w), 2).alias("range_max"),
        )
        .orderBy("o_orderkey")
    )


WIN_RANGE_FRAME_SQL = """
SELECT o_orderkey,
  CAST(COUNT(*) OVER w AS BIGINT) AS n_in_range,
  round(MIN(o_totalprice) OVER w, 2) AS range_min,
  round(MAX(o_totalprice) OVER w, 2) AS range_max
FROM orders
WHERE o_orderkey < 300
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
             RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey
"""


def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value / first_value / last_value over an explicit
    unbounded-both-sides frame (default frames stop at CURRENT ROW, so
    last_value needs the full frame — a classic correctness trap)."""
    (supplier,) = tables(spark, sf_dir, "supplier")
    w = (
        Window.partitionBy("s_nationkey")
        .orderBy(F.col("s_suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        supplier.select(
            "s_suppkey",
            "s_nationkey",
            F.nth_value("s_acctbal", 2).over(w).alias("second_bal"),
            F.first_value("s_acctbal").over(w).alias("first_bal"),
            F.last_value("s_acctbal").over(w).alias("last_bal"),
        )
        .orderBy("s_suppkey")
    )


WIN_NTH_VALUE_SQL = """
SELECT s_suppkey, s_nationkey,
  nth_value(s_acctbal, 2) OVER w AS second_bal,
  first_value(s_acctbal) OVER w AS first_bal,
  last_value(s_acctbal) OVER w AS last_bal
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY s_suppkey
"""


def win_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation (UpdatingSessions +
    session-merging agg — the operator Structured Streaming shares),
    in batch mode: 30-min-gap sessions per user, session start/end
    from the operator itself. The lag/running-sum formulation
    (ev_sessionize) is the portable twin; this exercises the built-in
    operator and pins that both define sessions identically — the
    oracle replays the gap logic in SQL."""
    from .tpch import tables

    (events,) = tables(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts").cast("timestamp"), "30 minutes")
    return (
        events.filter(F.col("user_id") < 10)
        .groupBy("user_id", sw.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w").getField("start").cast("string").alias("sess_start"),
            "n_events",
        )
        .orderBy("user_id", "sess_start")
    )


WIN_SESSION_NATIVE_SQL = """
WITH ordered AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id,
    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL THEN 1
         WHEN CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
              > INTERVAL 30 MINUTE THEN 1
         ELSE 0 END AS new_sess
  FROM events WHERE user_id < 10
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
), sessed AS (
  SELECT user_id, t,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM ordered
)
SELECT user_id, CAST(MIN(t) AS VARCHAR) AS sess_start,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sessed GROUP BY user_id, sid
ORDER BY user_id, sess_start
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "win_session_native": win_session_native,
    "win_grouping_sets": win_grouping_sets_explicit,
    "win_range_frame": win_range_frame,
    "win_nth_value": win_nth_value,
    "win_ranking": win_ranking,
    "win_offset": win_offset,
    "win_framed_agg": win_framed_agg,
    "win_distribution": win_distribution,
    "win_topk_per_group": win_topk_per_group,
    "win_rollup": win_grouping_sets,
    "win_cube": win_cube,
}

ORACLE: dict[str, str] = {
    "win_session_native": WIN_SESSION_NATIVE_SQL,
    "win_grouping_sets": WIN_GROUPING_SETS_EXPLICIT_SQL,
    "win_range_frame": WIN_RANGE_FRAME_SQL,
    "win_nth_value": WIN_NTH_VALUE_SQL,
    "win_ranking": WIN_RANKING_SQL,
    "win_offset": WIN_OFFSET_SQL,
    "win_framed_agg": WIN_FRAMED_AGG_SQL,
    "win_distribution": WIN_DISTRIBUTION_SQL,
    "win_topk_per_group": WIN_TOPK_SQL,
    "win_rollup": WIN_GROUPING_SETS_SQL,
    "win_cube": WIN_CUBE_SQL,
}
