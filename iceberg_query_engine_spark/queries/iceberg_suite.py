"""Driver-visible queries for the iceberg-lite table format.

Each query materializes a two-snapshot partitioned table under /tmp
from the `orders` source, then exercises snapshot time travel and
pruned reads; the oracle replays the equivalent filters on the raw
parquet. (Format parity: reference IcebergScanExec,
/root/reference/src/physical/operators/iceberg.rs.)
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.iceberg_lite import IcebergLiteTable, PartitionFilter, write_snapshot
from .tpch import tables

_CACHE: dict[str, str] = {}


def _table(spark: SparkSession, sf_dir: str) -> str:
    key = sf_dir
    if key in _CACHE and os.path.exists(_CACHE[key]):
        return _CACHE[key]
    path = os.path.join(
        tempfile.gettempdir(), "iceberg_lite", sf_dir.strip("/").replace("/", "_"), "orders"
    )
    if not os.path.exists(os.path.join(path, "metadata", "v0.metadata.json")):
        (orders,) = tables(spark, sf_dir, "orders")
        write_snapshot(
            orders.filter(F.col("o_orderkey") < 500),
            path,
            partition_by="o_orderstatus",
            stats_columns=["o_orderkey", "o_totalprice"],
        )
        write_snapshot(
            orders.filter(F.col("o_orderkey").between(500, 999)),
            path,
            partition_by="o_orderstatus",
            stats_columns=["o_orderkey", "o_totalprice"],
        )
    _CACHE[key] = path
    return path


def iceberg_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row counts + totals at snapshot 1 vs current (snapshot 2)."""
    t = IcebergLiteTable(_table(spark, sf_dir))
    snap1 = t.read(spark, snapshot_id=1).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    ).withColumn("snapshot", F.lit(1))
    cur = t.read(spark).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    ).withColumn("snapshot", F.lit(2))
    return snap1.unionByName(cur).select("snapshot", "n", "total").orderBy("snapshot")


ICEBERG_TIME_TRAVEL_SQL = """
SELECT 1 AS snapshot, CAST(COUNT(*) AS BIGINT) AS n, round(SUM(o_totalprice), 2) AS total
FROM orders WHERE o_orderkey < 500
UNION ALL
SELECT 2 AS snapshot, CAST(COUNT(*) AS BIGINT) AS n, round(SUM(o_totalprice), 2) AS total
FROM orders WHERE o_orderkey < 1000
ORDER BY snapshot
"""


def iceberg_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition + stats pruned read; Spark re-applies exact filters."""
    t = IcebergLiteTable(_table(spark, sf_dir))
    df = t.read(
        spark,
        partition_filters=[PartitionFilter("o_orderstatus", ["F", "O"])],
        predicates=[("o_orderkey", "<", 500)],
    )
    return (
        df.filter((F.col("o_orderkey") < 500) & F.col("o_orderstatus").isin("F", "O"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


ICEBERG_PRUNED_SCAN_SQL = """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
FROM orders
WHERE o_orderkey < 500 AND o_orderstatus IN ('F', 'O')
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "iceberg_time_travel": iceberg_time_travel,
    "iceberg_pruned_scan": iceberg_pruned_scan,
}

ORACLE: dict[str, str] = {
    "iceberg_time_travel": ICEBERG_TIME_TRAVEL_SQL,
    "iceberg_pruned_scan": ICEBERG_PRUNED_SCAN_SQL,
}
