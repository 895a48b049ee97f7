"""Bucketed managed tables: co-located, shuffle-free joins.

The 100 TB pattern the prompt's scale notes call for: write both join
sides bucketed (and sorted) by the join key; Spark's bucketed scan
then joins them with NO Exchange and NO Sort — each task reads the
matching bucket pair. The reference's single-node hash join has no
equivalent; this is the distributed co-location strategy that replaces
its shared-build-side OnceCell trick
(/root/reference/src/physical/operators/hash_join.rs:37-45) at
cluster scale.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist df as a managed bucketed (+sorted) table (idempotent:
    drops any prior table AND its on-disk location — a fresh session's
    in-memory metastore does not know about leftover directories)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    loc = os.path.join(warehouse.removeprefix("file:"), table)
    if loc and os.path.exists(loc):
        shutil.rmtree(loc, ignore_errors=True)
    # one file per bucket: sorted-bucket scans only elide the
    # downstream Sort when each bucket is a single sorted file
    df = df.repartition(n_buckets, *[df[c] for c in bucket_cols])
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables — planner elides the shuffle."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
