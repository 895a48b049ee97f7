"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (TPC-H Q1 shape) on sf0.001.
queries()      — every implemented query/operator from SURVEY.md §2.
oracle_sql()   — DuckDB-equivalent SQL for each query (the t2 gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's session conf to a driver-provided session."""
    # Nanosecond parquet timestamps (events.ts) must read as LONG; the
    # registration layer converts to TIMESTAMP_NTZ.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from iceberg_query_engine_spark.queries import tpch

    _configure(spark)
    return tpch.q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from iceberg_query_engine_spark.queries import catalog

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in catalog.all_queries().items():
        out[name] = _wrap(fn)
    return out


def _wrap(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(_configure(spark), sf_dir)

    return run


def oracle_sql() -> dict[str, str]:
    """DuckDB SQL twin for each entry in queries() (omissions = rows-only check)."""
    from iceberg_query_engine_spark.queries import catalog

    return catalog.all_oracles()
