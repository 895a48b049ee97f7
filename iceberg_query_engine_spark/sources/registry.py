"""Table registration: parquet file/dir -> named temp views.

Mirrors the reference's catalog + TableProvider surface
(/root/reference/src/planner/binder.rs:20-48 InMemoryCatalog,
/root/reference/src/storage/parquet.rs:26-260 ParquetTable): a table is
a name bound to a parquet file or directory; schema comes from the
footer. Spark's DSv2 parquet source gives vectorized scan, row-group
pruning, predicate pushdown and column pruning natively (reference
reimplements those at src/storage/row_group_pruning.rs and
src/physical/operators/streaming_parquet_scan.rs).

Column-level normalization applied at registration:
- nanosecond INT64 timestamps (read as LONG via
  spark.sql.legacy.parquet.nanosAsLong) are converted to TIMESTAMP_NTZ
  by integer-dividing to microseconds. DuckDB's ns->us cast truncates
  identically, so oracle comparisons stay exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Canonical test-corpus tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _normalize_ns_timestamps(df: DataFrame, path: str) -> DataFrame:
    """Convert LONG columns that are physically ns-timestamps to TIMESTAMP_NTZ.

    Detection uses the parquet footer (pyarrow) so we only touch true
    ns-timestamp columns, not ordinary bigints.
    """
    try:
        import pyarrow.parquet as pq

        target = path
        if os.path.isdir(path):
            inner = [f for f in os.listdir(path) if f.endswith(".parquet")]
            if not inner:
                return df
            target = os.path.join(path, inner[0])
        schema = pq.read_schema(target)
    except Exception:
        return df
    for field in schema:
        if str(field.type) == "timestamp[ns]" and field.name in df.columns:
            # Exact integer division: float division loses µs precision
            # (ns epochs ~1.7e18 exceed double's 53-bit mantissa).
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"`{field.name}` div 1000")).cast(
                    "timestamp_ntz"
                ),
            )
    return df


def load_table(spark: SparkSession, path: str) -> DataFrame:
    """Load one parquet file/dir as a DataFrame (schema from footer)."""
    df = spark.read.parquet(path)
    return _normalize_ns_timestamps(df, path)


def register_parquet(spark: SparkSession, name: str, path: str) -> DataFrame:
    """Register a parquet file/dir as temp view `name`; returns the DF."""
    df = load_table(spark, path)
    df.createOrReplaceTempView(name)
    return df


def register_sf_dir(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every canonical table found under an sf directory."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = register_parquet(spark, name, path)
    return out
