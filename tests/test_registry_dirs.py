"""Directory-of-parquet-files tables (reference ParquetTable supports
single file OR directory — /root/reference/src/storage/parquet.rs:26-260)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_query_engine_spark.sources.registry import load_table, register_parquet


def test_directory_table(spark, sf_oracle, tmp_path):
    nation = spark.read.parquet(f"{sf_oracle}/nation.parquet")
    d = str(tmp_path / "nation_dir")
    # two files in one directory = one table
    nation.filter(F.col("n_nationkey") < 10).write.mode("overwrite").parquet(d)
    nation.filter(F.col("n_nationkey") >= 10).write.mode("append").parquet(d)
    df = load_table(spark, d)
    assert df.count() == 25
    assert set(df.columns) == {"n_nationkey", "n_name", "n_regionkey"}
    register_parquet(spark, "nation_dir", d)
    assert spark.sql("SELECT COUNT(*) AS n FROM nation_dir").collect()[0].n == 25
