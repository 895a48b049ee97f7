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

def test_respread_guard_restores_scan_parallelism(spark, tmp_path):
    """A file written as ONE giant row group is scanned by one task
    (Spark cannot split inside a row group); load_table detects the
    footer pathology against the session's maxPartitionBytes target and
    round-robins once. Well-laid-out input is left untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 200_000
    big = str(tmp_path / "big.parquet")
    pq.write_table(
        pa.table({"k": list(range(n)), "s": ["x" * 40] * n}), big,
        row_group_size=n,  # one row group ≈ 9 MB
    )
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))  # 1 MB target
    try:
        df = load_table(spark, big)
        assert df.count() == n
        assert df.rdd.getNumPartitions() > 1  # respread fired
        assert "Exchange" in df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        ) or df.rdd.getNumPartitions() > 1

        # bounded row groups → no respread, scan splits natively
        good = str(tmp_path / "good.parquet")
        pq.write_table(
            pa.table({"k": list(range(n)), "s": ["x" * 40] * n}), good,
            row_group_size=8192,
        )
        df2 = load_table(spark, good)
        plan = df2._sc._jvm.PythonSQLUtils.explainString(
            df2._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan  # untouched: plain scan
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
