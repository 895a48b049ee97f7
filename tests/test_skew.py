"""Salted skew operators: exact equivalence with the naive plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_query_engine_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_equals_plain_agg(spark, sf_oracle):
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("sq"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("l_extendedprice").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    salted = (
        salted_agg(
            li,
            keys=["l_returnflag"],
            aggs={
                "sq": ("sum", "l_quantity"),
                "n": ("count", "l_quantity"),
                "mn": ("min", "l_extendedprice"),
                "mx": ("max", "l_extendedprice"),
            },
            salt_cols=["l_orderkey"],
            n_salts=16,
        )
        .orderBy("l_returnflag")
        .collect()
    )
    # l_quantity is integral → sums are exact; counts/min/max exact anyway
    assert [tuple(r) for r in plain] == [tuple(r) for r in salted]


def test_salted_join_equals_plain_join(spark, sf_oracle):
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    sup = spark.read.parquet(f"{sf_oracle}/supplier.parquet").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    plain = (
        li.join(sup, "l_suppkey")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_suppkey")
        .collect()
    )
    salted = (
        salted_join(li, sup, key="l_suppkey", n_salts=8)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_suppkey")
        .collect()
    )
    assert [tuple(r) for r in plain] == [tuple(r) for r in salted]
