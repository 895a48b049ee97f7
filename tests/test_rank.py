"""Distributed exact rank/ntile vs the single-partition built-ins.

The two-pass range rank must be BIT-IDENTICAL to
``row_number()/ntile() OVER (ORDER BY ...)`` (that is what keeps the
DuckDB oracles of ev_rfm / op_zorder / text_zipf_fit unchanged) while
never producing an unpartitioned Window node.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from iceberg_query_engine_spark.operators.rank import ntile_by_range, ranked_by_range
from iceberg_query_engine_spark.plans import introspect as pi


def _corpus(spark, n, seed=7):
    # non-trivial value distribution with ties on v, unique id tie-break
    return spark.range(n).select(
        F.col("id"),
        (F.xxhash64(F.col("id") + seed) % 97).alias("v"),
    )


@pytest.mark.parametrize("n,parts", [(0, 4), (1, 4), (5, 4), (97, 8), (1000, 16)])
def test_row_number_exact(spark, n, parts):
    df = _corpus(spark, n)
    got, total = ranked_by_range(
        df, ["v", "id"], out="rn", num_partitions=parts, small_threshold_bytes=0
    )
    assert total == n
    want = df.withColumn("rn", F.row_number().over(Window.orderBy("v", "id")))
    assert sorted(got.collect()) == sorted(want.collect())


def test_row_number_desc_order(spark):
    df = _corpus(spark, 500)
    got, _ = ranked_by_range(
        df,
        [F.col("v").desc(), F.col("id")],
        out="rn",
        num_partitions=8,
        small_threshold_bytes=0,
    )
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("v").desc(), F.col("id")))
    )
    assert sorted(got.collect()) == sorted(want.collect())


@pytest.mark.parametrize("n,b", [(3, 5), (100, 5), (101, 5), (104, 5), (1000, 16), (50, 1024)])
def test_ntile_exact(spark, n, b):
    df = _corpus(spark, n)
    got = ntile_by_range(
        df, b, ["v", "id"], out="t", num_partitions=8, small_threshold_bytes=0
    )
    want = df.withColumn("t", F.ntile(b).over(Window.orderBy("v", "id")))
    assert sorted(got.collect()) == sorted(want.collect())


def test_no_unpartitioned_window_in_plan(spark):
    df = _corpus(spark, 200)
    got = ntile_by_range(
        df, 5, ["v", "id"], out="t", num_partitions=8, small_threshold_bytes=0
    )
    assert pi.unpartitioned_windows(got) == []
    # sanity: the detector DOES flag the naive formulation
    naive = df.withColumn("t", F.ntile(5).over(Window.orderBy("v", "id")))
    assert len(pi.unpartitioned_windows(naive)) == 1


@pytest.mark.parametrize("n,parts", [(0, 4), (1, 4), (97, 8), (1000, 16)])
def test_cumsum_exact(spark, n, parts):
    from iceberg_query_engine_spark.operators.rank import cumsum_by_range

    # decimal values: order-independent addition (the function's contract)
    df = _corpus(spark, n).select(
        "id", "v", ((F.col("v") + 100) / 4).cast("decimal(18,2)").alias("x")
    )
    got = cumsum_by_range(
        df, ["v", "id"], "x", out="run", num_partitions=parts, small_threshold_bytes=0
    )
    want = df.withColumn(
        "run",
        F.sum("x").over(
            Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert sorted(map(str, got.collect())) == sorted(map(str, want.collect()))


def test_cumsum_no_unpartitioned_window(spark):
    from iceberg_query_engine_spark.operators.rank import cumsum_by_range

    df = _corpus(spark, 300).select(
        "id", "v", F.col("v").cast("decimal(18,2)").alias("x")
    )
    got = cumsum_by_range(
        df, ["v", "id"], "x", out="run", num_partitions=8, small_threshold_bytes=0
    )
    assert pi.unpartitioned_windows(got) == []


# ---------------------------------------------------------------------------
# Size gate (r6 verdict #4): below the estimated-bytes threshold the
# one-shard degenerate path must be bit-identical to the range path,
# still never plan an unpartitioned window, and the gate must read
# Catalyst's estimate (big threshold → small path; 0 → range path).


def test_gate_parity_rank(spark):
    df = _corpus(spark, 777)
    small, n_small = ranked_by_range(
        df, ["v", "id"], out="rn", small_threshold_bytes=1 << 40
    )
    big, n_big = ranked_by_range(
        df, ["v", "id"], out="rn", num_partitions=8, small_threshold_bytes=0
    )
    assert n_small == n_big == 777
    assert sorted(small.collect()) == sorted(big.collect())
    assert small.schema == big.schema
    assert pi.unpartitioned_windows(small) == []


def test_gate_parity_ntile(spark):
    df = _corpus(spark, 333)
    small = ntile_by_range(df, 7, ["v", "id"], out="t", small_threshold_bytes=1 << 40)
    big = ntile_by_range(
        df, 7, ["v", "id"], out="t", num_partitions=8, small_threshold_bytes=0
    )
    assert sorted(small.collect()) == sorted(big.collect())
    # dtypes (names + types) must agree; nullability flags may differ
    # (when/otherwise vs raw ntile) and don't affect the driver compare
    assert small.dtypes == big.dtypes
    assert pi.unpartitioned_windows(small) == []


def test_gate_parity_cumsum(spark):
    from iceberg_query_engine_spark.operators.rank import cumsum_by_range

    df = _corpus(spark, 400).select(
        "id", "v", ((F.col("v") + 7) / 2).cast("decimal(18,2)").alias("x")
    )
    small = cumsum_by_range(
        df, ["v", "id"], "x", out="run", rank_out="rn", small_threshold_bytes=1 << 40
    )
    big = cumsum_by_range(
        df,
        ["v", "id"],
        "x",
        out="run",
        rank_out="rn",
        num_partitions=8,
        small_threshold_bytes=0,
    )
    assert sorted(map(str, small.collect())) == sorted(map(str, big.collect()))
    assert pi.unpartitioned_windows(small) == []


def test_gate_reads_plan_estimate(spark):
    """A raw parquet scan's estimate tracks file bytes: the sf0.001
    orders table must gate small under the default threshold, and a
    threshold of 1 byte must force the range path (two-pass offsets
    plan → localCheckpoint scan appears, no ntile node)."""
    import os

    from iceberg_query_engine_spark.operators.rank import _plan_size_bytes

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    df = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    est = _plan_size_bytes(df)
    assert 0 < est < (64 << 20)
    small = ntile_by_range(df, 4, ["o_orderkey"], out="t")
    assert "ntile" in pi.formatted_plan(small).lower()
    big = ntile_by_range(df, 4, ["o_orderkey"], out="t", small_threshold_bytes=1)
    assert "ntile" not in pi.formatted_plan(big).lower()
