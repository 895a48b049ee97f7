"""Bucketed co-located joins: correctness AND the shuffle-free plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_query_engine_spark.plans import introspect as pi
from iceberg_query_engine_spark.sources.bucketed import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_oracle):
    orders = spark.read.parquet(f"{sf_oracle}/orders.parquet")
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
    )
    return "b_orders", "b_lineitem"


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # at sf0.01 the small side would broadcast (also shuffle-free);
    # force the merge path to demonstrate bucket co-location
    j = spark.table(lt).hint("merge").join(spark.table(rt), ["o_orderkey"])
    agg = j.groupBy().agg(F.count(F.lit(1)).alias("n"))
    plan = pi.formatted_plan(j)
    # co-located: the sort-merge join introduces NO Exchange — the
    # shuffle elision that makes repeated joins on the bucket key free
    # at 100 TB. (Spark still inserts local Sorts: file-source bucketed
    # tables don't propagate sortBy ordering to the planner.)
    assert pi.shuffle_count(j) == 0, plan
    assert "SortMergeJoin" in plan
    # correctness vs the ordinary (broadcast) join
    n_bucketed = agg.collect()[0].n
    n_plain = bucketed_join(spark, lt, rt, ["o_orderkey"]).count()
    assert n_bucketed == n_plain


def test_bucketed_agg_avoids_shuffle(spark, bucketed_tables):
    lt, _ = bucketed_tables
    # groupBy on the bucket key needs no exchange either
    agg = spark.table(lt).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    assert pi.shuffle_count(agg) == 0
