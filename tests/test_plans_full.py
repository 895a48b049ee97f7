"""Plan-shape guardrails for the verbatim TPC-H 22 (full 8-table schema).

Same contract as tests/test_plans.py but over queries/tpch_full.py —
the sf10 bench (BENCH_SCALE.md) showed these exact properties are what
separate 4s queries from 40s ones at 60M rows, so pin them at the
committed sf0.01 corpus where plan SHAPE (not broadcast thresholds)
is the invariant: no cartesian products, filters reaching the scans,
semi/anti decorrelation, top-k fusion.
"""

from __future__ import annotations

import pytest

from iceberg_query_engine_spark.plans import introspect as pi
from iceberg_query_engine_spark.queries import tpch_full


@pytest.fixture(scope="module")
def dfs(spark):
    tpch_full._register(spark, tpch_full.ORACLE_DIR)

    def run(n: int):
        return spark.sql(tpch_full.QUERY_TEXTS[n])

    return run


def test_no_cartesian_anywhere(spark, dfs):
    """None of the 22 verbatim texts may plan a cartesian or
    broadcast-nested-loop join — q5/q7/q9's 6-8 way joins all have
    complete equi-chains, so any cross product is a planner loss."""
    for n in range(1, 23):
        plan = pi.formatted_plan(dfs(n))
        assert "CartesianProduct" not in plan, f"q{n} planned a cartesian"
        assert "BroadcastNestedLoopJoin" not in plan, f"q{n} planned a BNLJ"


def test_q1_agg_pushdown_shape(spark, dfs):
    df = dfs(1)
    assert pi.has_pushed_filter(df, "LessThanOrEqual(l_shipdate")
    assert pi.shuffle_count(df) <= 2  # partial+final agg, then orderBy


def test_q6_scan_bound(spark, dfs):
    df = dfs(6)
    assert pi.has_pushed_filter(df, "GreaterThanOrEqual(l_shipdate")
    assert pi.shuffle_count(df) == 1


def test_q9_partsupp_join_shape(spark, dfs):
    """q9 joins all of part/supplier/partsupp/lineitem/orders/nation:
    the part LIKE filter must reach the part scan (it is what makes the
    runtime-filter cascade effective at scale)."""
    df = dfs(9)
    assert pi.has_pushed_filter(df, "StringStartsWith(p_name")
    assert not pi.has_cartesian(df)


def test_q18_topk_fusion(spark, dfs):
    plan = pi.formatted_plan(dfs(18))
    assert "TakeOrderedAndProject" in plan


def test_q21_decorrelated(spark, dfs):
    plan = pi.formatted_plan(dfs(21))
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_q4_single_table_agg(spark, dfs):
    """The reference's adapted q4 drops the EXISTS (queries.rs — its
    documented deviation), leaving a filtered single-table aggregate:
    pushdown + partial/final agg, two shuffles max."""
    df = dfs(4)
    assert pi.has_pushed_filter(df, "GreaterThanOrEqual(o_orderdate")
    assert pi.shuffle_count(df) <= 2


def test_q17_q20_scalar_subqueries_decorrelate(spark, dfs):
    for n in (17, 20):
        plan = pi.formatted_plan(dfs(n))
        assert "CartesianProduct" not in plan
