"""Property-based oracle fuzzing over the FULL 8-table TPC-H schema.

Extends tests/test_property_oracle.py (slim lineitem grammar) with the
productions the r4 verdict asked for (#7): partsupp joins — including
the two-key (partkey, suppkey) join q9 stresses — and scalar/EXISTS/IN
subqueries, plus (r5) window productions: ranking with unique
tie-breaks, framed running sums over exact ints, and lead/lag — all
over data/tpch_full/sf0.01 with DuckDB as the oracle.

Determinism: derandomized hypothesis; aggregates restricted to COUNT /
MIN / MAX / exact-binary SUMs (the generator emits money columns as
multiples of 2^-4, so parallel and sequential summation agree bitwise).
"""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_query_engine_spark.queries import tpch_full
from iceberg_query_engine_spark.testing import compare


@pytest.fixture(scope="module")
def full_env(spark):
    data_dir = tpch_full.ensure_full_data(spark, "/root/testdata/sf0.01")
    tpch_full._register(spark, data_dir)
    con = duckdb.connect()
    for t in tpch_full.FULL_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(data_dir, t + '.parquet')}')"
        )
    yield con
    con.close()


@st.composite
def ps_predicates(draw):
    n = draw(st.integers(1, 2))
    conjuncts = []
    for _ in range(n):
        kind = draw(st.integers(0, 2))
        if kind == 0:
            op = draw(st.sampled_from(["<", "<=", ">", ">=", "<>"]))
            conjuncts.append(f"ps_availqty {op} {draw(st.integers(0, 10000))}")
        elif kind == 1:
            op = draw(st.sampled_from(["<", ">"]))
            conjuncts.append(f"ps_supplycost {op} {draw(st.integers(1, 1000))}")
        else:
            conjuncts.append(f"ps_partkey % {draw(st.integers(2, 9))} = 0")
    return draw(st.sampled_from([" AND ", " OR "])).join(conjuncts)


@st.composite
def full_queries(draw):
    pred = draw(ps_predicates())
    shape = draw(st.integers(0, 7))
    if shape == 0:
        # part x partsupp with grouped exact aggregates
        return (
            f"SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n, "
            f"round(SUM(ps_supplycost), 4) AS c "
            f"FROM partsupp JOIN part ON ps_partkey = p_partkey "
            f"WHERE {pred} GROUP BY p_brand ORDER BY p_brand"
        )
    if shape == 1:
        # the q9 shape: two-key join lineitem x partsupp + supplier
        return (
            f"SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n, "
            f"round(SUM(ps_supplycost * l_quantity), 4) AS v "
            f"FROM lineitem JOIN partsupp "
            f"ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey "
            f"JOIN supplier ON ps_suppkey = s_suppkey "
            f"WHERE {pred} GROUP BY s_nationkey ORDER BY s_nationkey"
        )
    if shape == 2:
        # scalar subquery in WHERE (uncorrelated, deterministic)
        m, r = draw(st.integers(2, 7)), draw(st.integers(0, 1))
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM partsupp "
            f"WHERE ps_supplycost > "
            f"(SELECT AVG(ps_supplycost) FROM partsupp WHERE ps_suppkey % {m} = {r}) "
            f"AND ({pred})"
        )
    if shape == 3:
        # correlated EXISTS / NOT EXISTS over partsupp
        neg = draw(st.sampled_from(["EXISTS", "NOT EXISTS"]))
        lo = draw(st.integers(0, 1500))
        return (
            f"SELECT p_partkey FROM part WHERE {neg} "
            f"(SELECT 1 FROM partsupp WHERE ps_partkey = p_partkey AND ({pred})) "
            f"AND p_partkey BETWEEN {lo} AND {lo + 60} ORDER BY p_partkey"
        )
    if shape == 4:
        # IN subquery with HAVING
        v = draw(st.integers(1000, 40000))
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem "
            f"WHERE l_partkey IN (SELECT ps_partkey FROM partsupp WHERE {pred} "
            f"GROUP BY ps_partkey HAVING SUM(ps_availqty) > {v})"
        )
    lo = draw(st.integers(0, 80))
    scope = f"ps_suppkey BETWEEN {lo} AND {lo + 8}"
    if shape == 5:
        # ranking window, unique ORDER BY -> deterministic rows
        fn_w = draw(st.sampled_from(["row_number()", "rank()", "dense_rank()"]))
        m = draw(st.integers(2, 5))
        return (
            f"SELECT ps_partkey, ps_suppkey, CAST(rk AS BIGINT) AS rk FROM ("
            f"SELECT ps_partkey, ps_suppkey, {fn_w} OVER ("
            f"PARTITION BY ps_suppkey % {m} "
            f"ORDER BY ps_supplycost, ps_partkey, ps_suppkey) AS rk "
            f"FROM partsupp WHERE {scope}) "
            f"WHERE rk <= 3 ORDER BY ps_partkey, ps_suppkey"
        )
    if shape == 6:
        # framed running aggregate over exact ints
        w = draw(st.integers(1, 5))
        return (
            f"SELECT ps_partkey, ps_suppkey, CAST(SUM(ps_availqty) OVER ("
            f"PARTITION BY ps_suppkey ORDER BY ps_partkey "
            f"ROWS BETWEEN {w} PRECEDING AND CURRENT ROW) AS BIGINT) AS s "
            f"FROM partsupp WHERE {scope} ORDER BY ps_partkey, ps_suppkey"
        )
    # lead/lag offset window
    off = draw(st.integers(1, 4))
    fn_w = draw(st.sampled_from(["lag", "lead"]))
    return (
        f"SELECT ps_partkey, ps_suppkey, {fn_w}(ps_availqty, {off}) OVER ("
        f"PARTITION BY ps_suppkey ORDER BY ps_partkey) AS x "
        f"FROM partsupp WHERE {scope} ORDER BY ps_partkey, ps_suppkey"
    )


@settings(
    max_examples=48,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=full_queries())
def test_random_full_schema_query_matches_duckdb(spark, sf_oracle, full_env, q):
    res = compare("propfull", spark.sql(q), q, sf_oracle, con=full_env)
    assert res.ok, f"divergence on: {q}\n{res.detail}\n" + "\n".join(res.mismatches[:5])
