"""Property-based oracle testing: randomized queries vs DuckDB.

Generates random (but reproducible) filter/aggregate/join/sort queries
over the TPC-H-ish corpus and requires Spark and DuckDB to agree —
broad semantic-drift detection beyond the curated suites (the
reference has no property testing; SURVEY.md §5 notes the gap).

Determinism: hypothesis derandomized + fixed seed; only
engine-reproducible aggregates (COUNT, exact-int SUM, MIN/MAX) appear
so float non-associativity can't produce false alarms.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_query_engine_spark.queries.subqueries import _sql
from iceberg_query_engine_spark.testing import compare

NUM_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity"]
STR_COLS = ["l_returnflag", "l_linestatus"]
CMP = ["<", "<=", ">", ">=", "=", "<>"]


@st.composite
def predicates(draw):
    n = draw(st.integers(1, 3))
    conjuncts = []
    for _ in range(n):
        if draw(st.booleans()):
            col = draw(st.sampled_from(NUM_COLS))
            op = draw(st.sampled_from(CMP))
            val = draw(st.integers(0, 60000))
            conjuncts.append(f"{col} {op} {val}")
        else:
            col = draw(st.sampled_from(STR_COLS))
            val = draw(st.sampled_from(["A", "N", "R", "F", "O"]))
            conjuncts.append(f"{col} = '{val}'")
    joiner = draw(st.sampled_from([" AND ", " OR "]))
    return joiner.join(conjuncts)


@st.composite
def queries(draw):
    pred = draw(predicates())
    group = draw(st.sampled_from(STR_COLS + ["l_returnflag, l_linestatus"]))
    agg = draw(
        st.sampled_from(
            [
                "CAST(COUNT(*) AS BIGINT) AS a",
                "CAST(SUM(l_quantity) AS BIGINT) AS a",
                "CAST(MIN(l_orderkey) AS BIGINT) AS a",
                "CAST(MAX(l_partkey) AS BIGINT) AS a",
                "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS a",
            ]
        )
    )
    shape = draw(st.integers(0, 2))
    if shape == 0:
        return f"SELECT {group}, {agg} FROM lineitem WHERE {pred} GROUP BY {group} ORDER BY {group}"
    if shape == 1:
        return (
            f"SELECT o_orderstatus, {agg} FROM lineitem JOIN orders "
            f"ON l_orderkey = o_orderkey WHERE {pred} "
            f"GROUP BY o_orderstatus ORDER BY o_orderstatus"
        )
    return (
        f"SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS a FROM lineitem "
        f"WHERE {pred} GROUP BY l_orderkey ORDER BY a DESC, l_orderkey LIMIT 20"
    )


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=queries())
def test_random_query_matches_duckdb(spark, sf_oracle, q):
    res = compare("prop", _sql(spark, sf_oracle, q), q, sf_oracle)
    assert res.ok, f"divergence on: {q}\n{res.detail}\n" + "\n".join(res.mismatches[:5])


@st.composite
def window_queries(draw):
    """Random window-function queries over supplier (deterministic
    unique ordering key)."""
    direction = draw(st.sampled_from(["ASC", "DESC"]))
    # Spark cannot extend a named window with an inline frame, so
    # framed variants carry the full window spec
    spec = f"PARTITION BY s_nationkey ORDER BY s_suppkey {direction}"
    wf = draw(
        st.sampled_from(
            [
                "CAST(row_number() OVER ({w}) AS BIGINT)",
                "CAST(rank() OVER ({w}) AS BIGINT)",
                "CAST(dense_rank() OVER ({w}) AS BIGINT)",
                "round(sum(s_acctbal) OVER ({w} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)",
                "round(avg(s_acctbal) OVER ({w} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)",
                "lag(s_suppkey, 1) OVER ({w})",
                "lead(s_suppkey, 2) OVER ({w})",
                "min(s_acctbal) OVER ({w} ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)",
            ]
        )
    ).format(w=spec)
    limit = draw(st.integers(5, 40))
    return (
        f"SELECT s_suppkey, {wf} AS v FROM supplier "
        f"ORDER BY s_suppkey LIMIT {limit}"
    )


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=window_queries())
def test_random_window_query_matches_duckdb(spark, sf_oracle, q):
    res = compare("propw", _sql(spark, sf_oracle, q), q, sf_oracle)
    assert res.ok, f"divergence on: {q}\n{res.detail}\n" + "\n".join(res.mismatches[:5])


@st.composite
def string_queries(draw):
    """Random string-expression queries over part names."""
    expr = draw(
        st.sampled_from(
            [
                "upper(p_name)",
                "substring(p_name, {a}, {b})",
                "replace(p_name, 'a', '#')",
                "reverse(p_name)",
                "lpad(p_name, {b}, '*')",
                "split_part(p_name, ' ', 1)",
                "CAST(length(p_name) AS BIGINT)",
                "regexp_replace(p_name, '[aeiou]', '_', 'g')",
                "concat_ws('-', p_name, CAST(p_partkey AS VARCHAR))",
            ]
        )
    ).format(a=draw(st.integers(1, 5)), b=draw(st.integers(2, 15)))
    lo = draw(st.integers(0, 150))
    return (
        f"SELECT p_partkey, {expr} AS v FROM part "
        f"WHERE p_partkey BETWEEN {lo} AND {lo + 40} ORDER BY p_partkey"
    )


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=string_queries())
def test_random_string_query_matches_duckdb(spark, sf_oracle, q):
    # Spark's regexp_replace has no flags arg; it is global by default —
    # strip the DuckDB-only 'g' flag on the Spark side
    spark_q = q.replace(", '_', 'g')", ", '_')")
    res = compare("props", _sql(spark, sf_oracle, spark_q), q, sf_oracle)
    assert res.ok, f"divergence on: {q}\n{res.detail}\n" + "\n".join(res.mismatches[:5])


@st.composite
def scalar_queries(draw):
    """Random scalar-function expressions with Spark/DuckDB spelling
    pairs — exercises the compat SQL UDFs (truncate, is_finite) and
    math built-ins under arbitrary predicates. Transcendentals are
    rounded to 6 decimals (JVM vs C libm agree within 1 ulp)."""
    pairs = [
        ("round(truncate(l_extendedprice / 7), 6)",
         "round(trunc(l_extendedprice / 7), 6)"),
        ("CAST(is_finite(l_extendedprice / l_quantity) AS INT)",
         "CAST(isfinite(l_extendedprice / l_quantity) AS INT)"),
        ("CAST(isnan(l_extendedprice) AS INT)",
         "CAST(isnan(l_extendedprice) AS INT)"),
        ("round(ln(l_extendedprice + 1), 6)", None),
        ("round(log2(l_quantity + 2), 6)", None),
        ("round(cbrt(l_extendedprice), 6)", None),
        ("round(atan2(l_quantity, 7.0), 6)", None),
        ("round(sqrt(l_extendedprice), 6)", None),
        ("round(greatest(l_quantity, 25.0), 6)", None),
        ("CAST(width_bucket(l_quantity, 0.0, 60.0, 6) AS BIGINT)",
         "CASE WHEN l_quantity < 0 THEN 0 WHEN l_quantity >= 60 THEN 7 "
         "ELSE CAST(floor(l_quantity / 10) + 1 AS BIGINT) END"),
        ("CAST(bit_count(l_suppkey) AS INT)", None),
    ]
    spark_e, duck_e = draw(st.sampled_from(pairs))
    duck_e = duck_e or spark_e
    pred = draw(predicates())
    return (
        f"SELECT l_orderkey, l_linenumber, {spark_e} AS v FROM lineitem "
        f"WHERE {pred} ORDER BY l_orderkey, l_linenumber LIMIT 200",
        f"SELECT l_orderkey, l_linenumber, {duck_e} AS v FROM lineitem "
        f"WHERE {pred} ORDER BY l_orderkey, l_linenumber LIMIT 200",
    )


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=scalar_queries())
def test_random_scalar_query_matches_duckdb(spark, sf_oracle, q):
    from iceberg_query_engine_spark.functions import compat

    compat.register_all(spark)
    spark_q, duck_q = q
    res = compare("propf", _sql(spark, sf_oracle, spark_q), duck_q, sf_oracle)
    assert res.ok, f"divergence on: {spark_q}\n{res.detail}\n" + "\n".join(
        res.mismatches[:5]
    )
