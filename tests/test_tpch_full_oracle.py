"""Oracle tests for the unadapted TPC-H 22 over the full generated schema.

The reference validates its 22 queries against DuckDB goldens
(/root/reference/tests/duckdb_validated.rs); this is the same gate, but
value-hash-exact: the generator's binary-exact money columns make every
SUM bit-identical across engines, so the verbatim SQL text is compared
with no quantization.
"""

from __future__ import annotations

import pytest

from iceberg_query_engine_spark import testing
from iceberg_query_engine_spark.queries import tpch_full


@pytest.mark.parametrize("n", range(1, 23))
def test_tpch_full_query(spark, sf_oracle, n):
    name = f"tpchfull_q{n}"
    df = tpch_full.QUERIES[name](spark, sf_oracle)
    res = testing.compare(name, df, tpch_full.ORACLE[name], sf_oracle)
    assert res.ok, f"{name}: {res.detail} {res.mismatches[:3]}"


def test_full_schema_has_all_tpch_columns(spark, sf_oracle):
    """Every column of the genuine TPC-H schema is present."""
    data_dir = tpch_full.ensure_full_data(spark, sf_oracle)
    import os

    expect = {
        "region": {"r_regionkey", "r_name", "r_comment"},
        "nation": {"n_nationkey", "n_name", "n_regionkey", "n_comment"},
        "supplier": {"s_suppkey", "s_name", "s_address", "s_nationkey",
                     "s_phone", "s_acctbal", "s_comment"},
        "customer": {"c_custkey", "c_name", "c_address", "c_nationkey",
                     "c_phone", "c_acctbal", "c_mktsegment", "c_comment"},
        "part": {"p_partkey", "p_name", "p_mfgr", "p_brand", "p_type",
                 "p_size", "p_container", "p_retailprice", "p_comment"},
        "partsupp": {"ps_partkey", "ps_suppkey", "ps_availqty",
                     "ps_supplycost", "ps_comment"},
        "orders": {"o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                   "o_orderdate", "o_orderpriority", "o_clerk",
                   "o_shippriority", "o_comment"},
        "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                     "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                     "l_returnflag", "l_linestatus", "l_shipdate",
                     "l_commitdate", "l_receiptdate", "l_shipinstruct",
                     "l_shipmode", "l_comment"},
    }
    for table, cols in expect.items():
        df = spark.read.parquet(os.path.join(data_dir, f"{table}.parquet"))
        assert cols <= set(df.columns), f"{table} missing {cols - set(df.columns)}"


def test_lineitem_suppliers_exist_in_partsupp(spark, sf_oracle):
    """q9's join contract: every (l_partkey, l_suppkey) is a partsupp row."""
    import os

    data_dir = tpch_full.ensure_full_data(spark, sf_oracle)
    li = spark.read.parquet(os.path.join(data_dir, "lineitem.parquet"))
    ps = spark.read.parquet(os.path.join(data_dir, "partsupp.parquet"))
    orphans = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
            "left_anti",
        )
        .count()
    )
    assert orphans == 0
