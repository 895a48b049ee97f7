"""TPC-H-adapted suite vs DuckDB oracle (reference: tests/duckdb_validated.rs)."""

from __future__ import annotations

import pytest

from iceberg_query_engine_spark.queries import tpch
from iceberg_query_engine_spark.testing import compare


@pytest.mark.parametrize("name", sorted(tpch.QUERIES, key=lambda q: int(q[1:])))
def test_tpch_query_matches_oracle(spark, sf_oracle, name):
    res = compare(name, tpch.QUERIES[name](spark, sf_oracle), tpch.ORACLE[name], sf_oracle)
    assert res.ok, f"{name}: {res.detail} spark={res.spark_rows} duck={res.duck_rows}\n" + "\n".join(
        res.mismatches[:5]
    )
    assert res.spark_rows > 0 or name in {"q20"}, f"{name}: empty result weakens the test"
