"""View-registration epoch: slim-schema SQL queries must not read the
full-schema views a tpchfull_* query re-pointed in the same session
(found round 6 when the catalog-wide plan sweep ran tpchfull queries
before the property suite)."""

from __future__ import annotations


def test_sql_views_reregister_after_full_schema_run(spark, sf_oracle):
    from iceberg_query_engine_spark.queries import subqueries, tpch_full

    q = "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem"
    n_before = subqueries._sql(spark, sf_oracle, q).collect()[0].n
    # clobbers the canonical view names with the full 8-table schema
    tpch_full.QUERIES["tpchfull_q6"](spark, sf_oracle).collect()
    n_after = subqueries._sql(spark, sf_oracle, q).collect()[0].n
    assert n_before == n_after
