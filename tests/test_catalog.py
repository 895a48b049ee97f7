"""Metastore-shaped catalog shell: descriptor → session-catalog tables.

Parity target: /root/reference/src/metastore/mod.rs (TableMetadata
descriptors, parse_data_type mapping, list/get API). Registration goes
through spark.catalog so `db.tbl` resolves in plain SQL — the last
SURVEY §2.1 inventory line (REST catalog), with the REST transport
swapped for the same JSON payload read locally (no network in the
sandbox).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from iceberg_query_engine_spark.sources.catalog import (
    CatalogClient,
    TableMetadata,
    parse_data_type,
    register_catalog,
    table_to_spark_schema,
)


def _descriptor_doc(sf_dir: str) -> dict:
    return {
        "databases": {
            "demo": {
                "tables": [
                    {
                        "table_name": "nation",
                        "table_type": "EXTERNAL",
                        "table_location": f"{sf_dir}/nation.parquet",
                        "table_format": "PARQUET",
                        "columns": [
                            {"name": "n_nationkey", "data_type": "BIGINT", "nullable": False},
                            {"name": "n_name", "data_type": "VARCHAR", "nullable": True},
                            {"name": "n_regionkey", "data_type": "BIGINT", "nullable": False},
                        ],
                    },
                    {
                        "table_name": "region",
                        "table_type": "EXTERNAL",
                        "table_location": f"{sf_dir}/region.parquet",
                        "table_format": "PARQUET",
                        "columns": [
                            {"name": "r_regionkey", "data_type": "BIGINT", "nullable": False},
                            {"name": "r_name", "data_type": "STRING", "nullable": True},
                        ],
                    },
                ]
            }
        }
    }


def test_parse_data_type_mapping():
    """parse_data_type parity (mod.rs:295-323), incl. unknown→string."""
    assert parse_data_type("BIGINT") == T.LongType()
    assert parse_data_type("int4") == T.IntegerType()
    assert parse_data_type("VARCHAR") == T.StringType()
    assert parse_data_type("DOUBLE") == T.DoubleType()
    assert parse_data_type("DECIMAL") == T.DecimalType(38, 10)
    assert parse_data_type("no_such_type") == T.StringType()


def test_descriptor_schema():
    meta = TableMetadata.from_dict(
        {
            "table_name": "t",
            "database_name": "d",
            "columns": [
                {"name": "a", "data_type": "BIGINT", "nullable": False},
                {"name": "b", "data_type": "TEXT"},
            ],
        }
    )
    schema = table_to_spark_schema(meta)
    assert schema == T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.StringType(), True),
        ]
    )


def test_register_and_join_catalog_tables(spark, sf_oracle, tmp_path):
    """Register 2 tables from a JSON descriptor document and join them
    through plain SQL names — the reference's MetastoreTableProvider
    flow (mod.rs:376-417) on the session catalog."""
    doc_path = tmp_path / "catalog.json"
    doc_path.write_text(json.dumps(_descriptor_doc(sf_oracle)))
    client = CatalogClient(str(doc_path))
    assert client.list_databases() == ["demo"]
    assert client.list_tables("demo") == ["nation", "region"]
    assert client.get_table("demo", "nation").table_location.endswith("nation.parquet")

    tables = register_catalog(spark, client)
    assert set(tables) == {"demo.nation", "demo.region"}

    rows = spark.sql(
        """
        SELECT r.r_name, COUNT(*) AS n
        FROM demo.nation n JOIN demo.region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
        """
    ).collect()
    assert len(rows) == 5 and sum(r.n for r in rows) == 25
    spark.sql("DROP TABLE IF EXISTS demo.nation")
    spark.sql("DROP TABLE IF EXISTS demo.region")
    spark.sql("DROP DATABASE IF EXISTS demo")


def test_schema_drift_fails_fast(spark, sf_oracle, tmp_path):
    client = CatalogClient(
        {
            "databases": {
                "d2": {
                    "tables": [
                        {
                            "table_name": "nation",
                            "table_location": f"{sf_oracle}/nation.parquet",
                            "columns": [
                                {"name": "no_such_col", "data_type": "BIGINT"}
                            ],
                        }
                    ]
                }
            }
        }
    )
    with pytest.raises(ValueError, match="no_such_col"):
        register_catalog(spark, client)
    spark.sql("DROP DATABASE IF EXISTS d2 CASCADE")
