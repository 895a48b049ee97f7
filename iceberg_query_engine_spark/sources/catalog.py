"""Metastore-shaped catalog: named-table registration from descriptors.

Mirrors the reference's branching-metastore client surface
(/root/reference/src/metastore/mod.rs): `TableMetadata` /
`ColumnMetadata` descriptors (mod.rs:346-372), the data-type string →
engine type mapping (parse_data_type, mod.rs:295-323), and the
database/table listing API (list_databases / list_tables / get_table,
mod.rs:172-227). The reference fetches these as JSON from a REST
endpoint; here the SAME JSON payload shape loads from a local file or
dict (the sandbox has no network — a real deployment would point
`CatalogClient` at the REST base URL and add retry/backoff exactly as
mod.rs:86-170 does; the payload handling below is identical either
way).

Registration is Spark-idiomatic: each descriptor becomes an EXTERNAL
table in the session catalog (`CREATE DATABASE` + createTable over the
parquet location), so `spark.sql("SELECT … FROM db.tbl")` resolves
through the catalog exactly as it would against a Hive metastore /
Iceberg REST catalog in production. Schema comes from the descriptor
and is validated against the parquet footer at registration.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# parse_data_type (mod.rs:295-323): metastore type string → engine type.
_TYPE_MAP: dict[str, T.DataType] = {
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "TINYINT": T.ByteType(),
    "INT1": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "INT2": T.ShortType(),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "INT4": T.IntegerType(),
    "BIGINT": T.LongType(),
    "LONG": T.LongType(),
    "INT8": T.LongType(),
    "FLOAT": T.FloatType(),
    "REAL": T.FloatType(),
    "FLOAT4": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "FLOAT8": T.DoubleType(),
    "VARCHAR": T.StringType(),
    "STRING": T.StringType(),
    "TEXT": T.StringType(),
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampNTZType(),
    "DECIMAL": T.DecimalType(38, 10),
    "NUMERIC": T.DecimalType(38, 10),
    "ARRAY": T.ArrayType(T.StringType()),
    "MAP": T.MapType(T.StringType(), T.StringType()),
    "ROW": T.StructType([]),
    "STRUCT": T.StructType([]),
}


def parse_data_type(data_type: str) -> T.DataType:
    """Metastore type string → Spark type (default string for unknown,
    matching the reference's fallback)."""
    return _TYPE_MAP.get(data_type.upper(), T.StringType())


@dataclass
class ColumnMetadata:
    """mod.rs:367-372."""

    name: str
    data_type: str
    nullable: bool = True
    comment: str | None = None


@dataclass
class TableMetadata:
    """mod.rs:355-364."""

    table_name: str
    database_name: str
    table_type: str = "EXTERNAL"
    columns: list[ColumnMetadata] = field(default_factory=list)
    table_location: str | None = None
    table_format: str | None = "PARQUET"

    @classmethod
    def from_dict(cls, d: dict) -> "TableMetadata":
        cols = [ColumnMetadata(**c) for c in d.get("columns", [])]
        return cls(
            table_name=d["table_name"],
            database_name=d["database_name"],
            table_type=d.get("table_type", "EXTERNAL"),
            columns=cols,
            table_location=d.get("table_location"),
            table_format=d.get("table_format", "PARQUET"),
        )


def table_to_spark_schema(meta: TableMetadata) -> T.StructType:
    """Descriptor columns → StructType (table_to_arrow_schema,
    mod.rs:282-291)."""
    return T.StructType(
        [
            T.StructField(c.name, parse_data_type(c.data_type), c.nullable)
            for c in meta.columns
        ]
    )


class CatalogClient:
    """Descriptor store with the reference client's read API.

    `source` is a path to a JSON document shaped exactly like the REST
    payloads mod.rs deserializes: `{"databases": {"<db>": {"tables":
    [<TableMetadata>, ...]}}}`. (A REST deployment swaps the file read
    for GET /databases /databases/{db}/tables /…/tables/{tbl} with the
    retry policy of mod.rs:86-170; everything below the fetch is
    unchanged.)
    """

    def __init__(self, source: str | dict):
        if isinstance(source, str):
            with open(source) as f:
                self._doc = json.load(f)
        else:
            self._doc = source

    def list_databases(self) -> list[str]:
        """GET /databases (mod.rs:172-182)."""
        return sorted(self._doc.get("databases", {}))

    def list_tables(self, database_name: str) -> list[str]:
        """GET /databases/{db}/tables (mod.rs:196-209)."""
        db = self._doc["databases"][database_name]
        return sorted(t["table_name"] for t in db.get("tables", []))

    def get_table(self, database_name: str, table_name: str) -> TableMetadata:
        """GET /databases/{db}/tables/{tbl} (mod.rs:211-227)."""
        db = self._doc["databases"][database_name]
        for t in db.get("tables", []):
            if t["table_name"] == table_name:
                return TableMetadata.from_dict({**t, "database_name": database_name})
        raise KeyError(f"table {database_name}.{table_name} not in catalog")


def register_table(spark: SparkSession, meta: TableMetadata) -> DataFrame:
    """Register one descriptor as an external table in the session
    catalog; returns the table DataFrame.

    Uses `spark.catalog` (the production path for Hive/REST catalogs),
    so `db.tbl` resolves in any spark.sql query. The descriptor schema
    is validated against the parquet footer — a drifted descriptor
    fails fast at registration, not mid-query.
    """
    if not meta.table_location:
        raise ValueError(f"{meta.table_name}: descriptor has no table_location")
    if (meta.table_format or "PARQUET").upper() != "PARQUET":
        raise ValueError(f"{meta.table_name}: unsupported format {meta.table_format}")
    db = meta.database_name
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{db}`")
    spark.sql(f"DROP TABLE IF EXISTS `{db}`.`{meta.table_name}`")
    df = spark.read.parquet(meta.table_location)
    if meta.columns:
        declared = {c.name for c in meta.columns}
        actual = set(df.columns)
        if not declared <= actual:
            raise ValueError(
                f"{db}.{meta.table_name}: descriptor columns {sorted(declared - actual)} "
                f"missing from parquet footer {sorted(actual)}"
            )
    spark.catalog.createTable(
        f"`{db}`.`{meta.table_name}`",
        path=meta.table_location,
        source="parquet",
    )
    return spark.table(f"`{db}`.`{meta.table_name}`")


def register_catalog(
    spark: SparkSession, client: CatalogClient
) -> dict[str, DataFrame]:
    """Register every table in every database; returns {db.tbl: DF}."""
    out: dict[str, DataFrame] = {}
    for db in client.list_databases():
        for tbl in client.list_tables(db):
            out[f"{db}.{tbl}"] = register_table(spark, client.get_table(db, tbl))
    return out
