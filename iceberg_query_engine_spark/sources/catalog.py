"""Metastore-shaped catalog: named-table registration from descriptors.

Mirrors the reference's branching-metastore client surface
(/root/reference/src/metastore/mod.rs): `TableMetadata` /
`ColumnMetadata` descriptors (mod.rs:346-372), the data-type string →
engine type mapping (parse_data_type, mod.rs:295-323), and the
database/table listing API (list_databases / list_tables / get_table,
mod.rs:172-227). Two transports:

- `CatalogClient` — the SAME JSON payload shape loaded from a local
  file or dict (no server needed).
- `HttpCatalogClient` — urllib GETs against the reference's branch-
  scoped REST routes (`/branch/{b}/databases`,
  `/branch/{b}/database/{db}/tables`, `/branch/{b}/table/{db}/{tbl}`,
  mod.rs:172-227) with the reference's retry policy (mod.rs:86-170):
  exponential backoff + jitter, 5xx/429/connection errors retryable,
  other 4xx not, and 404 on get_table → immediate not-found
  (mod.rs:210-246).

Registration is Spark-idiomatic: each descriptor becomes an EXTERNAL
table in the session catalog (`CREATE DATABASE` + createTable over the
parquet location), so `spark.sql("SELECT … FROM db.tbl")` resolves
through the catalog exactly as it would against a Hive metastore /
Iceberg REST catalog in production. The descriptor's column names AND
types are validated against the parquet footer at registration — a
type-drifted descriptor (BIGINT vs actual VARCHAR) fails fast, the
same guarantee the reference gets by serving table_to_arrow_schema
from the descriptor (mod.rs:282-291).
"""

from __future__ import annotations

import json
import random
import time
import urllib.error
import urllib.parse
import urllib.request
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
class MetastoreConfig:
    """Retry/timeout knobs (MetastoreConfig, mod.rs:13-42)."""

    max_retries: int = 3
    retry_delay_ms: int = 100
    max_retry_delay_ms: int = 5000
    timeout_secs: float = 30.0


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


class TableNotFound(KeyError):
    """get_table 404 — the reference's QueryError::TableNotFound
    (mod.rs:234-239), not retryable."""


class HttpCatalogClient:
    """REST transport with the reference client's read API and retry
    policy (BranchingMetastoreClient, mod.rs:45-246).

    Same read surface as `CatalogClient` (list_databases / list_tables
    / get_table), so `register_catalog` works over either transport.
    stdlib urllib only — connection pooling is the JVM/infra layer's
    job in a real deployment; semantics (routes, payloads, retry
    classification) match the reference.
    """

    def __init__(self, base_url: str, branch_id: str = "main", config: MetastoreConfig | None = None):
        self.base_url = base_url.rstrip("/")
        self.branch_id = branch_id
        self.config = config or MetastoreConfig()

    def _get_json(self, url: str, context: str, raise_404: type[Exception] | None = None):
        """GET with the reference's retry classification (mod.rs:86-170):
        success → parse JSON; 4xx except 429 → fail now (404 optionally
        as a typed not-found); 5xx/429/connection errors → exponential
        backoff + jitter up to max_retries."""
        cfg = self.config
        delay = cfg.retry_delay_ms / 1000.0
        last_error: Exception | None = None
        for attempt in range(cfg.max_retries + 1):
            try:
                with urllib.request.urlopen(url, timeout=cfg.timeout_secs) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as e:
                if e.code == 404 and raise_404 is not None:
                    raise raise_404(f"{context}: HTTP 404 {url}") from None
                if 400 <= e.code < 500 and e.code != 429:
                    raise RuntimeError(
                        f"{context}: HTTP {e.code} (client error, not retrying)"
                    ) from None
                last_error = RuntimeError(f"{context}: HTTP {e.code}")
            except (urllib.error.URLError, TimeoutError, ConnectionError, OSError) as e:
                last_error = RuntimeError(f"{context}: {e}")
            if attempt < cfg.max_retries:
                time.sleep(delay + random.uniform(0, 0.1))
                delay = min(delay * 2, cfg.max_retry_delay_ms / 1000.0)
        raise last_error or RuntimeError(f"{context}: max retries exceeded")

    def _route(self, *segments: str) -> str:
        """Compose a branch-scoped route with each path segment
        percent-encoded (safe='') so names containing '/', spaces, or
        non-ASCII cannot confuse the route (ADVICE r4)."""
        q = [urllib.parse.quote(s, safe="") for s in (self.branch_id, *segments)]
        return f"{self.base_url}/branch/" + "/".join(q)

    def list_databases(self) -> list[str]:
        """GET /branch/{b}/databases (mod.rs:172-182)."""
        url = self._route("databases")
        return sorted(self._get_json(url, "list_databases")["databases"])

    def get_database(self, database_name: str) -> dict:
        """GET /branch/{b}/database/{db} (mod.rs:184-193)."""
        url = self._route("database", database_name)
        return self._get_json(url, "get_database")

    def list_tables(self, database_name: str) -> list[str]:
        """GET /branch/{b}/database/{db}/tables (mod.rs:196-209)."""
        url = self._route("database", database_name) + "/tables"
        return sorted(t["table_name"] for t in self._get_json(url, "list_tables")["tables"])

    def get_table(self, database_name: str, table_name: str) -> TableMetadata:
        """GET /branch/{b}/table/{db}/{tbl} (mod.rs:211-246); 404 →
        TableNotFound immediately (not retried)."""
        url = self._route("table", database_name, table_name)
        payload = self._get_json(url, "get_table", raise_404=TableNotFound)
        return TableMetadata.from_dict({**payload, "database_name": database_name})


def _type_family(dt: T.DataType) -> str:
    """Coarse family for descriptor-vs-footer drift detection: width
    differences within a family are benign reader upcasts; cross-family
    drift (BIGINT descriptor over VARCHAR parquet) is corruption."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "integral"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "fractional"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    return type(dt).__name__


def register_table(spark: SparkSession, meta: TableMetadata) -> DataFrame:
    """Register one descriptor as an external table in the session
    catalog; returns the table DataFrame.

    Uses `spark.catalog` (the production path for Hive/REST catalogs),
    so `db.tbl` resolves in any spark.sql query. The descriptor schema
    is validated against the parquet footer — a drifted descriptor
    (missing column OR cross-family type drift) fails fast at
    registration, not mid-query.
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
        footer_types = {f.name: f.dataType for f in df.schema.fields}
        for c in meta.columns:
            want, have = parse_data_type(c.data_type), footer_types[c.name]
            if _type_family(want) != _type_family(have):
                raise ValueError(
                    f"{db}.{meta.table_name}.{c.name}: descriptor type {c.data_type} "
                    f"({want.simpleString()}) incompatible with parquet footer type "
                    f"{have.simpleString()}"
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
