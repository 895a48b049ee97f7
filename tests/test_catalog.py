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
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import types as T

from iceberg_query_engine_spark.sources.catalog import (
    CatalogClient,
    HttpCatalogClient,
    MetastoreConfig,
    TableMetadata,
    TableNotFound,
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


def test_type_drift_fails_fast(spark, sf_oracle, tmp_path):
    """A descriptor claiming BIGINT over a VARCHAR parquet column is
    rejected at registration (the reference serves the schema from the
    descriptor, mod.rs:282-291 — drift there poisons every read)."""
    client = CatalogClient(
        {
            "databases": {
                "d3": {
                    "tables": [
                        {
                            "table_name": "nation",
                            "table_location": f"{sf_oracle}/nation.parquet",
                            "columns": [
                                {"name": "n_name", "data_type": "BIGINT"}
                            ],
                        }
                    ]
                }
            }
        }
    )
    with pytest.raises(ValueError, match="incompatible with parquet footer"):
        register_catalog(spark, client)
    spark.sql("DROP DATABASE IF EXISTS d3 CASCADE")


class _MetastoreHandler(BaseHTTPRequestHandler):
    """Serves the reference's branch-scoped REST routes
    (mod.rs:172-227) from the class-level `doc`; `fail_first` requests
    get a 503 before succeeding (exercises the retry path,
    mod.rs:86-170)."""

    doc: dict = {}
    fail_first: int = 0
    hits: int = 0

    def log_message(self, *a):  # keep pytest output clean
        pass

    def _json(self, code: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        cls = type(self)
        cls.hits += 1
        if cls.fail_first > 0:
            cls.fail_first -= 1
            return self._json(503, {"error": "try again"})
        parts = self.path.strip("/").split("/")
        dbs = cls.doc.get("databases", {})
        # /branch/{b}/databases
        if parts[:1] == ["branch"] and parts[2:] == ["databases"]:
            return self._json(200, {"databases": sorted(dbs)})
        # /branch/{b}/database/{db}/tables
        if len(parts) == 5 and parts[2] == "database" and parts[4] == "tables":
            db = dbs.get(parts[3])
            if db is None:
                return self._json(404, {"error": "no such database"})
            infos = [
                {"table_name": t["table_name"], "table_type": t.get("table_type", "EXTERNAL")}
                for t in db.get("tables", [])
            ]
            return self._json(200, {"tables": infos})
        # /branch/{b}/table/{db}/{tbl}
        if len(parts) == 5 and parts[2] == "table":
            db = dbs.get(parts[3], {})
            for t in db.get("tables", []):
                if t["table_name"] == parts[4]:
                    return self._json(200, {**t, "database_name": parts[3]})
            return self._json(404, {"error": "no such table"})
        return self._json(400, {"error": f"bad route {self.path}"})


@pytest.fixture()
def metastore_server(sf_oracle):
    """In-process stdlib HTTP server with the reference payload shapes."""
    _MetastoreHandler.doc = _descriptor_doc(sf_oracle)
    _MetastoreHandler.fail_first = 0
    _MetastoreHandler.hits = 0
    srv = HTTPServer(("127.0.0.1", 0), _MetastoreHandler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}"
    finally:
        srv.shutdown()
        thread.join(timeout=5)


def test_http_transport_list_get(spark, metastore_server):
    """Full registration flow over real HTTP: list databases → list
    tables → get descriptors → session-catalog tables queryable by
    name (MetastoreCatalog flow, mod.rs:422-460)."""
    client = HttpCatalogClient(metastore_server, branch_id="main")
    assert client.list_databases() == ["demo"]
    assert client.list_tables("demo") == ["nation", "region"]
    meta = client.get_table("demo", "nation")
    assert meta.database_name == "demo"
    assert [c.name for c in meta.columns][:2] == ["n_nationkey", "n_name"]

    tables = register_catalog(spark, client)
    assert set(tables) == {"demo.nation", "demo.region"}
    n = spark.sql("SELECT COUNT(*) AS n FROM demo.nation").collect()[0].n
    assert n == 25
    spark.sql("DROP TABLE IF EXISTS demo.nation")
    spark.sql("DROP TABLE IF EXISTS demo.region")
    spark.sql("DROP DATABASE IF EXISTS demo")


def test_http_transport_retries_5xx(metastore_server):
    """Two 503s then success — the client retries with backoff
    (mod.rs:86-170: server errors are retryable)."""
    client = HttpCatalogClient(
        metastore_server, config=MetastoreConfig(max_retries=3, retry_delay_ms=10)
    )
    _MetastoreHandler.fail_first = 2
    assert client.list_databases() == ["demo"]
    assert _MetastoreHandler.hits >= 3


def test_http_transport_404_not_retried(metastore_server):
    """get_table 404 raises TableNotFound immediately — exactly one
    request, no retries (mod.rs:234-239)."""
    client = HttpCatalogClient(
        metastore_server, config=MetastoreConfig(max_retries=3, retry_delay_ms=10)
    )
    _MetastoreHandler.hits = 0
    with pytest.raises(TableNotFound):
        client.get_table("demo", "no_such_table")
    assert _MetastoreHandler.hits == 1


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


def test_route_segments_percent_encoded():
    """Names containing '/', spaces, or non-ASCII are percent-encoded
    per path segment (safe='') so they cannot confuse the branch-scoped
    routes (ADVICE r4) — a 'db/evil' database cannot masquerade as an
    extra route segment."""
    from iceberg_query_engine_spark.sources.catalog import HttpCatalogClient

    c = HttpCatalogClient("http://example.invalid:9", branch_id="my branch")
    assert c._route("databases") == (
        "http://example.invalid:9/branch/my%20branch/databases"
    )
    assert c._route("table", "db/evil", "naïve tbl") == (
        "http://example.invalid:9/branch/my%20branch/table/db%2Fevil/na%C3%AFve%20tbl"
    )
