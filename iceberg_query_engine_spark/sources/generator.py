"""Distributed TPC-H-ish data generator (CLI `generate-parquet`).

Counterpart of the reference's generator (/root/reference/src/tpch/
generator.rs, seed 42; CLI `generate-parquet`, src/main.rs:59-75) —
but distributed: every table is `spark.range(n)` plus deterministic
hash-derived column expressions, so generation is embarrassingly
parallel with NO driver-side data. dbgen at 100 TB is exactly this
shape: scale-out row-id ranges, per-row pure functions, direct
parquet writes from every executor.

Determinism: all pseudo-randomness is xxhash64(id, salt) — same
output for the same (sf, seed) on any cluster layout. Schemas match
/root/testdata exactly (TESTDATA.md); value distributions are
synthetic look-alikes, not dbgen-exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
FLAGS = ["A", "N", "R"]
BRANDS = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
TYPES = [
    f"{a} {b} {c}"
    for a in ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
    for b in ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
    for c in ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
]
EVENT_TYPES = ["click", "view", "purchase", "scroll", "hover"]
LANGS = ["en", "es", "fr", "de", "zh"]
VOCAB = [
    "the", "a", "of", "and", "table", "row", "scan", "fast", "slow",
    "value", "part", "hash", "merge", "batch", "spark", "window",
    "key", "agg", "join", "sort", "query", "data", "column", "order",
    "small", "big", "line", "customer", "stream", "group", "filter",
    "vector",
]
EMBED_DIM = 64


def _u(id_col, salt: int):
    """Deterministic uniform [0, 1) double from (id, salt)."""
    return (
        F.pmod(F.xxhash64(id_col, F.lit(salt), F.lit(SEED)), F.lit(1_000_000))
        / 1_000_000.0
    )


def _pick(id_col, salt: int, options: list[str]):
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(
        arr,
        (F.pmod(F.xxhash64(id_col, F.lit(salt), F.lit(SEED)), F.lit(len(options))) + 1)
        .cast("int"),
    )


def _ts(id_col, salt: int, start: str, days: int, unit: str = "us"):
    """Deterministic timestamp in [start, start + days), emitted as an
    epoch int64 in `unit` — the arrow finalize step reinterprets it as
    parquet timestamp[unit], matching the driver's testdata encodings
    (all µs since the round-2 regeneration; the ms/ns paths remain for
    foreign corpora — sources/registry.py normalizes ns under
    nanosAsLong)."""
    mult = {"ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[unit]
    offset = F.pmod(F.xxhash64(id_col, F.lit(salt), F.lit(SEED)), F.lit(days * 86400))
    return (
        (F.unix_timestamp(F.lit(start).cast("timestamp")) + offset) * F.lit(mult)
    ).cast("long")


# epoch-long columns finalized to parquet timestamp[unit] (testdata encodings)
_TS_COLS = {
    "orders": [("o_orderdate", "us")],
    "lineitem": [("l_shipdate", "us")],
    "events": [("ts", "us")],
}


def _finalize_single_file(
    tmp_dir: str, dest: str, ts_cols: list[tuple[str, str]]
) -> int:
    """Concatenate Spark's partitioned output into ONE `<table>.parquet`
    file, reinterpreting epoch-long columns as timestamp[unit] —
    footer-compatible with /root/testdata (single file per table,
    µs timestamp encodings). This pass is driver-side by design at
    test scale; at cluster scale you keep Spark's directory output
    (µs timestamps) and skip it."""
    import shutil

    import pyarrow as pa
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    table = ds.dataset(tmp_dir, format="parquet").to_table()
    for c, unit in ts_cols:
        idx = table.schema.get_field_index(c)
        table = table.set_column(idx, c, table.column(c).cast(pa.timestamp(unit)))
    # drop Spark's embedded row-metadata: it still declares the epoch
    # longs as LONG, and Spark trusts it over the parquet logical type
    table = table.replace_schema_metadata(None)
    pq.write_table(table, dest)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    return table.num_rows


def generate_tpch(spark: SparkSession, sf: float, out_dir: str) -> dict[str, int]:
    """Write all ten tables at scale factor `sf`; returns row counts.
    Row counts mirror /root/testdata (TESTDATA.md): lineitem ≈ 6M·sf."""
    os.makedirs(out_dir, exist_ok=True)
    n_supp = max(1, int(10_000 * sf))
    n_cust = max(1, int(150_000 * sf))
    n_part = max(1, int(200_000 * sf))
    n_ord = max(1, int(1_500_000 * sf))
    n_ev = max(1, int(1_000_000 * sf))
    n_doc = max(1, int(50_000 * sf))

    def write(df: DataFrame, name: str) -> int:
        tmp = os.path.join(out_dir, f"_tmp_{name}")
        df.write.mode("overwrite").parquet(tmp)
        return _finalize_single_file(
            tmp, os.path.join(out_dir, f"{name}.parquet"), _TS_COLS.get(name, [])
        )

    counts = {}
    region = spark.range(5).select(
        F.col("id").cast("int").alias("r_regionkey"),
        _pick_exact("id", REGIONS).alias("r_name"),
    )
    counts["region"] = write(region, "region")

    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        _pick_exact("id", NATIONS).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    )
    counts["nation"] = write(nation, "nation")

    supplier = spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        (F.pmod(F.xxhash64("id", F.lit(1), F.lit(SEED)), F.lit(25)))
        .cast("int")
        .alias("s_nationkey"),
        F.round(_u(F.col("id"), 2) * 11_000 - 1_000, 2).alias("s_acctbal"),
    )
    counts["supplier"] = write(supplier, "supplier")

    customer = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        (F.pmod(F.xxhash64("id", F.lit(3), F.lit(SEED)), F.lit(25)))
        .cast("int")
        .alias("c_nationkey"),
        F.round(_u(F.col("id"), 4) * 11_000 - 1_000, 2).alias("c_acctbal"),
        _pick(F.col("id"), 5, SEGMENTS).alias("c_mktsegment"),
    )
    counts["customer"] = write(customer, "customer")

    part = spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.format_string("part %d name", F.col("id")).alias("p_name"),
        _pick(F.col("id"), 6, BRANDS).alias("p_brand"),
        _pick(F.col("id"), 7, TYPES).alias("p_type"),
        (F.pmod(F.xxhash64("id", F.lit(8), F.lit(SEED)), F.lit(50)) + 1)
        .cast("int")
        .alias("p_size"),
        F.round(900 + _u(F.col("id"), 9) * 1_200, 2).alias("p_retailprice"),
    )
    counts["part"] = write(part, "part")

    orders = spark.range(n_ord).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id", F.lit(10), F.lit(SEED)), F.lit(n_cust)).alias(
            "o_custkey"
        ),
        _pick(F.col("id"), 11, STATUSES).alias("o_orderstatus"),
        F.round(1_000 + _u(F.col("id"), 12) * 450_000, 2).alias("o_totalprice"),
        _ts(F.col("id"), 13, "1992-01-01 00:00:00", 2400, "us").alias("o_orderdate"),
        _pick(F.col("id"), 14, PRIORITIES).alias("o_orderpriority"),
    )
    counts["orders"] = write(orders, "orders")

    lineitem = (
        spark.range(n_ord)
        .select(
            F.col("id").alias("l_orderkey"),
            F.explode(
                F.sequence(
                    F.lit(1),
                    (F.pmod(F.xxhash64("id", F.lit(15), F.lit(SEED)), F.lit(7)) + 1)
                    .cast("int"),
                )
            ).alias("l_linenumber"),
        )
        .select(
            "l_orderkey",
            F.pmod(
                F.xxhash64("l_orderkey", "l_linenumber", F.lit(16), F.lit(SEED)),
                F.lit(n_part),
            ).alias("l_partkey"),
            F.pmod(
                F.xxhash64("l_orderkey", "l_linenumber", F.lit(17), F.lit(SEED)),
                F.lit(n_supp),
            ).alias("l_suppkey"),
            F.col("l_linenumber").cast("int").alias("l_linenumber"),
            (
                F.pmod(
                    F.xxhash64("l_orderkey", "l_linenumber", F.lit(18), F.lit(SEED)),
                    F.lit(50),
                )
                + 1
            )
            .cast("double")
            .alias("l_quantity"),
            F.round(
                _u(F.xxhash64("l_orderkey", "l_linenumber"), 19) * 100_000 + 900, 2
            ).alias("l_extendedprice"),
            (
                F.pmod(
                    F.xxhash64("l_orderkey", "l_linenumber", F.lit(20), F.lit(SEED)),
                    F.lit(11),
                )
                / 100.0
            ).alias("l_discount"),
            (
                F.pmod(
                    F.xxhash64("l_orderkey", "l_linenumber", F.lit(21), F.lit(SEED)),
                    F.lit(9),
                )
                / 100.0
            ).alias("l_tax"),
            _pick(F.xxhash64("l_orderkey", "l_linenumber"), 22, FLAGS).alias(
                "l_returnflag"
            ),
            _pick(F.xxhash64("l_orderkey", "l_linenumber"), 23, ["F", "O"]).alias(
                "l_linestatus"
            ),
            _ts(
                F.xxhash64("l_orderkey", "l_linenumber"),
                24,
                "1992-01-03 00:00:00",
                2400,
                "us",
            ).alias("l_shipdate"),
        )
    )
    counts["lineitem"] = write(lineitem, "lineitem")

    events = spark.range(n_ev).select(
        F.col("id").alias("event_id"),
        _ts(F.col("id"), 25, "2024-01-01 00:00:00", 30, "us").alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(26), F.lit(SEED)), F.lit(max(1, n_ev // 100)))
        .alias("user_id"),
        _pick(F.col("id"), 27, EVENT_TYPES).alias("event_type"),
        F.round(_u(F.col("id"), 28) * 100, 4).alias("value"),
        F.to_json(
            F.struct(
                F.pmod(F.xxhash64("id", F.lit(29), F.lit(SEED)), F.lit(10)).alias("p")
            )
        ).alias("props"),
    )
    counts["events"] = write(events, "events")

    n_toks = (F.pmod(F.xxhash64("id", F.lit(30), F.lit(SEED)), F.lit(90)) + 10).cast(
        "int"
    )
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_toks),
            lambda i: F.element_at(
                F.array(*[F.lit(w) for w in VOCAB]),
                (
                    F.pmod(F.xxhash64(F.col("id"), i, F.lit(SEED)), F.lit(len(VOCAB)))
                    + 1
                ).cast("int"),
            ),
        ),
        " ",
    )
    documents = spark.range(n_doc).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        _pick(F.col("id"), 31, LANGS).alias("lang"),
        F.concat(F.lit("src"), F.pmod(F.xxhash64("id", F.lit(32), F.lit(SEED)), F.lit(20)))
        .alias("source"),
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    counts["documents"] = write(documents, "documents")

    embedding = F.transform(
        F.sequence(F.lit(0), F.lit(EMBED_DIM - 1)),
        lambda i: (
            (
                F.pmod(F.xxhash64(F.col("id"), i, F.lit(SEED)), F.lit(2_000_001))
                - 1_000_000
            )
            / 1_000_000.0
        ).cast("float"),
    )
    embeddings = spark.range(n_doc).select(
        F.col("id").alias("vec_id"),
        embedding.alias("embedding"),
        F.pmod(F.xxhash64("id", F.lit(33), F.lit(SEED)), F.lit(10))
        .cast("int")
        .alias("label"),
    )
    counts["embeddings"] = write(embeddings, "embeddings")
    return counts


def _pick_exact(id_col: str, options: list[str]):
    """id-indexed (not hashed) pick — for the fixed region/nation lists."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.col(id_col) % len(options) + 1).cast("int"))
