"""Distributed data generator: testdata-compatible output (CLI
`generate-parquet` ↔ reference src/tpch/generator.rs + main.rs:59-75)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def gen_dir(spark, tmp_path_factory):
    from iceberg_query_engine_spark.sources.generator import generate_tpch

    out = str(tmp_path_factory.mktemp("gen") / "sf_tiny")
    counts = generate_tpch(spark, 0.001, out)
    return out, counts


def test_row_counts_scale(gen_dir):
    _, counts = gen_dir
    assert counts["region"] == 5 and counts["nation"] == 25
    assert counts["orders"] == 1500
    # 1..8 lines per order, deterministic hash → ~4.5 avg
    assert 4000 <= counts["lineitem"] <= 8000


def test_schemas_match_testdata(gen_dir):
    """Footer-identical schemas (incl. µs-timestamp encoding) so every
    reader path — registry normalization, streaming glob, DuckDB —
    treats generated corpora exactly like the driver's."""
    out, _ = gen_dir
    for t in ["orders", "lineitem", "events", "documents", "embeddings"]:
        a = pq.read_schema(f"{out}/{t}.parquet")
        b = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        assert [(f.name, str(f.type)) for f in a] == [
            (f.name, str(f.type)) for f in b
        ], t


def test_generated_corpus_runs_queries(spark, gen_dir):
    out, _ = gen_dir
    from iceberg_query_engine_spark.queries import events_suite, tpch

    assert tpch.q6(spark, out).count() == 1
    assert tpch.q1(spark, out).count() > 0
    assert events_suite.ev_tumbling(spark, out).count() > 0


def test_generation_is_deterministic(spark, gen_dir, tmp_path):
    from iceberg_query_engine_spark.sources.generator import generate_tpch

    out, _ = gen_dir
    again = str(tmp_path / "again")
    generate_tpch(spark, 0.001, again)
    a = spark.read.parquet(f"{out}/lineitem.parquet")
    b = spark.read.parquet(f"{again}/lineitem.parquet")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
