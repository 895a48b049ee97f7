"""All non-TPC-H suites vs DuckDB oracle (mirrors the driver's t2 gate)."""

from __future__ import annotations

import pytest

from iceberg_query_engine_spark.queries import catalog, tpch
from iceberg_query_engine_spark.testing import compare


def _cases():
    qs, osql = catalog.all_queries(), catalog.all_oracles()
    return [(n, qs[n], osql.get(n)) for n in sorted(qs) if n not in tpch.QUERIES]


@pytest.mark.parametrize("name,fn,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_suite_query_matches_oracle(spark, sf_oracle, name, fn, oracle):
    if oracle is None:
        # rows-only check (approx sketches, streaming, etc.)
        assert fn(spark, sf_oracle).count() > 0, f"{name}: empty result"
        return
    res = compare(name, fn(spark, sf_oracle), oracle, sf_oracle)
    assert res.ok, f"{name}: {res.detail} spark={res.spark_rows} duck={res.duck_rows}\n" + "\n".join(
        res.mismatches[:5]
    )
    assert res.spark_rows > 0, f"{name}: empty result weakens the test"


def test_stream_stateful_tws_gated(spark, sf_oracle):
    """transformWithState twin: runs and matches the batch groupBy when
    protobuf is present; raises a documented NotImplementedError here
    (no protobuf wheel in the container — same policy as decode_image)."""
    import pytest

    from iceberg_query_engine_spark.streaming import stateful

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="protobuf"):
            stateful.stream_stateful_tws(spark, sf_oracle)
        return
    df = stateful.stream_stateful_tws(spark, sf_oracle)
    batch = (
        spark.read.parquet(f"{sf_oracle}/events.parquet")
        .groupBy("user_id")
        .count()
    )
    assert df.count() == batch.count()
