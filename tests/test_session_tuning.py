"""Size-aware session tuning (r4 verdict #2): the sf10-winning config
lives in session.tune_for_corpus so any session inherits it by input
size, not just the bench harness."""

from __future__ import annotations

from iceberg_query_engine_spark import session as S


def test_corpus_bytes_counts_parquet(sf_oracle):
    n = S.corpus_bytes(sf_oracle)
    assert n > 100_000  # sf0.01 corpus is several MB of parquet


def test_small_corpus_untouched(spark, sf_oracle):
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    applied = S.tune_for_corpus(spark, sf_oracle)
    # sub-GB corpus: stock confs already behave right (measured: firing
    # blooms on ~10 MB scans costs more than it saves) — no changes
    assert applied == {}
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before


def test_large_corpus_engages_all_levers(spark, sf_oracle, monkeypatch):
    monkeypatch.setattr(S, "corpus_bytes", lambda d: 20 << 30)  # pretend 20 GB
    applied = S.tune_for_corpus(spark, sf_oracle, cpus=32)
    try:
        assert applied["spark.sql.autoBroadcastJoinThreshold"] == str(64 * 1024 * 1024)
        assert applied["spark.sql.shuffle.partitions"] == "64"
        # ~5% of 20 GB = 1 GB
        assert applied[
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ] == str(max((20 << 30) // 20, 64 * 1024 * 1024))
    finally:  # restore test-session confs
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
