"""Plan pin for q9's storage-partitioned shape (r4 verdict #1).

Over the bucketed catalog layout (register_catalog_layout) with CBO
column stats, the verbatim q9 text must plan to the shape measured
fastest at sf10:

- runtime bloom filters (might_contain) reach AT LEAST TWO fact scans
  (lineitem + partsupp), i.e. the part predicate prunes the fact reads;
- lineitem joins orders with NO exchange on either side (co-bucketed
  scan-to-scan sort-merge join);
- at most ONE exchange carries fact-scale data (the joined stream
  meeting bucketed partsupp) — the remaining exchanges are the
  aggregation/sort/bloom singletons.

The test mimics sf10's RELATIVE sizes at sf0.1 by shrinking the
broadcast and bloom thresholds (at sf0.1's absolute sizes everything
would broadcast and nothing would bloom — the same reason
tune_for_corpus scales thresholds by corpus bytes).
"""

from __future__ import annotations

import re

import pytest

from iceberg_query_engine_spark.queries import tpch_full


@pytest.fixture(scope="module")
def bucketed_q9_plan(spark):
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems",
        )
    }
    data_dir = tpch_full.ensure_full_data(spark, "/root/testdata/sf0.1")
    tpch_full.register_catalog_layout(spark, data_dir, "sf0.1", buckets=16)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(1 << 20))
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "8m"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "64KB",
        )
        df = spark.sql(tpch_full.QUERY_TEXTS[9])
        plan = df._jdf.queryExecution().executedPlan().toString()
        yield plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        spark.catalog.setCurrentDatabase("default")


def test_q9_runtime_filters_reach_two_fact_scans(bucketed_q9_plan):
    scans_with_bloom = re.findall(
        r"might_contain", bucketed_q9_plan
    )
    assert len(scans_with_bloom) >= 2, bucketed_q9_plan


def test_q9_lineitem_orders_join_is_exchange_free(bucketed_q9_plan):
    """The SMJ on l_orderkey/o_orderkey reads both bucketed scans
    directly: no hash exchange on the orderkey exists anywhere in the
    plan (the only Exchanges are the joined-stream→partsupp hash, the
    aggregation/sort repartitions, and the bloom build's
    SinglePartition)."""
    plan = bucketed_q9_plan
    assert re.search(r"SortMergeJoin \[l_orderkey[^\]]*\], \[o_orderkey", plan), plan
    assert not re.search(r"Exchange hashpartitioning\(l_orderkey", plan), plan
    assert not re.search(r"Exchange hashpartitioning\(o_orderkey", plan), plan
    # both fact scans are bucketed scans, every bucket selected
    assert plan.count("Bucketed: true") >= 3, plan  # lineitem, orders, partsupp


def test_q9_single_fact_exchange(bucketed_q9_plan):
    """Exchanges in the final plan: joined-stream→partsupp (1), the
    two aggregation/sort exchanges, and the bloom's SinglePartition —
    no second fact-scale hash exchange (the flat layout has three)."""
    hash_exchanges = re.findall(r"Exchange hashpartitioning", bucketed_q9_plan)
    assert len(hash_exchanges) <= 2, bucketed_q9_plan  # joined stream + partial agg


@pytest.fixture(scope="module")
def rewritten_q9_plan(spark):
    """Same bucketed layout, the REWRITTEN q9 (plans/rewrites.py):
    semi-filtered facts + the redundant part inner join eliminated."""
    from iceberg_query_engine_spark.plans.rewrites import apply_rewrites

    data_dir = tpch_full.ensure_full_data(spark, "/root/testdata/sf0.1")
    tpch_full.register_catalog_layout(spark, data_dir, "sf0.1", buckets=16)
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        # pin blooms OFF for this shape check — the sibling fixture's
        # module-scoped shrunken thresholds would otherwise add a bloom
        # build's part re-scan and break the scan-count pin
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    )
    saved = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(1 << 20))
        spark.conf.set(keys[1], "1000GB")
        df = spark.sql(apply_rewrites(tpch_full.QUERY_TEXTS[9]))
        yield df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        spark.catalog.setCurrentDatabase("default")


def test_rewritten_q9_shape(rewritten_q9_plan):
    """The sf100-measured winning shape: part appears ONLY as the two
    broadcast semi builds (the filter-only inner join is eliminated —
    its SMJ re-hashed the whole joined stream by p_partkey at sf100),
    and the lineitem⋈orders SMJ stays exchange-free on the buckets."""
    plan = rewritten_q9_plan
    assert plan.count("BroadcastHashJoin [l_partkey") + plan.count(
        "BroadcastHashJoin [ps_partkey"
    ) == 2 or len(re.findall(r"LeftSemi", plan)) >= 2, plan
    # part scanned exactly twice (both semi builds) — the third scan
    # (the eliminated inner join) must NOT reappear
    assert len(re.findall(r"Scan parquet [^\n]*\.part\b", plan)) == 2, plan
    assert not re.search(r"Exchange hashpartitioning\(l_orderkey", plan), plan
    # one fact-scale hash exchange (joined stream → partsupp) + partial
    # agg; a regression to the part SMJ would add a third
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2, plan


def test_pick_bucket_count_scales_with_lineitem_bytes(tmp_path):
    """64 buckets up to ~16 GB of lineitem (sf10 keeps the measured-best
    64); past 256 MB/bucket the count doubles (sf100 ~19 GB -> 128)."""
    from iceberg_query_engine_spark.queries.tpch_full import pick_bucket_count

    li = tmp_path / "lineitem.parquet"
    li.mkdir()
    probe = li / "part-00000.parquet"

    probe.write_bytes(b"\0" * 1024)  # tiny corpus: floor
    assert pick_bucket_count(str(tmp_path)) == 64

    # fake a 19 GB corpus with a sparse file (no disk actually used)
    with open(probe, "wb") as f:
        f.truncate(19 * 1024**3)
    assert pick_bucket_count(str(tmp_path)) == 128


def test_bucket_count_inferred_from_file_names(tmp_path):
    """Re-attach without a sidecar must infer the WRITTEN bucket count
    from the _NNNNN file-name suffix — with the shuffle-free
    multi-file-per-bucket layout, len(files) overcounts (64 tasks x 128
    buckets) — rounded up to the pow2 contract (ADVICE r5)."""
    from iceberg_query_engine_spark.queries.tpch_full import _bucket_count_of

    files = [
        f"part-{t:05d}-deadbeef_{b:05d}.c000.snappy.parquet"
        for t in range(4)
        for b in range(128)
    ]
    assert _bucket_count_of(str(tmp_path), files) == 128
