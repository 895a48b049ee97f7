"""Partition-spec evolution on iceberg_lite.

Iceberg evolves partition specs without rewriting data: files written
under an old spec stay as they are, files written under the new spec
get the new layout, and one scan handles both — pruning applies to
files whose spec carries the filter column and conservatively keeps
the rest. This layout stores partition values per FILE entry, so
mixed specs compose naturally; these tests pin that behavior (the
reference's iceberg.rs assumes one spec for the whole table).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_query_engine_spark.sources.iceberg_lite import (
    IcebergLiteTable,
    PartitionFilter,
    compact,
    write_snapshot,
)


@pytest.fixture()
def mixed(spark, tmp_path):
    """Snapshot 1 unpartitioned, snapshot 2 partitioned by `cat`."""
    path = str(tmp_path / "t")
    df1 = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("cat")
    )
    df2 = spark.range(10, 30).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("cat")
    )
    write_snapshot(df1, path)
    write_snapshot(df2, path, partition_by="cat")
    return path


def test_mixed_spec_scan_reads_everything(spark, mixed):
    t = IcebergLiteTable(mixed)
    assert t.read(spark).count() == 30


def test_filter_prunes_new_spec_keeps_old_conservatively(spark, mixed):
    t = IcebergLiteTable(mixed)
    df = t.read(spark, partition_filters=[PartitionFilter("cat", ["1"])])
    m = t.metrics
    # snapshot 2 wrote one file per cat value: cat=0 pruned
    assert m.files_pruned_by_partition >= 1
    # snapshot 1's files carry no cat partition value → kept (correctness
    # over pruning: the engine re-applies the exact filter)
    assert m.files_scanned >= 2
    out = df.filter(F.col("cat") == "1")
    assert out.count() == 15  # odd ks in 0..29
    assert out.agg(F.min("k")).first()[0] == 1


def test_exactness_never_depends_on_pruning(spark, mixed):
    t = IcebergLiteTable(mixed)
    pruned = (
        t.read(spark, partition_filters=[PartitionFilter("cat", ["0"])])
        .filter(F.col("cat") == "0")
    )
    full = t.read(spark).filter(F.col("cat") == "0")
    assert sorted(r.k for r in pruned.collect()) == sorted(
        r.k for r in full.collect()
    )


def test_compact_rewrites_under_one_spec(spark, mixed):
    compact(spark, mixed, partition_by="cat")
    t = IcebergLiteTable(mixed)
    # every live file now carries the cat partition value
    parts = [e.get("partition", {}) for e in t.data_files()]
    assert all("cat" in p for p in parts)
    t.read(spark, partition_filters=[PartitionFilter("cat", ["1"])])
    # with one spec, nothing is conservatively kept: only cat=1 scanned
    assert t.metrics.files_pruned_by_partition >= 1
    assert all(
        e["partition"]["cat"] == "1"
        for e in t.data_files()
        if e["partition"].get("cat") == "1"
    )
    assert t.read(spark).count() == 30


def test_repartitioning_existing_column_changes_no_rows(spark, mixed):
    before = sorted(r.k for r in IcebergLiteTable(mixed).read(spark).collect())
    compact(spark, mixed, partition_by="cat")
    after = sorted(r.k for r in IcebergLiteTable(mixed).read(spark).collect())
    assert before == after
