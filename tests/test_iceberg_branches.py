"""Branch/tag refs + write-audit-publish on iceberg_lite.

Semantics mirrored from Apache Iceberg's branching spec (refs map in
table metadata, fast_forward procedure, tag immutability); the
reference's iceberg.rs is read-only single-ref, so this surface is
surplus parity with the real format.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_query_engine_spark.sources.iceberg_lite import (
    IcebergLiteTable,
    create_branch,
    create_tag,
    drop_ref,
    expire_snapshots,
    fast_forward,
    write_snapshot,
)


@pytest.fixture()
def base(spark, tmp_path):
    df = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    path = str(tmp_path / "t")
    write_snapshot(df, path)
    return path, df


def test_branch_commit_isolated_from_main(spark, base):
    path, df = base
    t = IcebergLiteTable(path)
    main_head = t.current_snapshot_id()
    create_branch(path, "dev")
    write_snapshot(df.withColumn("k", F.col("k") + 100), path, branch="dev")
    # main pointer untouched; branch sees both snapshots
    assert t.current_snapshot_id() == main_head
    assert t.read(spark).count() == 10
    assert t.read(spark, ref="dev").count() == 20
    assert t.resolve_ref("main") == main_head


def test_fast_forward_publishes_and_refuses_divergence(spark, base):
    path, df = base
    t = IcebergLiteTable(path)
    create_branch(path, "audit")
    write_snapshot(df, path, branch="audit")
    fast_forward(path, "main", "audit")
    assert t.current_snapshot_id() == t.resolve_ref("audit")
    assert t.read(spark).count() == 20
    # diverge: commit to main, then audit is no longer a descendant
    write_snapshot(df, path, branch="audit")
    write_snapshot(df, path)  # main advances independently
    with pytest.raises(ValueError, match="not an ancestor"):
        fast_forward(path, "main", "audit")


def test_tag_is_immutable_and_readable(spark, base):
    path, df = base
    create_tag(path, "v1")
    write_snapshot(df, path)  # main moves on
    t = IcebergLiteTable(path)
    assert t.read(spark, ref="v1").count() == 10
    assert t.read(spark).count() == 20
    with pytest.raises(ValueError, match="immutable"):
        write_snapshot(df, path, branch="v1")


def test_unknown_branch_requires_create(spark, base):
    path, df = base
    with pytest.raises(ValueError, match="create_branch"):
        write_snapshot(df, path, branch="nope")
    with pytest.raises(ValueError, match="unknown ref"):
        IcebergLiteTable(path).resolve_ref("nope")


def test_drop_ref_then_expire_reclaims_branch_files(spark, base):
    path, df = base
    t = IcebergLiteTable(path)
    create_branch(path, "scratch")
    write_snapshot(df, path, branch="scratch")
    scratch_head = t.resolve_ref("scratch")
    # while the ref lives, expire must NOT touch its head
    res = expire_snapshots(path, keep_last=0)
    assert scratch_head not in res.expired_snapshot_ids
    assert t.read(spark, ref="scratch").count() == 20
    drop_ref(path, "scratch")
    res = expire_snapshots(path, keep_last=0)
    assert scratch_head in res.expired_snapshot_ids
    assert "scratch" not in t.refs()
    # main unaffected throughout
    assert t.read(spark).count() == 10


def test_snapshot_ids_globally_unique_across_branches(spark, base):
    path, df = base
    create_branch(path, "b1")
    s_branch = write_snapshot(df, path, branch="b1")
    s_main = write_snapshot(df, path)
    assert s_branch != s_main
    meta_dir = os.path.join(path, "metadata")
    snaps = [f for f in os.listdir(meta_dir) if f.startswith("snap-")]
    assert len(snaps) == 3  # base + branch + main, no overwrite


def test_fast_forward_refuses_tags(spark, base):
    path, df = base
    create_tag(path, "v1")
    create_branch(path, "dev")
    write_snapshot(df, path, branch="dev")
    with pytest.raises(ValueError, match="immutable"):
        fast_forward(path, "v1", "dev")
    # the tag still points where it was created and stays a tag
    t = IcebergLiteTable(path)
    assert t.refs()["v1"] == {"snapshot_id": 1, "type": "tag"}


def test_expire_protects_live_branch_chain(spark, base):
    """A live branch's mid-chain ancestors must survive expiry so
    fast_forward can still walk+publish it (the chain is metadata-only,
    so protecting it costs nothing at any scale)."""
    path, df = base
    create_branch(path, "audit")
    write_snapshot(df, path, branch="audit")  # snap 2 (mid-chain soon)
    write_snapshot(df, path, branch="audit")  # snap 3 (head)
    res = expire_snapshots(path, older_than_ms=int(1e18))
    assert 2 not in res.expired_snapshot_ids
    # publish still works after expiry
    fast_forward(path, "main", "audit")
    t = IcebergLiteTable(path)
    assert t.read(spark).count() == 30
