"""rollback_to_snapshot semantics on iceberg_lite.

Mirrors Iceberg's rollback_to_snapshot procedure: metadata-only main
pointer move to an ancestor; abandoned descendants stay until expire
reclaims them as unreachable; roll-forward works because nothing was
deleted; side-branch snapshots are rejected (publication goes through
fast_forward, never rollback).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_query_engine_spark.sources.iceberg_lite import (
    IcebergLiteTable,
    create_branch,
    expire_snapshots,
    rollback_to_snapshot,
    write_snapshot,
)


@pytest.fixture()
def three_commits(spark, tmp_path):
    path = str(tmp_path / "t")
    for lo in (0, 10, 20):
        df = spark.range(lo, lo + 10).select(F.col("id").alias("k"))
        write_snapshot(df, path)
    return path


def test_rollback_restores_old_state(spark, three_commits):
    path = three_commits
    t = IcebergLiteTable(path)
    assert t.read(spark).count() == 30
    rollback_to_snapshot(path, 2)
    t = IcebergLiteTable(path)
    assert t.current_snapshot_id() == 2
    assert t.read(spark).count() == 20


def test_roll_forward_possible_until_expire(spark, three_commits):
    path = three_commits
    rollback_to_snapshot(path, 1)
    assert IcebergLiteTable(path).read(spark).count() == 10
    rollback_to_snapshot(path, 1)  # idempotent
    # roll forward: snapshot 3 still exists on disk... but it is no
    # longer on main's chain, so rollback must REFUSE it
    with pytest.raises(ValueError, match="not an ancestor"):
        rollback_to_snapshot(path, 3)


def test_commit_after_rollback_branches_history(spark, three_commits):
    path = three_commits
    rollback_to_snapshot(path, 2)
    df = spark.range(100, 105).select(F.col("id").alias("k"))
    new_id = write_snapshot(df, path)
    t = IcebergLiteTable(path)
    assert new_id == 4  # ids stay globally unique, no reuse of 3
    assert t._snapshot(new_id)["parent_snapshot_id"] == 2
    assert t.read(spark).count() == 25
    # snapshot 3's rows (20..29) are gone from main
    assert t.read(spark).filter(F.col("k").between(20, 29)).count() == 0


def test_expire_reclaims_abandoned_descendants(spark, three_commits):
    path = three_commits
    rollback_to_snapshot(path, 2)
    res = expire_snapshots(path, keep_last=10)
    # snapshot 3 is unreachable from any ref → reclaimed even though
    # keep_last would have kept it on the old chain
    assert 3 in res.expired_snapshot_ids
    assert IcebergLiteTable(path).read(spark).count() == 20


def test_side_branch_target_rejected(spark, three_commits):
    path = three_commits
    create_branch(path, "audit", at_snapshot=2)
    df = spark.range(50, 55).select(F.col("id").alias("k"))
    write_snapshot(df, path, branch="audit")
    branch_head = IcebergLiteTable(path).refs()["audit"]["snapshot_id"]
    with pytest.raises(ValueError, match="not an ancestor"):
        rollback_to_snapshot(path, branch_head)


def test_timestamp_travel_follows_rolled_back_chain(spark, three_commits):
    path = three_commits
    t = IcebergLiteTable(path)
    ts3 = t._snapshot(3)["timestamp_ms"]
    rollback_to_snapshot(path, 2)
    t = IcebergLiteTable(path)
    # 'as of now' resolves along the NEW main chain — never the
    # abandoned snapshot 3
    assert t.snapshot_as_of(ts3 + 10_000) == 2
