"""Regression tests for the round-6 ADVICE findings, all in the
iceberg_lite branch machinery:

1. (medium) snapshot_as_of must resolve TIMESTAMP AS OF against MAIN's
   ancestor chain, never a live/dropped side-branch snapshot — the WAP
   isolation guarantee.
2. (low) fast_forward with an unknown `branch` must raise, not silently
   create the ref at the target.
3. (low) expire_snapshots keep_last counts position within main's
   ancestor chain, not raw id distance (ids are globally unique across
   branches and interleave).
4. (low) snapshots-meta rows_added diffs each snapshot against its
   PARENT's file set, not the previous snapshot in global id order.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from iceberg_query_engine_spark.queries.iceberg_suite import snapshots_meta_rows
from iceberg_query_engine_spark.sources.iceberg_lite import (
    IcebergLiteTable,
    create_branch,
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


def test_timestamp_travel_ignores_live_branch(spark, base):
    """A batch staged on an audit branch must NOT be what a
    TIMESTAMP AS OF 'now' read resolves to."""
    path, df = base
    t = IcebergLiteTable(path)
    main_head = t.current_snapshot_id()
    create_branch(path, "audit")
    staged = write_snapshot(df.withColumn("k", F.col("k") + 100), path, branch="audit")
    now_ms = int(time.time() * 1000) + 60_000
    resolved = t.snapshot_as_of(now_ms)
    assert resolved == main_head
    assert resolved != staged
    # publish, then 'now' resolves to the published head
    fast_forward(path, "main", "audit")
    assert t.snapshot_as_of(int(time.time() * 1000) + 60_000) == staged


def test_timestamp_travel_ignores_dropped_branch(spark, base):
    """A rejected batch (branch dropped, snapshots not yet expired)
    must stay invisible to timestamp travel."""
    path, df = base
    t = IcebergLiteTable(path)
    main_head = t.current_snapshot_id()
    create_branch(path, "bad")
    write_snapshot(df.withColumn("v", -F.col("v")), path, branch="bad")
    drop_ref(path, "bad")
    # the rejected snapshot file is still on disk, but unreachable
    assert t.snapshot_as_of(int(time.time() * 1000) + 60_000) == main_head


def test_fast_forward_unknown_branch_raises(spark, base):
    path, df = base
    create_branch(path, "dev")
    write_snapshot(df, path, branch="dev")
    with pytest.raises(ValueError, match="unknown ref 'mian'"):
        fast_forward(path, "mian", "dev")  # the typo must not create a ref
    assert "mian" not in IcebergLiteTable(path).refs()


def test_expire_keep_last_counts_main_chain_position(spark, base):
    """main ids 1,2,5 with live-branch ids 3,4 interleaved: keep_last=2
    must retain main snapshots 2 and 5 (the two newest ON MAIN), only
    expiring 1 — id arithmetic (sid <= 5-2) would wrongly expire 2."""
    path, df = base  # snap 1 on main
    t = IcebergLiteTable(path)
    write_snapshot(df, path)  # snap 2 on main
    create_branch(path, "dev")
    write_snapshot(df, path, branch="dev")  # snap 3
    write_snapshot(df, path, branch="dev")  # snap 4
    write_snapshot(df, path)  # snap 5 on main
    assert t.ancestor_chain(t.current_snapshot_id()) == [5, 2, 1]
    res = expire_snapshots(path, keep_last=2)
    assert res.expired_snapshot_ids == [1]
    assert 2 in res.remaining_snapshot_ids
    # the live branch chain is untouched
    assert t.read(spark, ref="dev").count() == 40


def test_snapshots_meta_diffs_against_parent(spark, base):
    """With branch ids interleaving main's chain, rows_added must be
    computed against each snapshot's parent, not the prior id."""
    path, df = base  # snap 1: 10 rows
    write_snapshot(df, path)  # snap 2 (parent 1): +10
    create_branch(path, "dev")
    write_snapshot(df.limit(3), path, branch="dev")  # snap 3 (parent 2): +3
    write_snapshot(df.limit(7), path)  # snap 4 on main (parent 2): +7
    rows = {sid: (parent, added) for sid, parent, _op, added in snapshots_meta_rows(path)}
    assert rows[1] == (None, 10)
    assert rows[2] == (1, 10)
    assert rows[3] == (2, 3)
    # the id-order diff would have compared snap 4 against branch snap 3
    assert rows[4] == (2, 7)
