"""Metadata-orphan sweep + commit-path crash-injection property tests
(r7 verdict, Next round #5: 'turn the argument into a test').

The commit path CAN strand metadata — these tests inject a crash at
each window inside _append_snapshot_manifests_locked and prove that
(1) the table stays readable and equal to its pre-crash state,
(2) remove_orphan_metadata identifies exactly the stranded files,
(3) after the sweep the table still reads correctly and the next
    commit succeeds.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from iceberg_query_engine_spark.sources import iceberg_lite as il


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    il.write_snapshot(
        spark.range(5).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
        path,
    )
    il.write_snapshot(
        spark.range(5, 8).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
        path,
    )
    return path


def _read_rows(spark, path):
    return sorted(
        (r.k, r.v) for r in il.IcebergLiteTable(path).read(spark).collect()
    )


def _meta_files(path):
    return sorted(os.listdir(os.path.join(path, "metadata")))


def test_sweep_noop_on_healthy_branched_table(spark, table):
    il.create_branch(table, "audit")
    il.write_snapshot(
        spark.range(8, 9).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
        table,
        branch="audit",
    )
    res = il.remove_orphan_metadata(table, dry_run=True)
    assert res.orphan_paths == []


def _crash_after_n_atomic_writes(monkeypatch, n: int):
    """Raise inside the (n+1)-th _atomic_json call of the next commit.
    Call order in _append_snapshot_manifests_locked: [0] snapshot file,
    [1] metadata pointer — manifests/manifest-list use plain writes
    before either."""
    real = il._atomic_json
    state = {"count": 0}

    def crashing(dest, payload):
        if state["count"] == n:
            raise RuntimeError("injected crash")
        state["count"] += 1
        return real(dest, payload)

    monkeypatch.setattr(il, "_atomic_json", crashing)
    return state


@pytest.mark.parametrize("crash_at", [0, 1])
def test_crash_windows_strand_only_sweepable_metadata(
    spark, table, monkeypatch, crash_at
):
    """crash_at=0: dies before the snapshot file (strands manifest +
    manifest list). crash_at=1: dies before the pointer advance
    (strands a VISIBLE snapshot — the worst window)."""
    before_rows = _read_rows(spark, table)
    before_files = set(_meta_files(table))
    head = il.IcebergLiteTable(table).current_snapshot_id()

    _crash_after_n_atomic_writes(monkeypatch, crash_at)
    with pytest.raises(RuntimeError, match="injected crash"):
        il.write_snapshot(
            spark.range(100, 103).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            ),
            table,
        )
    monkeypatch.undo()

    # (1) the crashed commit is invisible to readers
    t = il.IcebergLiteTable(table)
    assert t.current_snapshot_id() == head
    assert _read_rows(spark, table) == before_rows

    stranded = set(_meta_files(table)) - before_files
    assert stranded, "the crash window must strand at least one file"
    if crash_at == 1:
        # the stranded snapshot is GLOBBED by snapshots() — the reason
        # this sweep exists
        assert any(f.startswith("snap-") for f in stranded)
        assert len(t.snapshots()) == len(t.ancestor_chain(head)) + 1

    # (2) the sweep finds exactly the stranded files (data/ untouched)
    res = il.remove_orphan_metadata(table, dry_run=True)
    assert set(res.orphan_paths) == {f"metadata/{f}" for f in stranded}
    assert set(_meta_files(table)) - before_files == stranded  # dry run

    res = il.remove_orphan_metadata(table, dry_run=False)
    assert res.removed
    assert set(_meta_files(table)) == before_files

    # (3) reads unchanged; the next commit succeeds and is readable
    assert _read_rows(spark, table) == before_rows
    il.write_snapshot(
        spark.range(200, 201).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        table,
    )
    assert (200, 400) in _read_rows(spark, table)
    assert il.remove_orphan_metadata(table, dry_run=True).orphan_paths == []


def test_sweep_reclaims_atomic_tmp_debris(spark, table):
    tmp = os.path.join(table, "metadata", "metadata.json.tmp-deadbeef")
    with open(tmp, "w") as f:
        json.dump({"partial": True}, f)
    res = il.remove_orphan_metadata(table, dry_run=False)
    assert res.orphan_paths == ["metadata/metadata.json.tmp-deadbeef"]
    assert not os.path.exists(tmp)


def test_sweep_reclaims_dropped_branch_chain(spark, table):
    """drop_ref leaves the branch's snapshots on disk; they are
    unreachable from every ref, so the metadata sweep reclaims them
    (the documented expire/orphan split)."""
    il.create_branch(table, "audit")
    staged = il.write_snapshot(
        spark.range(50, 52).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        table,
        branch="audit",
    )
    il.drop_ref(table, "audit")
    before_rows = _read_rows(spark, table)
    res = il.remove_orphan_metadata(table, dry_run=False)
    assert f"metadata/snap-{staged}.snapshot.json" in res.orphan_paths
    assert _read_rows(spark, table) == before_rows
    # the branch snapshot's data files are now data-side orphans
    orphans = il.remove_orphan_files(table, dry_run=True)
    assert orphans.orphan_paths, "dropped-branch data should orphan"
