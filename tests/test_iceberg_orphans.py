"""remove_orphan_files semantics on iceberg_lite.

Mirrors Apache Iceberg's remove_orphan_files procedure: only files no
snapshot of any ref references are reclaimed, delete-file DIRECTORIES
are protected through ancestor-path matching, metadata is never
touched, and in-flight staging trees are only reclaimed past an
explicit age horizon. The reference's iceberg.rs is scan-only, so this
maintenance surface is surplus parity with the real format.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from iceberg_query_engine_spark.sources.iceberg_lite import (
    IcebergLiteTable,
    create_branch,
    remove_orphan_files,
    write_position_deletes,
    write_snapshot,
)


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.range(20).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    path = str(tmp_path / "t")
    write_snapshot(df, path)
    return path, df


def _plant(path: str, name: str, content: bytes = b"junk") -> str:
    p = os.path.join(path, "data", name)
    with open(p, "wb") as f:
        f.write(content)
    return f"data/{name}"


def test_clean_table_has_no_orphans(spark, table):
    path, _df = table
    res = remove_orphan_files(path)
    assert res.orphan_paths == []
    assert res.bytes_total == 0


def test_dry_run_lists_but_keeps(spark, table):
    path, _df = table
    rel = _plant(path, "orphan-0.parquet")
    res = remove_orphan_files(path, dry_run=True)
    assert res.orphan_paths == [rel]
    assert res.bytes_total == 4
    assert not res.removed
    assert os.path.exists(os.path.join(path, rel))


def test_remove_deletes_only_orphans(spark, table):
    path, df = table
    rel = _plant(path, "orphan-0.parquet")
    before = {
        os.path.join(dp, fn)
        for dp, _d, fns in os.walk(os.path.join(path, "data"))
        for fn in fns
    }
    res = remove_orphan_files(path, dry_run=False)
    assert res.removed and res.orphan_paths == [rel]
    assert not os.path.exists(os.path.join(path, rel))
    after = {
        os.path.join(dp, fn)
        for dp, _d, fns in os.walk(os.path.join(path, "data"))
        for fn in fns
    }
    assert before - after == {os.path.join(path, rel)}
    # table still reads in full
    assert IcebergLiteTable(path).read(spark).count() == df.count()


def test_delete_file_dirs_protected_via_ancestor(spark, table):
    path, _df = table
    # positional delete writes a parquet DIRECTORY under data/ that
    # manifests reference by its directory rel path
    write_position_deletes(spark, path, "k % 7 = 0")
    res = remove_orphan_files(path, dry_run=False)
    assert res.orphan_paths == []
    t = IcebergLiteTable(path)
    assert t.read(spark).filter(F.col("k") % 7 == 0).count() == 0


def test_branch_files_are_referenced(spark, table):
    path, df = table
    create_branch(path, "audit")
    write_snapshot(df.withColumn("k", F.col("k") + 100), path, branch="audit")
    res = remove_orphan_files(path, dry_run=False)
    # the audit branch's data files are referenced by its snapshot
    assert res.orphan_paths == []
    assert IcebergLiteTable(path).read(spark, ref="audit").count() == 2 * df.count()


def test_staging_kept_without_age_horizon(spark, table):
    path, _df = table
    sdir = os.path.join(path, "_staging-9999-deadbeef")
    os.makedirs(sdir)
    with open(os.path.join(sdir, "part-0.parquet"), "wb") as f:
        f.write(b"inflight")
    res = remove_orphan_files(path, dry_run=False)
    assert res.orphan_paths == []
    assert os.path.exists(sdir)


def test_staging_reclaimed_past_age_horizon(spark, table):
    path, _df = table
    sdir = os.path.join(path, "_staging-9999-deadbeef")
    os.makedirs(sdir)
    fp = os.path.join(sdir, "part-0.parquet")
    with open(fp, "wb") as f:
        f.write(b"crashed")
    old = time.time() - 7 * 86400
    os.utime(fp, (old, old))
    res = remove_orphan_files(
        path, dry_run=False, older_than_ms=int((time.time() - 86400) * 1000)
    )
    assert res.orphan_paths == ["_staging-9999-deadbeef/part-0.parquet"]
    assert not os.path.exists(sdir)  # emptied tree pruned


def test_metadata_never_scanned(spark, table):
    path, _df = table
    stray = os.path.join(path, "metadata", "scratch.txt")
    with open(stray, "w") as f:
        f.write("notes")
    res = remove_orphan_files(path, dry_run=False)
    assert res.orphan_paths == []
    assert os.path.exists(stray)
