"""Schema evolution on iceberg_lite: id-based column resolution.

Mirrors Apache Iceberg's semantics: rename is metadata-only (old files
resolve through field ids), a new column reads as NULL from files that
predate it, drop hides the column without rewriting data, and time
travel reads each snapshot under the schema current AT ITS COMMIT.
The reference's iceberg.rs reads a single fixed schema, so this
surface is surplus parity with the real format.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_query_engine_spark.sources.iceberg_lite import (
    IcebergLiteTable,
    add_column,
    drop_column,
    rename_column,
    write_snapshot,
)


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    path = str(tmp_path / "t")
    write_snapshot(df, path)
    return path, df


def test_rename_is_metadata_only(spark, table):
    path, _df = table
    files_before = {e["file_path"] for e in IcebergLiteTable(path).data_files()}
    rename_column(path, "v", "value")
    t = IcebergLiteTable(path)
    files_after = {e["file_path"] for e in t.data_files()}
    assert files_before == files_after  # no rewrite
    out = t.read(spark)
    assert out.columns == ["k", "value"]
    assert out.agg(F.sum("value")).first()[0] == sum(i * 2.0 for i in range(10))


def test_add_column_reads_null_from_old_files(spark, table):
    path, _df = table
    add_column(path, "tag", "string")
    new = spark.range(10, 15).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.0).alias("v"),
        F.lit("late").alias("tag"),
    )
    write_snapshot(new, path)
    out = IcebergLiteTable(path).read(spark)
    assert out.columns == ["k", "v", "tag"]
    assert out.filter(F.col("tag").isNull()).count() == 10
    assert out.filter(F.col("tag") == "late").count() == 5


def test_drop_column_hides_without_rewrite(spark, table):
    path, _df = table
    files_before = {e["file_path"] for e in IcebergLiteTable(path).data_files()}
    drop_column(path, "v")
    t = IcebergLiteTable(path)
    assert {e["file_path"] for e in t.data_files()} == files_before
    out = t.read(spark)
    assert out.columns == ["k"]
    assert out.count() == 10


def test_time_travel_uses_snapshot_era_schema(spark, table):
    path, _df = table
    snap1 = IcebergLiteTable(path).current_snapshot_id()
    rename_column(path, "v", "value")
    new = spark.range(10, 15).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("value")
    )
    write_snapshot(new, path)
    t = IcebergLiteTable(path)
    # current read: renamed name, both eras of files
    cur = t.read(spark)
    assert cur.columns == ["k", "value"] and cur.count() == 15
    # time travel to snap1: the ORIGINAL name, as Iceberg resolves
    # snapshot reads under snapshot.schema_id
    old = t.read(spark, snapshot_id=snap1)
    assert old.columns == ["k", "v"] and old.count() == 10


def test_rename_then_rename_back_round_trips(spark, table):
    path, _df = table
    rename_column(path, "v", "tmp")
    rename_column(path, "tmp", "v")
    out = IcebergLiteTable(path).read(spark)
    assert out.columns == ["k", "v"]
    assert out.count() == 10


def test_stale_name_append_refused(spark, table):
    path, df = table
    rename_column(path, "v", "value")
    with pytest.raises(ValueError, match="do not match the"):
        write_snapshot(df, path)  # still has old 'v' column


def test_ddl_validation(spark, table):
    path, _df = table
    with pytest.raises(ValueError, match="unknown column"):
        rename_column(path, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(path, "v", "k")
    with pytest.raises(ValueError, match="already exists"):
        add_column(path, "k", "string")
    with pytest.raises(ValueError, match="unknown column"):
        drop_column(path, "nope")
    drop_column(path, "v")
    with pytest.raises(ValueError, match="last column"):
        drop_column(path, "k")


def test_field_ids_stay_unique_after_drop_and_add(spark, table):
    path, _df = table
    # drop v (id 2), then add a column: its id must NOT reuse 2,
    # otherwise old files' v bytes would leak into the new column
    drop_column(path, "v")
    add_column(path, "fresh", "double")
    t = IcebergLiteTable(path)
    cur = t.current_schema()
    ids = [f["id"] for f in cur["fields"]]
    assert len(ids) == len(set(ids))
    out = t.read(spark)
    assert out.columns == ["k", "fresh"]
    # old files must read NULL for fresh, never v's bytes
    assert out.filter(F.col("fresh").isNotNull()).count() == 0


def test_evolution_composes_with_branches(spark, table):
    path, df = table
    from iceberg_query_engine_spark.sources.iceberg_lite import create_branch

    create_branch(path, "dev")
    rename_column(path, "v", "value")
    new = spark.range(20, 22).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("value")
    )
    write_snapshot(new, path, branch="dev")
    t = IcebergLiteTable(path)
    dev = t.read(spark, ref="dev")
    assert dev.columns == ["k", "value"] and dev.count() == 12
    # main's head snapshot predates the rename, but a CURRENT read
    # (no travel selector) uses the table's CURRENT schema — schema
    # DDL commits no snapshot, exactly Iceberg's rule
    main = t.read(spark)
    assert main.columns == ["k", "value"] and main.count() == 10
