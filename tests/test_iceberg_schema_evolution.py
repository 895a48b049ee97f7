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


# -- equality deletes survive renames (field-id resolution) ---------------


def test_eq_delete_applies_after_rename(spark, table):
    """An eq-delete written under the OLD column name must keep
    deleting after a rename: the delete records field IDS, and the
    scan re-resolves them to the read-time names (Iceberg
    `equality_ids` semantics)."""
    from iceberg_query_engine_spark.sources.iceberg_lite import (
        write_equality_deletes,
    )

    path, _df = table
    keys = spark.createDataFrame([(2,), (5,)], "k bigint")
    write_equality_deletes(spark, path, keys, ["k"])
    rename_column(path, "k", "pk")
    out = IcebergLiteTable(path).read(spark)
    assert out.columns == ["pk", "v"]
    assert sorted(r.pk for r in out.collect()) == [0, 1, 3, 4, 6, 7, 8, 9]


def test_eq_delete_rename_respects_sequence_rule(spark, table):
    """Appends AFTER the delete are untouched even when a rename sits
    between delete-write and the append (data-seq < delete-seq rule
    composes with id resolution)."""
    from iceberg_query_engine_spark.sources.iceberg_lite import (
        write_equality_deletes,
    )

    path, _df = table
    keys = spark.createDataFrame([(3,)], "k bigint")
    write_equality_deletes(spark, path, keys, ["k"])
    rename_column(path, "k", "pk")
    late = spark.createDataFrame([(3, 99.0)], "pk bigint, v double")
    write_snapshot(late, path)
    out = IcebergLiteTable(path).read(spark)
    rows = sorted((r.pk, r.v) for r in out.collect())
    assert (3, 6.0) not in rows  # pre-delete row gone
    assert (3, 99.0) in rows  # post-delete append survives


def test_drop_column_refused_while_eq_delete_references_it(spark, table):
    """Dropping a column referenced by a live equality delete is
    refused (the delete would be unapplicable); compaction folds the
    delete in, after which the drop succeeds."""
    from iceberg_query_engine_spark.sources.iceberg_lite import (
        compact,
        write_equality_deletes,
    )

    path, _df = table
    keys = spark.createDataFrame([(1,)], "k bigint")
    write_equality_deletes(spark, path, keys, ["k"])
    with pytest.raises(ValueError, match="equality delete"):
        drop_column(path, "k")
    compact(spark, path)
    drop_column(path, "k")
    out = IcebergLiteTable(path).read(spark)
    assert out.columns == ["v"]
    assert out.count() == 9  # the delete was materialized by compact


def test_eq_delete_write_rejects_unknown_column(spark, table):
    from iceberg_query_engine_spark.sources.iceberg_lite import (
        write_equality_deletes,
    )

    path, _df = table
    keys = spark.createDataFrame([(1,)], "nope bigint")
    with pytest.raises(ValueError, match="not in current schema"):
        write_equality_deletes(spark, path, keys, ["nope"])
