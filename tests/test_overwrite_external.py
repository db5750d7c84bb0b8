"""INSERT OVERWRITE (full + replaceWhere) and metadata-only ALTER on
the external write plane, both formats.

Semantics pinned here:
- full overwrite is ONE atomic commit/snapshot: contents become exactly
  the written frame, history still time-travels to the old data;
- replaceWhere deletes the predicate's rows (affected files rewrite
  without them, partition-pruned planning) and inserts the frame, with
  the Delta/Spark constraint that every written row satisfies the
  predicate;
- SET/UNSET TBLPROPERTIES is a metadata-only commit the NEXT DML honors
  (e.g. flipping write.delete.mode / enableDeletionVectors);
- ADD CONSTRAINT scans existing rows first — a CHECK the data already
  violates never lands; once added, writes enforce it; DROP removes it.
"""

from __future__ import annotations

import pytest

from lakehouses_spark.tables.catalog import LakeCatalog
from lakehouses_spark.tables.delta_log import (
    DeltaLogReader,
    DeltaProtocolError,
    read_delta,
    write_delta_table,
)
from lakehouses_spark.tables.iceberg_meta import (
    IcebergFormatError,
    IcebergMetadataReader,
    read_iceberg,
    write_iceberg_table,
)
from lakehouses_spark.tables.sql import LakeSQL


def _base(spark):
    return spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "k long, p int, v double")


def _new(spark):
    return spark.createDataFrame(
        [(100 + i, 1, -1.0 * i) for i in range(5)],
        "k long, p int, v double")


def test_delta_replace_where(spark, tmp_path):
    write_delta_table(spark, _base(spark), tmp_path / "t",
                      partition_by=["p"])
    r = DeltaLogReader(spark, tmp_path / "t")
    res = r.overwrite(_new(spark), replace_where="p = 1")
    assert res["removed_files"] >= 1
    r2 = DeltaLogReader(spark, tmp_path / "t")
    assert r2.to_df().where("p = 1").count() == 5
    assert r2.to_df().where("p != 1").count() == 20
    # time travel still sees the pre-overwrite contents
    assert r2.to_df(version=0).count() == 30
    # a written row outside the predicate refuses
    with pytest.raises(DeltaProtocolError, match="replace_where"):
        DeltaLogReader(spark, tmp_path / "t").overwrite(
            spark.createDataFrame([(1, 2, 0.0)],
                                  "k long, p int, v double"),
            replace_where="p = 1")


def test_delta_full_overwrite_atomic(spark, tmp_path):
    write_delta_table(spark, _base(spark), tmp_path / "t")
    r = DeltaLogReader(spark, tmp_path / "t")
    r.overwrite(_new(spark))
    r2 = DeltaLogReader(spark, tmp_path / "t")
    assert r2.to_df().count() == 5
    assert r2.to_df(version=0).count() == 30
    # one commit: version went 0 -> 1
    assert r2.snapshot().version == 1


def test_delta_overwrite_cdf_images(spark, tmp_path):
    write_delta_table(spark, _base(spark), tmp_path / "t")
    DeltaLogReader(spark, tmp_path / "t").set_properties(
        {"delta.enableChangeDataFeed": "true"})
    r = DeltaLogReader(spark, tmp_path / "t")
    r.overwrite(_new(spark), replace_where="p = 1")
    ch = DeltaLogReader(spark, tmp_path / "t").table_changes(2, 2)
    kinds = {x["_change_type"]: x["n"] for x in
             ch.groupBy("_change_type").count()
             .withColumnRenamed("count", "n").collect()}
    assert kinds.get("delete") == 10  # the replaced p=1 rows
    assert kinds.get("insert") == 5


def test_iceberg_replace_where_and_full(spark, tmp_path):
    write_iceberg_table(spark, _base(spark), tmp_path / "t",
                        partition_by=["p"])
    r = IcebergMetadataReader(spark, tmp_path / "t")
    res = r.overwrite(_new(spark), replace_where="p = 1")
    assert res["deleted_files"] >= 1 and res["added_files"] >= 1
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    assert r2.to_df().where("p = 1").count() == 5
    assert r2.to_df().count() == 25
    with pytest.raises(IcebergFormatError, match="replace_where"):
        r2.overwrite(spark.createDataFrame(
            [(1, 2, 0.0)], "k long, p int, v double"),
            replace_where="p = 1")
    r3 = IcebergMetadataReader(spark, tmp_path / "t")
    prev = r3.meta["current-snapshot-id"]
    r3.overwrite(_new(spark))
    r4 = IcebergMetadataReader(spark, tmp_path / "t")
    assert r4.to_df().count() == 5
    # time travel to the pre-overwrite snapshot still works
    assert r4.to_df(snapshot_id=prev).count() == 25


def test_iceberg_set_properties_honored_by_next_dml(spark, tmp_path):
    write_iceberg_table(spark, _base(spark), tmp_path / "t")
    r = IcebergMetadataReader(spark, tmp_path / "t")
    res = r.set_properties({"write.delete.mode": "merge-on-read"})
    assert res["metadata_version"] >= 2
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    dres = r2.delete("k < 5")
    assert dres["rewritten_files"] == 0  # MOR: tombstones, no rewrite
    assert dres["delete_files"] >= 1
    assert IcebergMetadataReader(spark, tmp_path / "t") \
        .to_df().count() == 25
    # unset reverts to copy-on-write
    IcebergMetadataReader(spark, tmp_path / "t").set_properties(
        {"write.delete.mode": None})
    r3 = IcebergMetadataReader(spark, tmp_path / "t")
    dres = r3.delete("k = 7")
    assert dres["rewritten_files"] >= 1


def test_delta_add_constraint_scans_then_enforces(spark, tmp_path):
    write_delta_table(spark, _base(spark), tmp_path / "t")
    r = DeltaLogReader(spark, tmp_path / "t")
    # existing rows violate: refused, nothing committed
    with pytest.raises(DeltaProtocolError, match="existing row"):
        r.add_constraint("vmax", "v < 10")
    assert DeltaLogReader(spark, tmp_path / "t").snapshot().version == 0
    DeltaLogReader(spark, tmp_path / "t").add_constraint("vmax", "v < 100")
    r2 = DeltaLogReader(spark, tmp_path / "t")
    assert r2.snapshot().configuration[
        "delta.constraints.vmax"] == "v < 100"
    with pytest.raises(DeltaProtocolError, match="vmax"):
        r2.append(spark.createDataFrame(
            [(1, 1, 500.0)], "k long, p int, v double"))
    DeltaLogReader(spark, tmp_path / "t").drop_constraint("vmax")
    DeltaLogReader(spark, tmp_path / "t").append(
        spark.createDataFrame([(1, 1, 500.0)],
                              "k long, p int, v double"))
    assert read_delta(spark, tmp_path / "t").count() == 31
    with pytest.raises(DeltaProtocolError, match="does not exist"):
        DeltaLogReader(spark, tmp_path / "t").drop_constraint("vmax")


def test_lakesql_overwrite_and_alter_spellings(spark, tmp_path):
    sql = LakeSQL(LakeCatalog(spark, tmp_path / "wh"))
    _base(spark).createOrReplaceTempView("ow_src")
    p = tmp_path / "t"
    sql.sql(f"CREATE TABLE delta.`{p}` AS SELECT * FROM ow_src")
    # INSERT INTO ... SELECT = append
    sql.sql(f"INSERT INTO delta.`{p}` SELECT * FROM ow_src WHERE k < 3")
    assert read_delta(spark, p).count() == 33
    # replaceWhere
    _new(spark).createOrReplaceTempView("ow_new")
    sql.sql(f"INSERT INTO delta.`{p}` REPLACE WHERE p = 1 "
            "SELECT * FROM ow_new")
    got = read_delta(spark, p)
    assert got.where("p = 1").count() == 5
    # full overwrite
    sql.sql(f"INSERT OVERWRITE delta.`{p}` SELECT * FROM ow_new")
    assert read_delta(spark, p).count() == 5
    # path-target ALTER: properties + constraint round trip
    sql.sql(f"ALTER TABLE delta.`{p}` SET TBLPROPERTIES "
            "('delta.enableChangeDataFeed' = 'true')")
    assert DeltaLogReader(spark, p).snapshot().configuration[
        "delta.enableChangeDataFeed"] == "true"
    sql.sql(f"ALTER TABLE delta.`{p}` ADD CONSTRAINT neg CHECK (v <= 0)")
    with pytest.raises(DeltaProtocolError):
        DeltaLogReader(spark, p).append(
            spark.createDataFrame([(1, 1, 5.0)],
                                  "k long, p int, v double"))
    sql.sql(f"ALTER TABLE delta.`{p}` DROP CONSTRAINT neg")
    sql.sql(f"ALTER TABLE delta.`{p}` UNSET TBLPROPERTIES "
            "('delta.enableChangeDataFeed')")
    assert "delta.enableChangeDataFeed" not in DeltaLogReader(
        spark, p).snapshot().configuration
    # Iceberg spellings
    pi = tmp_path / "ti"
    sql.sql(f"CREATE TABLE iceberg.`{pi}` AS SELECT * FROM ow_src")
    sql.sql(f"INSERT OVERWRITE iceberg.`{pi}` SELECT * FROM ow_new")
    assert read_iceberg(spark, pi).count() == 5
    sql.sql(f"ALTER TABLE iceberg.`{pi}` SET TBLPROPERTIES "
            "('write.delete.mode' = 'merge-on-read')")
    assert IcebergMetadataReader(spark, pi).meta["properties"][
        "write.delete.mode"] == "merge-on-read"


def test_overwrite_respects_generated_identity(spark, tmp_path):
    # the insert shaping is shared with append: overwrite on a
    # generated/identity table computes and allocates
    from tests.test_delta_generated_identity import _foreignize

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, 10 * i, 10 * i + 1) for i in range(1, 6)],
        "id long, a long, g long")
    write_delta_table(spark, df, tmp_path / "t")
    _foreignize(tmp_path / "t", hwm=5)
    r = DeltaLogReader(spark, tmp_path / "t")
    r.overwrite(spark.createDataFrame([(7,), (8,)], "a long"))
    r2 = DeltaLogReader(spark, tmp_path / "t")
    rows = {x.a: (x.id, x.g) for x in r2.to_df().collect()}
    assert set(rows) == {7, 8}
    assert {rows[7][0], rows[8][0]} == {6, 7}  # fresh ids past hwm
    assert rows[7][1] == 8 and rows[8][1] == 9  # generated computed
