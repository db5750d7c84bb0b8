"""Dual-format (UniForm-shape) export: one copy of the data files with a
Delta `_delta_log/` AND an Iceberg `metadata/` layer over them, so a Delta
client and an Iceberg client read the very same parquet bytes.

Contract pins: identical current reads through both independent readers,
version-for-snapshot time-travel alignment, row-level deletes agreeing
across formats (deletion vectors vs position-delete files over the SAME
files), and exactly one physical copy of every data file.
"""

from __future__ import annotations

import pytest

from lakehouses_spark.tables import LakeTable
from lakehouses_spark.tables.delta_log import DeltaLogReader, read_delta
from lakehouses_spark.tables.iceberg_meta import (
    IcebergMetadataReader,
    read_iceberg,
)

ROWS = [
    {"k": i, "status": "AB"[i % 2], "price": float(10 * i)} for i in range(1, 41)
]


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_uniform_dual_read_and_time_travel(spark, tmp_path):
    """Both readers see identical current state, and Delta version v maps
    1:1 to the v-th Iceberg snapshot (every commit here is data-changing)."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("status = 'A' AND k > 30")
    t.update({"price": "price * 2"}, where="k <= 5")
    dest = t.export_uniform(tmp_path / "uni")

    assert (dest / "_delta_log").is_dir() and (dest / "metadata").is_dir()
    want = _sorted_rows(t.read())
    assert _sorted_rows(read_delta(spark, dest)) == want
    assert _sorted_rows(read_iceberg(spark, dest)) == want

    dr = DeltaLogReader(spark, dest)
    ir = IcebergMetadataReader(spark, dest)
    snaps = [s["snapshot-id"] for s in ir.meta["snapshots"]]
    assert len(snaps) == t.version + 1
    for v in range(t.version + 1):
        assert _sorted_rows(dr.to_df(v)) == \
            _sorted_rows(ir.to_df(snapshot_id=snaps[v]))


def test_uniform_single_data_copy(spark, tmp_path):
    """The two metadata layers plan the SAME physical files — no second
    copy of any data file exists under dest."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.append(spark.createDataFrame(
        [{"k": 100 + i, "status": "C", "price": 1.0} for i in range(5)],
        "k long, status string, price double"))
    dest = t.export_uniform(tmp_path / "uni")

    dr = DeltaLogReader(spark, dest)
    delta_files = {
        (dest / p).resolve() for p in dr.snapshot().files
    }
    ir = IcebergMetadataReader(spark, dest)
    ice_files = {
        ir._local_data(f["file_path"]).resolve() for f in ir.live_files()
    }
    assert delta_files == ice_files
    # every parquet under dest outside the metadata layers is planned by both
    loose = {
        p.resolve() for p in dest.rglob("*.parquet")
        if "_delta_log" not in p.parts and "metadata" not in p.parts
    }
    assert loose == delta_files


def test_uniform_row_level_deletes_agree(spark, tmp_path):
    """A merge-on-read tombstone surfaces as a native DV on the Delta side
    and native position-delete files on the Iceberg side — over the same
    data files — and both readers drop the same rows."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("k > 30", lazy=True)
    dest = t.export_uniform(tmp_path / "uni")

    dr = DeltaLogReader(spark, dest)
    assert any(a.get("deletionVector") for a in dr.snapshot().files.values())
    ir = IcebergMetadataReader(spark, dest)
    assert ir.position_delete_files()
    want = _sorted_rows(t.read())
    assert max(r[0] for r in want) <= 30
    assert _sorted_rows(read_delta(spark, dest)) == want
    assert _sorted_rows(read_iceberg(spark, dest)) == want


def test_uniform_mode_error_and_overwrite(spark, tmp_path):
    df = spark.createDataFrame(ROWS[:10], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    dest = t.export_uniform(tmp_path / "uni")
    with pytest.raises(FileExistsError):
        t.export_uniform(tmp_path / "uni")
    t.append(spark.createDataFrame(
        [{"k": 99, "status": "Z", "price": 9.9}],
        "k long, status string, price double"))
    dest = t.export_uniform(tmp_path / "uni", mode="overwrite")
    assert _sorted_rows(read_delta(spark, dest)) == \
        _sorted_rows(read_iceberg(spark, dest)) == _sorted_rows(t.read())
