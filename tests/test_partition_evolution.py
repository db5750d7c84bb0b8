"""Iceberg partition evolution (spec "Partition Evolution") on the
external plane.

Two halves, both metadata-only (no data moves):
- MULTI-SPEC correctness: every commit relists EXISTING entries whose
  manifests were written under an OLDER spec in per-spec manifests —
  a manifest has exactly one partition spec; mixing tuple layouts
  corrupts real readers. Pinned by decoding the manifest list and each
  manifest's tuple keys after appends and cross-spec DML.
- `update_spec(partition_by=)`: REPLACE the default spec with one built
  from the CTAS spellings (None -> unpartitioned); new writes group
  under it, old files keep theirs; (source, transform) pairs any spec
  already names keep their field-id. LakeSQL speaks Spark-Iceberg's
  `ALTER TABLE iceberg.`/p` ADD|DROP PARTITION FIELD <spelling>`.
"""

from __future__ import annotations

import pytest

from lakehouses_spark.functions.avro_py import read_ocf_bytes
from lakehouses_spark.tables.catalog import LakeCatalog
from lakehouses_spark.tables.iceberg_meta import (
    IcebergMetadataReader,
    write_iceberg_table,
)
from lakehouses_spark.tables.sql import LakeSQL


def _mk(spark, path):
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "k long, p int, v double")
    return write_iceberg_table(spark, df, path, partition_by=["p"])


def _manifest_shapes(reader):
    """[(spec_id, added, existing, deleted, tuple-key-sets)] of the
    current snapshot's DATA manifests."""
    snap = reader._snapshot()
    _, ml = read_ocf_bytes(
        reader._local(snap["manifest-list"]).read_bytes())
    out = []
    for m in ml:
        if int(m.get("content", 0) or 0) != 0:
            continue
        _, ents = read_ocf_bytes(
            reader._local(m["manifest_path"]).read_bytes())
        keys = {tuple(sorted((e["data_file"].get("partition") or {})))
                for e in ents}
        out.append((m["partition_spec_id"], m["added_files_count"],
                    m["existing_files_count"], m["deleted_files_count"],
                    keys))
    return sorted(out)


def test_update_spec_and_multi_spec_commits(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    res = r.update_spec(["bucket(4, k)"])
    assert res["changed"] and res["spec_id"] == 1
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    assert r2.meta["default-spec-id"] == 1
    r2.append(spark.createDataFrame(
        [(100, 9, 1.0), (101, 9, 2.0)], "k long, p int, v double"))
    r3 = IcebergMetadataReader(spark, tmp_path / "t")
    assert r3.to_df().count() == 32
    shapes = _manifest_shapes(r3)
    # old files relist under a spec-0 manifest (p tuples); new files
    # add under the spec-1 manifest (k_bucket tuples)
    assert [(s[0], s[4]) for s in shapes] == [
        (0, {("p",)}), (1, {("k_bucket",)})]
    assert shapes[0][2] > 0 and shapes[1][1] >= 1  # relisted / added


def test_cross_spec_dml_exact_and_spec_kept(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    r.update_spec(["bucket(4, k)"])
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    r2.append(spark.createDataFrame(
        [(100, 9, 1.0)], "k long, p int, v double"))
    r3 = IcebergMetadataReader(spark, tmp_path / "t")
    # the predicate hits rows in BOTH specs' files
    r3.delete("k IN (2, 100)")
    r4 = IcebergMetadataReader(spark, tmp_path / "t")
    assert r4.to_df().count() == 29
    assert r4.to_df().where("k IN (2, 100)").count() == 0
    for sid, _a, _e, _d, keys in _manifest_shapes(r4):
        assert keys <= ({("p",)} if sid == 0 else {("k_bucket",)}), \
            (sid, keys)
    # update across specs too; rewritten rows land under the NEW spec
    r4.update({"v": "v + 1000"}, where="k IN (3, 101)")
    r5 = IcebergMetadataReader(spark, tmp_path / "t")
    assert r5.to_df().where("v >= 1000").count() == 1  # only k=3 lives
    assert r5.to_df().count() == 29


def test_update_spec_field_id_reuse_and_noop(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    r.update_spec(["bucket(4, k)"])
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    # back to identity-p: the (source, transform) pair exists in spec 0
    # and must keep field-id 1000
    res = r2.update_spec(["p"])
    assert res["changed"]
    r3 = IcebergMetadataReader(spark, tmp_path / "t")
    cur = next(s for s in r3.meta["partition-specs"]
               if s["spec-id"] == r3.meta["default-spec-id"])
    assert cur["fields"][0]["field-id"] == 1000
    assert IcebergMetadataReader(spark, tmp_path / "t") \
        .update_spec(["p"])["changed"] is False
    # evolve to unpartitioned; appends still work and read back
    IcebergMetadataReader(spark, tmp_path / "t").update_spec(None)
    r4 = IcebergMetadataReader(spark, tmp_path / "t")
    r4.append(spark.createDataFrame(
        [(200, 9, 1.0)], "k long, p int, v double"))
    assert IcebergMetadataReader(spark, tmp_path / "t") \
        .to_df().count() == 31


def test_unknown_transform_refuses(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    with pytest.raises(Exception, match="not supported|not found"):
        r.update_spec(["zorder(4, k)"])  # parses as identity col miss


def test_lakesql_add_drop_partition_field(spark, tmp_path):
    sql = LakeSQL(LakeCatalog(spark, tmp_path / "wh"))
    _mk(spark, tmp_path / "t")
    p = tmp_path / "t"
    sql.sql(f"ALTER TABLE iceberg.`{p}` ADD PARTITION FIELD bucket(8, k)")
    r = IcebergMetadataReader(spark, p)
    cur = next(s for s in r.meta["partition-specs"]
               if s["spec-id"] == r.meta["default-spec-id"])
    assert [f["transform"] for f in cur["fields"]] == \
        ["identity", "bucket[8]"]
    sql.sql(f"ALTER TABLE iceberg.`{p}` DROP PARTITION FIELD p")
    r2 = IcebergMetadataReader(spark, p)
    cur = next(s for s in r2.meta["partition-specs"]
               if s["spec-id"] == r2.meta["default-spec-id"])
    assert [f["transform"] for f in cur["fields"]] == ["bucket[8]"]
    with pytest.raises(Exception, match="not in the current spec"):
        sql.sql(f"ALTER TABLE iceberg.`{p}` DROP PARTITION FIELD p")
