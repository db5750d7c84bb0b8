"""Equality-delete write path (Iceberg spec "Equality Delete Files" —
the Flink-upsert shape). The contract:

- `delete(pred, mode="merge-on-read", strategy="equality")` parses the
  predicate as an AND of equality/IN literal comparisons, writes ONE
  equality-delete parquet of the value tuples (physical column names,
  `equality_ids` by field id, footer bounds for manifest pruning), and
  commits it in a DELETE manifest with ZERO data read;
- sequence semantics are spec-exact: rows in files with seq STRICTLY
  below the delete's are gone; a LATER append of the same key survives;
- stacks with position deletes; `rewrite_data_files` materializes both;
- refusals: non-equality predicates, partitioned tables, type-mismatched
  literals, tuple-count cap, equality under copy-on-write.
"""

from __future__ import annotations

import pytest

from lakehouses_spark.tables.iceberg_meta import (
    IcebergFormatError,
    IcebergMetadataReader,
    write_iceberg_table,
)


def _mk(spark, path, rows=100):
    df = spark.createDataFrame(
        [(i, f"c{i % 5}", float(i)) for i in range(rows)],
        "k long, cat string, v double")
    return write_iceberg_table(spark, df, path)


def test_eq_delete_zero_scan_and_exact(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    # spy: NO to_df call may happen during the delete (zero data read)
    calls = []
    orig = IcebergMetadataReader.to_df

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    IcebergMetadataReader.to_df = spy
    try:
        plan = r.delete("k IN (3, 7) AND cat = 'c3'",
                        mode="merge-on-read", strategy="equality")
    finally:
        IcebergMetadataReader.to_df = orig
    assert calls == []
    assert plan["delete_files"] == 1 and plan["equality_rows"] == 2
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    # only (3, c3) matches data; (7, c3) names no row — harmless
    assert r2.to_df().count() == 99
    assert r2.to_df().where("k = 3").count() == 0
    assert r2.to_df().where("k = 7").count() == 1
    ent = r2.equality_delete_entries()[0]
    assert ent["data_file"]["content"] == 2
    assert len(ent["data_file"]["equality_ids"]) == 2


def test_eq_delete_sequence_semantics(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    r.delete("k = 3", mode="merge-on-read", strategy="equality")
    IcebergMetadataReader(spark, tmp_path / "t").append(
        spark.createDataFrame([(3, "cX", -1.0)],
                              "k long, cat string, v double"))
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    # the re-appended key survives: its file's seq is NOT below the
    # delete's (spec: strictly-below binding)
    rows = r2.to_df().where("k = 3").collect()
    assert len(rows) == 1 and rows[0].cat == "cX"


def test_eq_delete_stacks_and_compacts(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    r.delete("k = 3", mode="merge-on-read", strategy="equality")
    IcebergMetadataReader(spark, tmp_path / "t").delete(
        "v = 50.0", mode="merge-on-read")  # position delete on top
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    assert r2.to_df().count() == 98
    res = r2.rewrite_data_files(target_file_size_mb=64)
    assert res["applied_delete_files"] == 2
    r3 = IcebergMetadataReader(spark, tmp_path / "t")
    assert r3.to_df().count() == 98
    assert r3.equality_delete_entries() == []
    assert r3.position_delete_files() == []


def test_eq_delete_refusals(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    with pytest.raises(IcebergFormatError, match="conjunction"):
        r.delete("k > 5", mode="merge-on-read", strategy="equality")
    with pytest.raises(IcebergFormatError, match="conjunction"):
        r.delete("k = 1 OR k = 2", mode="merge-on-read",
                 strategy="equality")
    with pytest.raises(IcebergFormatError, match="type"):
        r.delete("k = 'x'", mode="merge-on-read", strategy="equality")
    with pytest.raises(IcebergFormatError, match="constrained twice"):
        r.delete("k = 1 AND k = 2", mode="merge-on-read",
                 strategy="equality")
    with pytest.raises(IcebergFormatError, match="merge-on-read"):
        r.delete("k = 1", strategy="equality")
    # partitioned tables refuse the strategy
    df = spark.createDataFrame([(1, 2, 3.0)], "k long, p int, v double")
    rp = write_iceberg_table(spark, df, tmp_path / "tp",
                             partition_by=["p"])
    with pytest.raises(IcebergFormatError, match="unpartitioned"):
        rp.delete("k = 1", mode="merge-on-read", strategy="equality")


def test_eq_delete_streams_fail_fast(spark, tmp_path):
    # the tail stream refuses active equality deletes loudly
    # (pre-existing contract for foreign tables; our writes match it)
    from lakehouses_spark.tables.iceberg_stream import (
        IcebergTableDataSource,
    )

    spark.dataSource.register(IcebergTableDataSource)
    r = _mk(spark, tmp_path / "t", rows=10)
    r.delete("k = 1", mode="merge-on-read", strategy="equality")
    q = (spark.readStream.format("icebergtable")
         .option("path", str(tmp_path / "t")).load()
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    with pytest.raises(Exception, match="delete"):
        q.awaitTermination()
