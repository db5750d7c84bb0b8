"""Iceberg sort orders (spec "Sort Orders" / Spark's WRITE ORDERED BY):
declared in the metadata at CTAS and APPLIED — task-local, no shuffle —
to every data write, including DML rewrites, so files stay clustered
and their footer/manifest bounds stay tight. Foreign tables declaring
an order this writer can't evaluate (non-identity transforms) skip the
sort silently: ordering is advisory, never a correctness gate."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from lakehouses_spark.tables.iceberg_meta import (
    IcebergMetadataReader,
    write_iceberg_table,
)


def _file_columns(reader, col):
    for e in reader._live_data_entries():
        fp = reader._local_data(e["data_file"]["file_path"])
        yield pq.read_table(fp).column(col).to_pylist()


def test_ctas_declares_and_applies_sort(spark, tmp_path):
    df = spark.createDataFrame(
        [((i * 37) % 100, i % 4, float(i)) for i in range(400)],
        "k long, p int, v double")
    r = write_iceberg_table(spark, df, tmp_path / "t",
                            partition_by=["p"], sort_by=["k DESC"])
    so = r.meta["sort-orders"]
    assert r.meta["default-sort-order-id"] == 1
    assert so[1]["fields"] == [{
        "transform": "identity", "source-id": 1,
        "direction": "desc", "null-order": "nulls-last"}]
    for ks in _file_columns(r, "k"):
        assert ks == sorted(ks, reverse=True)


def test_dml_rewrites_preserve_sort(spark, tmp_path):
    df = spark.createDataFrame(
        [((i * 37) % 100, float(i)) for i in range(300)],
        "k long, v double")
    r = write_iceberg_table(spark, df, tmp_path / "t", sort_by=["k"])
    r.update({"v": "v + 1"}, where="k < 50")
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    for ks in _file_columns(r2, "k"):
        assert ks == sorted(ks)
    r2.delete("k = 7")
    r3 = IcebergMetadataReader(spark, tmp_path / "t")
    for ks in _file_columns(r3, "k"):
        assert ks == sorted(ks)
    assert r3.to_df().where("k = 7").count() == 0


def test_asc_nulls_first_default_and_append(spark, tmp_path):
    df = spark.createDataFrame(
        [(None, 1.0), (5, 2.0), (2, 3.0)], "k long, v double")
    r = write_iceberg_table(spark, df, tmp_path / "t", sort_by=["k"])
    assert r.meta["sort-orders"][1]["fields"][0]["null-order"] == \
        "nulls-first"
    r.append(spark.createDataFrame(
        [(9, 1.0), (None, 0.0), (1, 2.0)], "k long, v double"))
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    for ks in _file_columns(r2, "k"):
        nn = [k for k in ks if k is not None]
        assert nn == sorted(nn)
        # nulls lead under asc nulls-first: every None precedes every value
        assert all(k is None for k in ks[:ks.count(None)])


def test_foreign_unsupported_sort_skips_silently(spark, tmp_path):
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    r = write_iceberg_table(spark, df, tmp_path / "t")
    # foreign table declaring a bucket-sort: advisory, not evaluable
    import json
    metas = sorted((tmp_path / "t" / "metadata").glob("v*.metadata.json"))
    m = json.loads(metas[-1].read_text())
    m["sort-orders"].append({"order-id": 7, "fields": [{
        "transform": "bucket[4]", "source-id": 1,
        "direction": "asc", "null-order": "nulls-first"}]})
    m["default-sort-order-id"] = 7
    metas[-1].write_text(json.dumps(m))
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    assert r2._sort_cols() == []
    r2.append(spark.createDataFrame([(2, 2.0)], "k long, v double"))
    assert IcebergMetadataReader(spark, tmp_path / "t") \
        .to_df().count() == 2


def test_bad_sort_column_refuses(spark, tmp_path):
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError, match="sort_by"):
        write_iceberg_table(spark, df, tmp_path / "t",
                            sort_by=["nope"])
