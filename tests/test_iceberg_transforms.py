"""Bucket/truncate partition transforms on the external Iceberg plane.

Three layers, mirroring how the spec itself defines the transforms:

1. PUBLISHED TEST VECTORS — the Apache Iceberg spec's Appendix B hash
   vectors pin the murmur3_x86_32 + serialization exactly (any engine
   disagreeing on these buckets rows differently = silent data loss).
2. WRITE AGREEMENT — every manifest partition tuple a CTAS/DML/MERGE
   writes must equal the driver-side py_bucket/py_truncate of the rows
   it holds (the read path and the pruning path share one truth).
3. PRUNING SOUNDNESS — equality/IN literals map through the transform to
   restrict candidate scans (spied via to_df(_paths=)); anything the
   conservative parser can't prove (OR, casts, type-mismatched
   literals) must scan MORE, never less, and results stay exact.
"""

from __future__ import annotations

import datetime
import struct

import pytest
from pyspark.sql import types as T

from lakehouses_spark.tables.catalog import LakeCatalog
from lakehouses_spark.tables.iceberg_meta import (
    IcebergFormatError,
    IcebergMetadataReader,
    write_iceberg_table,
)
from lakehouses_spark.tables.iceberg_transforms import (
    _mm3_long_batch,
    bucket_col,
    murmur3_x86_32,
    parse_col_op_literal,
    parse_spec_transform,
    py_bucket,
    py_truncate,
    truncate_col,
)
from lakehouses_spark.tables.sql import LakeSQL


# --------------------------------------------------------------------------
# 1. spec Appendix B vectors


def test_murmur3_spec_vectors():
    # published hash values from the Iceberg spec, Appendix B
    assert murmur3_x86_32(struct.pack("<q", 34)) == 2017239379  # int/long
    assert murmur3_x86_32(b"iceberg") == 1210000089             # string
    assert murmur3_x86_32(bytes([0, 1, 2, 3])) == -188683207    # binary
    days = (datetime.date(2017, 11, 16) - datetime.date(1970, 1, 1)).days
    assert murmur3_x86_32(struct.pack("<q", days)) == -653330422  # date
    us = int((datetime.datetime(2017, 11, 16, 22, 31, 8)
              - datetime.datetime(1970, 1, 1)).total_seconds()) * 1_000_000
    assert murmur3_x86_32(struct.pack("<q", us)) == -2047944441  # timestamp


def test_vectorized_long_hash_agrees_with_scalar():
    import numpy as np

    v = np.array([0, 1, -1, 34, 2**62, -(2**62), 17486, 123456789],
                 dtype="int64")
    vec = _mm3_long_batch(v)
    for got, x in zip(vec, v):
        assert int(got) == murmur3_x86_32(struct.pack("<q", int(x))) \
            & 0xFFFFFFFF


def test_py_bucket_and_truncate_semantics():
    assert py_bucket(34, T.LongType(), 16) == \
        (2017239379 & 0x7FFFFFFF) % 16
    assert py_bucket("iceberg", T.StringType(), 16) == \
        (1210000089 & 0x7FFFFFFF) % 16
    assert py_bucket(None, T.LongType(), 16) is None
    # int and long of the same value bucket identically (long promotion)
    assert py_bucket(34, T.IntegerType(), 7) == py_bucket(34, T.LongType(), 7)
    # truncate: floored multiples, incl. negatives; string = code points
    assert py_truncate(17, T.IntegerType(), 10) == 10
    assert py_truncate(-7, T.IntegerType(), 10) == -10
    assert py_truncate(-10, T.LongType(), 10) == -10
    assert py_truncate("abcdef", T.StringType(), 3) == "abc"
    assert py_truncate("ab", T.StringType(), 5) == "ab"


def test_parse_spec_transform():
    assert parse_spec_transform("bucket[16]") == ("bucket", 16)
    assert parse_spec_transform("truncate[4]") == ("truncate", 4)
    assert parse_spec_transform("BUCKET[2]") == ("bucket", 2)
    assert parse_spec_transform("bucket[0]") is None
    assert parse_spec_transform("identity") is None
    assert parse_spec_transform("year") is None


# --------------------------------------------------------------------------
# conservative conjunct parser


def test_parse_col_op_literal():
    assert parse_col_op_literal("id = 34") == ("id", "=", [34])
    assert parse_col_op_literal("34 = id") == ("id", "=", [34])
    assert parse_col_op_literal("`id` == -5") == ("id", "=", [-5])
    assert parse_col_op_literal("name = 'o''brien'") == \
        ("name", "=", ["o'brien"])
    assert parse_col_op_literal("ds = DATE '2021-02-02'") == \
        ("ds", "=", [datetime.date(2021, 2, 2)])
    assert parse_col_op_literal("id IN (1, 2, 3)") == ("id", "in", [1, 2, 3])
    assert parse_col_op_literal("id >= 10") == ("id", ">=", [10])
    # reversed inequality flips
    assert parse_col_op_literal("10 < id") == ("id", ">", [10])
    # anything not provably a plain comparison -> None (no pruning)
    assert parse_col_op_literal("id = 1 OR id = 2") is None
    assert parse_col_op_literal("abs(id) = 1") is None
    assert parse_col_op_literal("id = other_col") is None
    assert parse_col_op_literal("id IS NULL") is None
    assert parse_col_op_literal("cast(id as string) = '1'") is None
    assert parse_col_op_literal("id + 1 = 2") is None


# --------------------------------------------------------------------------
# 2. write agreement + 3. pruning soundness (shared fixture table)


def _mk_table(spark, path, n_bucket=4, trunc_w=3, rows=120):
    df = spark.createDataFrame(
        [(i, f"user{i % 7}",
          datetime.date(2020 + i % 5, 1 + i % 12, 1 + i % 28),
          float(i)) for i in range(rows)],
        "id long, name string, ds date, v double",
    )
    return df, write_iceberg_table(
        spark, df, path,
        partition_by=[f"bucket({n_bucket}, id)", f"truncate({trunc_w}, name)"],
    )


def _tuple_agreement(spark, reader, n_bucket, trunc_w):
    for e in reader._live_data_entries():
        part = e["data_file"]["partition"]
        fp = str(reader._local_data(e["data_file"]["file_path"]).resolve())
        for row in spark.read.parquet(fp).select("id", "name").collect():
            assert part["id_bucket"] == py_bucket(
                row.id, T.LongType(), n_bucket)
            assert part["name_trunc"] == py_truncate(
                row.name, T.StringType(), trunc_w)


def test_ctas_bucket_truncate_tuples_agree(spark, tmp_path):
    df, r = _mk_table(spark, tmp_path / "t")
    assert r.to_df().count() == 120
    spec = r.meta["partition-specs"][0]["fields"]
    assert [(f["name"], f["transform"]) for f in spec] == [
        ("id_bucket", "bucket[4]"), ("name_trunc", "truncate[3]")]
    _tuple_agreement(spark, r, 4, 3)


@pytest.fixture
def spy_paths(monkeypatch):
    """Record the _paths restriction of every to_df call."""
    calls: list[set | None] = []
    orig = IcebergMetadataReader.to_df

    def spy(self, *a, **kw):
        calls.append(kw.get("_paths"))
        return orig(self, *a, **kw)

    monkeypatch.setattr(IcebergMetadataReader, "to_df", spy)
    return calls


def test_bucket_equality_delete_prunes_and_is_exact(
        spark, tmp_path, spy_paths):
    df, r = _mk_table(spark, tmp_path / "t")
    by_fp = {
        str(r._local_data(e["data_file"]["file_path"]).resolve()):
        e["data_file"]["partition"]["id_bucket"]
        for e in r._live_data_entries()
    }
    total = len(by_fp)
    plan = r.delete("id = 34")
    # candidate scan restricted to the one bucket's files
    restricted = [c for c in spy_paths if c is not None]
    assert restricted and all(len(c) < total for c in restricted)
    # every candidate the scan kept belongs to the literal's bucket
    target = py_bucket(34, T.LongType(), 4)
    assert all(by_fp[fp] == target for fp in restricted[0])
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    assert r2.to_df().where("id = 34").count() == 0
    assert r2.to_df().count() == 119
    _tuple_agreement(spark, r2, 4, 3)
    assert plan["rewritten_files"] >= 1


def test_bucket_in_and_mixed_predicate_prune(spark, tmp_path, spy_paths):
    df, r = _mk_table(spark, tmp_path / "t")
    total = len(r._live_data_entries())
    r.update({"v": "v + 1000"}, where="id IN (1, 5) AND v < 50")
    restricted = [c for c in spy_paths if c is not None]
    assert restricted and all(len(c) < total for c in restricted)
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    got = {row.id: row.v for row in r2.to_df()
           .where("id IN (1, 5)").collect()}
    assert got == {1: 1001.0, 5: 1005.0}


def test_truncate_string_equality_prunes(spark, tmp_path, spy_paths):
    df, r = _mk_table(spark, tmp_path / "t", n_bucket=2, trunc_w=5)
    # names are user0..user6 -> truncate(5) = 'user0'..'user6': distinct
    total = len(r._live_data_entries())
    r.delete("name = 'user3'")
    restricted = [c for c in spy_paths if c is not None]
    assert restricted and all(len(c) < total for c in restricted)
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    assert r2.to_df().where("name = 'user3'").count() == 0
    assert r2.to_df().count() == 120 - df.where("name = 'user3'").count()


def test_truncate_int_range_prunes(spark, tmp_path, spy_paths):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, v double")
    r = write_iceberg_table(spark, df, tmp_path / "t",
                            partition_by=["truncate(10, id)"])
    total = len(r._live_data_entries())
    r.delete("id >= 80")
    restricted = [c for c in spy_paths if c is not None]
    assert restricted and all(len(c) < total for c in restricted)
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    assert r2.to_df().count() == 80
    assert r2.to_df().agg({"id": "max"}).collect()[0][0] == 79


def test_or_predicate_never_misprunes(spark, tmp_path):
    # a top-level OR defeats conjunct splitting: no pruning constraint,
    # full scan, exact result (the r12 soundness rule extended to
    # bucket specs)
    df, r = _mk_table(spark, tmp_path / "t")
    r.delete("id = 3 OR v = 50.0")
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    assert r2.to_df().where("id = 3 OR v = 50.0").count() == 0
    assert r2.to_df().count() == 118


def test_type_mismatched_literal_no_wrong_prune(spark, tmp_path):
    # string literal against a long bucket source: parser type-check
    # refuses the constraint; Spark casts and the result is still exact
    df, r = _mk_table(spark, tmp_path / "t")
    r.delete("id = '34'")
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    assert r2.to_df().where("id = 34").count() == 0
    assert r2.to_df().count() == 119


def test_null_partition_key_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(None, "a"), (5, "b"), (25, "c")], "id long, name string")
    r = write_iceberg_table(spark, df, tmp_path / "t",
                            partition_by=["bucket(4, id)"])
    assert {row.name for row in r.to_df().collect()} == {"a", "b", "c"}
    tuples = [e["data_file"]["partition"]["id_bucket"]
              for e in r._live_data_entries()]
    assert None in tuples  # the null-keyed row landed in a null tuple
    # equality pruning never selects the null tuple; the null row survives
    r.delete("id = 5")
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    assert {row.name for row in r2.to_df().collect()} == {"a", "c"}


def test_merge_on_bucketed_table_tuples_agree(spark, tmp_path):
    df, r = _mk_table(spark, tmp_path / "t")
    upd = spark.createDataFrame(
        [(1, "userX", datetime.date(2024, 1, 1), 999.0),
         (1000, "brandnew", datetime.date(2024, 1, 1), 1.0)],
        "id long, name string, ds date, v double")
    plan = r.merge(upd, on="t.id = s.id")
    assert plan["inserted_rows"] == 1
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    assert r2.to_df().count() == 121
    assert r2.to_df().where("id = 1").collect()[0].name == "userX"
    _tuple_agreement(spark, r2, 4, 3)


def test_lakesql_ctas_bucket_spelling(spark, tmp_path):
    sql = LakeSQL(LakeCatalog(spark, tmp_path / "wh"))
    spark.createDataFrame(
        [(i, f"n{i}") for i in range(20)], "id long, name string"
    ).createOrReplaceTempView("bt_src")
    p = tmp_path / "t"
    sql.sql(f"CREATE TABLE iceberg.`{p}` PARTITIONED BY "
            "(bucket(2, id), truncate(1, name)) AS SELECT * FROM bt_src")
    r = IcebergMetadataReader(spark, p)
    assert r.to_df().count() == 20
    assert [f["transform"] for f in r.meta["partition-specs"][0]["fields"]] \
        == ["bucket[2]", "truncate[1]"]


def test_date_bucket_literal_pruning(spark, tmp_path, spy_paths):
    df = spark.createDataFrame(
        [(i, datetime.date(2021, 1 + i % 12, 1 + i % 28))
         for i in range(60)], "id long, ds date")
    r = write_iceberg_table(spark, df, tmp_path / "t",
                            partition_by=["bucket(3, ds)"])
    total = len(r._live_data_entries())
    n_match = df.where("ds = DATE '2021-02-02'").count()
    r.delete("ds = DATE '2021-02-02'")
    restricted = [c for c in spy_paths if c is not None]
    assert restricted and all(len(c) < total for c in restricted)
    r2 = IcebergMetadataReader(spark, tmp_path / "t")
    assert r2.to_df().count() == 60 - n_match


def test_unsupported_sources_refuse(spark, tmp_path):
    df = spark.createDataFrame([(1.5, "x")], "v double, name string")
    with pytest.raises(IcebergFormatError, match="bucket"):
        write_iceberg_table(spark, df, tmp_path / "a",
                            partition_by=["bucket(4, v)"])
    with pytest.raises(IcebergFormatError, match="truncate"):
        write_iceberg_table(spark, df, tmp_path / "b",
                            partition_by=["truncate(2, v)"])
    # zero-width / zero-bucket refused
    with pytest.raises(IcebergFormatError, match="bucket"):
        write_iceberg_table(spark, df, tmp_path / "c",
                            partition_by=["bucket(0, name)"])


def test_spark_side_bucket_col_agrees_with_python(spark):
    import pandas as pd

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i * 7919 - 3000,) for i in range(50)] + [(None,)], "id long")
    got = df.select(
        "id", bucket_col(F.col("id"), T.LongType(), 16).alias("b")
    ).collect()
    for row in got:
        assert row.b == py_bucket(row.id, T.LongType(), 16)
    dfs = spark.createDataFrame(
        [("",), ("iceberg",), ("café",), (None,)], "s string")
    got = dfs.select(
        "s", bucket_col(F.col("s"), T.StringType(), 8).alias("b")
    ).collect()
    for row in got:
        assert row.b == py_bucket(row.s, T.StringType(), 8)


def test_spark_side_truncate_col_agrees_with_python(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(-21,), (-1,), (0,), (9,), (10,), (11,), (None,)], "id int")
    got = df.select(
        "id", truncate_col(F.col("id"), T.IntegerType(), 10).alias("t")
    ).collect()
    for row in got:
        assert row.t == py_truncate(row.id, T.IntegerType(), 10)
