"""Cross-plane AGREEMENT over the shared partitioned-foreign fixtures
(VERDICT r11 #6): the same hand-built hard-layout table — partitioned,
and for Delta also column-mapped — drives the metadata plane
(partitions / snapshot tuples), the DML plane (UPDATE/DELETE), and the
stream plane (tail + changelog), and every view must agree at every
step. New verbs wired into any one plane can't skip the hard layout:
this is where the planes meet."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from tests.foreign_fixtures import mk_foreign_delta, mk_foreign_iceberg


def _drain(spark, fmt, dest, tmp_path, name, **opts):
    if fmt == "delta":
        from lakehouses_spark.tables.delta_stream import (
            DeltaTableDataSource as DS,
        )
        source = "deltatable"
    else:
        from lakehouses_spark.tables.iceberg_stream import (
            IcebergTableDataSource as DS,
        )
        source = "icebergtable"
    spark.dataSource.register(DS)
    out = tmp_path / f"out_{name}"
    reader = spark.readStream.format(source).option("path", str(dest))
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(str(out))


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_delta_planes_agree_on_shared_fixture(spark, tmp_path):
    from lakehouses_spark.tables.delta_log import DeltaLogReader, read_delta

    base = tmp_path / "d"
    mk_foreign_delta(spark, base, cdf=True)
    cols = ["k", "v", "seg"]

    # DML through the partitioned layout
    r = DeltaLogReader(spark, base)
    r.update({"v": "v + 0.5"}, where="seg = 'B'")
    DeltaLogReader(spark, base).delete("seg = 'C'")

    batch = read_delta(spark, base)
    want = _rows(batch, cols)
    assert [k for k, _, _ in want] == [1, 2, 3, 4, 5]

    # metadata plane: add.partitionValues tuples == the batch read's
    # actual per-partition row multiset
    snap = DeltaLogReader(spark, base).snapshot()
    by_part = Counter()
    for a in snap.files.values():
        by_part[(a.get("partitionValues") or {}).get("seg")] += 1
    read_parts = {x.seg: x.n for x in
                  batch.groupBy("seg").agg(F.count("*").alias("n")).collect()}
    assert set(by_part) == set(read_parts)  # same live partitions

    # stream plane: tail == batch; changelog replays to the batch state
    got = _drain(spark, "delta", base, tmp_path, "tail")
    assert _rows(got, cols) == want
    ch = _drain(spark, "delta", base, tmp_path, "cdf",
                readChangeFeed="true", startingVersion="0")
    state = Counter()
    for x in ch.collect():
        key = (x.k, x.v, x.seg)
        t = x["_change_type"]
        if t in ("insert", "update_postimage"):
            state[key] += 1
        elif t in ("delete", "update_preimage"):
            state[key] -= 1
    assert sorted(k for k, n in state.items() if n > 0) == want


def test_delta_column_mapped_planes_agree(spark, tmp_path):
    from lakehouses_spark.tables.delta_log import DeltaLogReader, read_delta

    base = tmp_path / "dm"
    mk_foreign_delta(spark, base, column_mapped=True)
    cols = ["k", "v", "seg"]

    r = DeltaLogReader(spark, base)
    r.update({"v": "v * 2"}, where="seg = 'A'")
    batch = read_delta(spark, base)
    want = _rows(batch, cols)
    assert (1, 20.0, "A") in want and (4, 40.0, "B") in want

    # metadata plane: partitionValues key by PHYSICAL name; the live
    # partition set matches the read
    snap = DeltaLogReader(spark, base).snapshot()
    pv_parts = {(a.get("partitionValues") or {}).get("col-seg")
                for a in snap.files.values()}
    assert pv_parts == {x.seg for x in batch.select("seg").distinct().collect()}

    # stream plane: tail surfaces LOGICAL names with the partition column
    got = _drain(spark, "delta", base, tmp_path, "cm_tail")
    assert sorted(got.columns) == sorted(cols)
    assert _rows(got, cols) == want


def test_iceberg_planes_agree_on_shared_fixture(spark, tmp_path):
    from lakehouses_spark.tables.iceberg_meta import (
        IcebergMetadataReader,
        read_iceberg,
    )

    dest = mk_foreign_iceberg(spark, tmp_path, "ice_agree")
    cols = ["k", "status", "price"]

    r = IcebergMetadataReader(spark, dest)
    r.update({"price": "price + 1"}, where="status = 'A'")
    IcebergMetadataReader(spark, dest).delete("k in (6, 7)")

    batch = read_iceberg(spark, dest)
    want = _rows(batch, cols)
    assert [k for k, _, _ in want] == [1, 2, 3, 4, 5, 8, 9, 10]

    # metadata plane: the partitions() table aggregates the post-DML
    # manifests to exactly the batch read's per-partition counts
    r2 = IcebergMetadataReader(spark, dest)
    parts = {x.partition["status"]: x.record_count
             for x in r2.partitions().collect()}
    read_parts = {x.status: x.n for x in
                  batch.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert parts == read_parts

    # every live manifest tuple stays truthful after DML
    import pyarrow.parquet as pq
    for e in r2._live_data_entries():
        p = (e["data_file"].get("partition") or {}).get("status")
        local = r2._local_data(e["data_file"]["file_path"])
        assert set(pq.read_table(local).column("status").to_pylist()) == {p}

    # stream plane: tail == batch; changelog replays to the batch state
    got = _drain(spark, "iceberg", dest, tmp_path, "i_tail")
    assert _rows(got, cols) == want
    ch = _drain(spark, "iceberg", dest, tmp_path, "i_cdf",
                readChangeFeed="true")
    state = Counter()
    for x in ch.collect():
        key = (x.k, x.status, x.price)
        state[key] += 1 if x["_change_type"] == "INSERT" else -1
    assert sorted(k for k, n in state.items() if n > 0) == want
