"""Streaming FROM an external Delta-protocol table via the `deltatable`
Python Data Source — log-tail offsets over `_delta_log` commit JSONs,
per-file executor partitions, partition-value stamping, column-mapping
renames, CDF mode, ignoreChanges/startingVersion gating."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lakehouses_spark.tables import LakeTable
from lakehouses_spark.tables.delta_log import read_delta
from lakehouses_spark.tables.delta_stream import DeltaTableDataSource

ROWS = [
    {"k": i, "status": "AB"[i % 2], "price": float(10 * i)} for i in range(1, 21)
]


def _sorted_rows(df, cols=None):
    cols = sorted(cols or df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def _drain(spark, dest, tmp_path, name, **opts):
    spark.dataSource.register(DeltaTableDataSource)
    out = tmp_path / f"out_{name}"
    reader = spark.readStream.format("deltatable").option("path", str(dest))
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


def test_stream_exported_appends_and_resume(spark, tmp_path):
    """Append-only arc drains to the exact table state; after the source
    table commits more and is re-exported, the SAME checkpoint resumes and
    picks up only the new versions (offsets are Delta versions)."""
    df = spark.createDataFrame(ROWS[:10], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.append(spark.createDataFrame(ROWS[10:15], "k long, status string, price double"))
    dest = t.export_delta_log(tmp_path / "delta")

    got = _drain(spark, dest, tmp_path, "tail")
    assert _sorted_rows(got) == _sorted_rows(read_delta(spark, dest))

    t.append(spark.createDataFrame(ROWS[15:], "k long, status string, price double"))
    t.export_delta_log(tmp_path / "delta", mode="overwrite")
    got = _drain(spark, dest, tmp_path, "tail")  # same checkpoint
    assert sorted(r.k for r in got.collect()) == list(range(1, 21))


def test_stream_column_mapping_renames(spark, tmp_path):
    """A renamed column exports under column mapping (physical name stays);
    the stream surfaces the LOGICAL name."""
    df = spark.createDataFrame(ROWS[:8], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.alter_rename_column("price", "amount")
    dest = t.export_delta_log(tmp_path / "delta")
    got = _drain(spark, dest, tmp_path, "ren")
    assert "amount" in got.columns and "price" not in got.columns
    assert _sorted_rows(got) == _sorted_rows(t.read())


def test_initial_snapshot_tolerates_dml_history(spark, tmp_path):
    """Delta-source semantics: the INITIAL batch is the CURRENT snapshot,
    so DML anywhere in history streams cleanly from scratch — exact rows,
    no duplicates, no ignoreChanges needed."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("k > 15")  # copy-on-write rewrite IN HISTORY
    t.update({"price": "price * 2"}, where="k <= 3")
    dest = t.export_delta_log(tmp_path / "delta")
    got = _drain(spark, dest, tmp_path, "hist")
    assert _sorted_rows(got) == _sorted_rows(read_delta(spark, dest))


def test_stream_fails_on_rewrite_unless_ignore_changes(spark, tmp_path):
    """POST-START removes break the append-only tail: the resumed stream
    fails fast; ignoreChanges streams the (re-)added files instead. Live
    deletion vectors at START also gate on ignoreChanges (whole-file
    reads would resurrect deleted rows)."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    dest = t.export_delta_log(tmp_path / "delta")
    _drain(spark, dest, tmp_path, "rw")            # checkpoint at head
    t.delete("k > 15")                             # COW remove AFTER start
    t.export_delta_log(tmp_path / "delta", mode="overwrite")
    with pytest.raises(Exception, match="ignoreChanges"):
        _drain(spark, dest, tmp_path, "rw")        # resume hits the remove
    got = _drain(spark, dest, tmp_path, "rw2", ignoreChanges="true")
    # fresh drain + re-added files: final keys are a superset
    assert {r.k for r in got.collect()} >= {r.k for r in t.read().collect()}

    # live DVs at start: fail fast, ignoreChanges reads whole files
    t2 = LakeTable.create(
        spark, tmp_path / "lake2",
        spark.createDataFrame(ROWS, "k long, status string, price double"))
    t2.delete("k > 15", lazy=True)
    dest2 = t2.export_delta_log(tmp_path / "delta2")
    with pytest.raises(Exception, match="deletion vectors"):
        _drain(spark, dest2, tmp_path, "dv")
    got2 = _drain(spark, dest2, tmp_path, "dv2", ignoreChanges="true")
    assert {r.k for r in got2.collect()} >= {r.k for r in t2.read().collect()}


def test_stream_cdf_matches_batch_table_changes(spark, tmp_path):
    """readChangeFeed=true with startingVersion=0 over the exported log
    drains the same change set as the batch LakeTable.table_changes
    replay (Delta's spelling for a full-history CDF stream)."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.set_properties({"delta.enableChangeDataFeed": "true"})
    t.update({"price": "price * 2"}, where="k <= 3")
    t.delete("k > 17")
    dest = t.export_delta_log(tmp_path / "delta")

    got = _drain(spark, dest, tmp_path, "cdf", readChangeFeed="true",
                 startingVersion="0")
    want = t.table_changes(0, t.version)
    cols = ["k", "status", "price", "_change_type", "_commit_version"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_stream_cdf_initial_snapshot_then_changes(spark, tmp_path):
    """ADVICE r9: WITHOUT startingVersion, the CDF stream opens on the
    latest snapshot as derived INSERTs (Delta's streaming CDF default) —
    pre-CDF DML history neither replays as change data nor fails — then
    tails real change data from later commits on the same checkpoint."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.update({"price": "price * 3"}, where="k = 1")  # pre-CDF mutation
    t.delete("k > 18")                               # pre-CDF delete
    t.set_properties({"delta.enableChangeDataFeed": "true"})
    dest = t.export_delta_log(tmp_path / "delta")

    got = _drain(spark, dest, tmp_path, "cdf0", readChangeFeed="true")
    rows = got.collect()
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert sorted(r.k for r in rows) == sorted(
        r.k for r in t.read().collect())
    head = t.version
    assert {r["_commit_version"] for r in rows} == {head}

    # tail: CDF-recorded DML streams as change data after the snapshot
    t.update({"price": "price * 2"}, where="k = 2")
    t.export_delta_log(tmp_path / "delta", mode="overwrite")
    got = _drain(spark, dest, tmp_path, "cdf0",
                 readChangeFeed="true")  # same checkpoint
    new = [r for r in got.collect() if r["_commit_version"] > head]
    assert sorted(r["_change_type"] for r in new) \
        == ["update_postimage", "update_preimage"]
    assert {r.k for r in new} == {2}


def test_starting_version_skips_snapshot(spark, tmp_path):
    df = spark.createDataFrame(ROWS[:5], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.append(spark.createDataFrame(ROWS[5:10], "k long, status string, price double"))
    t.append(spark.createDataFrame(ROWS[10:15], "k long, status string, price double"))
    dest = t.export_delta_log(tmp_path / "delta")
    got = _drain(spark, dest, tmp_path, "sv", startingVersion="2")
    assert sorted(r.k for r in got.collect()) == [r["k"] for r in ROWS[10:15]]


def test_hive_partitioned_external_log_stamps_partition_values(spark, tmp_path):
    """A hand-built hive-partitioned Delta log (partition values live in
    add.partitionValues, NOT in the files): the stream stamps them as
    typed constant columns — the case real external tables hit."""
    dest = tmp_path / "ext"
    (dest / "_delta_log").mkdir(parents=True)
    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "p", "type": "string", "nullable": True, "metadata": {}},
            {"name": "n", "type": "integer", "nullable": True, "metadata": {}},
        ],
    })
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "11111111-2222-3333-4444-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": ["p", "n"],
            "configuration": {},
            "createdTime": 1700000000000,
        }},
    ]
    for part, nval, ids in (("a", 1, [1, 2]), ("b", 2, [3])):
        rel = f"p={part}/n={nval}/part-0.parquet"
        f = dest / rel
        f.parent.mkdir(parents=True, exist_ok=True)
        pq.write_table(pa.table({"id": pa.array(ids, pa.int64())}), f)
        actions.append({"add": {
            "path": rel, "partitionValues": {"p": part, "n": str(nval)},
            "size": f.stat().st_size, "modificationTime": 1700000000000,
            "dataChange": True,
        }})
    with open(dest / "_delta_log" / f"{0:020d}.json", "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")

    got = _drain(spark, dest, tmp_path, "pv")
    rows = sorted((r.id, r.p, r.n) for r in got.collect())
    assert rows == [(1, "a", 1), (2, "a", 1), (3, "b", 2)]
    assert dict(got.dtypes)["n"] == "int"


def test_batch_read_refused_with_pointer(spark, tmp_path):
    df = spark.createDataFrame(ROWS[:4], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    dest = t.export_delta_log(tmp_path / "delta")
    spark.dataSource.register(DeltaTableDataSource)
    with pytest.raises(Exception, match="read_delta"):
        spark.read.format("deltatable").option("path", str(dest)).load().collect()
