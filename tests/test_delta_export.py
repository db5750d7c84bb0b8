"""Delta-protocol `_delta_log` export / read round-trips (VERDICT r5 #1).

The contract under test: a LakeTable exported with `export_delta_log` is a
protocol-conformant Delta table — its log is plain newline-delimited JSON
actions any external client can parse (proven here by a stdlib-only parse +
DuckDB reading the resolved live files directly), history round-trips
version-by-version, and the independent `read_delta` reader reconstructs
every snapshot, including from the parquet checkpoint after JSON cleanup.
Reference: notebooks/01.formatos_ficheros/01.parquet_primer.py:199-222
(reads `_delta_log/…0.json`), :386 (checkpoint parquet).
"""

from __future__ import annotations

import json
from pathlib import Path

import duckdb
import pytest

from pyspark.sql import functions as F

from lakehouses_spark.tables import LakeTable
from lakehouses_spark.tables.delta_log import (
    DeltaExportError,
    DeltaLogReader,
    read_delta,
)

ROWS = [
    {"k": i, "status": "AB"[i % 2], "price": float(10 * i)} for i in range(1, 41)
]


def _mk_table(spark, path) -> LakeTable:
    """create → delete → update → append(schema evolution) = 4 versions."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, path, df)
    t.delete("status = 'A' AND k > 30")
    t.update({"price": "price * 2"}, where="k <= 5")
    extra = spark.createDataFrame(
        [{"k": 100, "status": "C", "price": 1.0, "note": "new"}],
        "k long, status string, price double, note string",
    )
    t.append(extra, merge_schema=True)
    return t


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_export_roundtrip_current_and_history(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    # final snapshot matches
    assert _sorted_rows(read_delta(spark, dest)) == _sorted_rows(t.read())
    # every historical version matches (time travel preserved 1:1)
    for v in range(t.version + 1):
        assert _sorted_rows(r.to_df(version=v)) == _sorted_rows(t.read(version=v)), v
    # history: one Delta commit per LakeTable commit, operations preserved
    hist = r.history()
    assert [h["version"] for h in hist] == list(range(t.version + 1))
    assert hist[0]["operation"] == "CREATE TABLE AS SELECT"
    assert {h["operation"] for h in hist} >= {"DELETE", "UPDATE", "WRITE"}


def test_exported_log_is_plain_json_actions(spark, tmp_path):
    """Protocol shape check with NOTHING but stdlib json: v0 has protocol +
    metaData + adds; schemaString parses as a Spark StructType JSON; stats
    carry numRecords/minValues/maxValues."""
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_delta_log(tmp_path / "delta", checkpoint=False)
    v0 = dest / "_delta_log" / f"{0:020d}.json"
    actions = [json.loads(line) for line in v0.read_text().splitlines()]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "commitInfo"
    assert "protocol" in kinds and "metaData" in kinds and "add" in kinds
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert meta["format"] == {"provider": "parquet", "options": {}}
    schema = json.loads(meta["schemaString"])
    assert schema["type"] == "struct"
    assert [f["name"] for f in schema["fields"]] == ["k", "status", "price"]
    add = next(a["add"] for a in actions if "add" in a)
    assert add["partitionValues"] == {} and add["dataChange"] is True
    stats = json.loads(add["stats"])
    assert stats["numRecords"] > 0
    assert "k" in stats["minValues"] and "k" in stats["maxValues"]
    # DELETE commit carries remove + add (copy-on-write rewrite)
    v1 = [json.loads(l) for l in (dest / "_delta_log" / f"{1:020d}.json").read_text().splitlines()]
    assert any("remove" in a for a in v1) and any("add" in a for a in v1)


def test_external_client_reads_live_files(spark, tmp_path):
    """The 'any client can read it' proof: resolve the live file set by
    replaying the exported JSON log with stdlib code only, then read those
    parquet files DIRECTLY with DuckDB — no Spark, no LakeTable, no jar."""
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_delta_log(tmp_path / "delta", checkpoint=False)
    files: dict[str, dict] = {}
    log = dest / "_delta_log"
    for f in sorted(log.glob("*.json")):
        for line in f.read_text().splitlines():
            a = json.loads(line)
            if "add" in a:
                files[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                files.pop(a["remove"]["path"], None)
    paths = [str(dest / p) for p in sorted(files)]
    got = duckdb.sql(
        f"SELECT k, status, price, note FROM read_parquet({paths!r}, union_by_name=true) ORDER BY k"
    ).fetchall()
    want = [
        (r.k, r.status, r.price, r.note)
        for r in t.read().orderBy("k").collect()
    ]
    assert got == want
    # stats-declared row counts agree with the actual data
    n_stats = sum(json.loads(a["stats"])["numRecords"] for a in files.values())
    assert n_stats == len(want)


def test_checkpoint_parquet_and_json_cleanup(spark, tmp_path):
    """`_last_checkpoint` + classic checkpoint parquet: after DELETING every
    JSON commit at/below the checkpoint, the reader reconstructs the final
    snapshot from the checkpoint alone — Delta's log-truncation contract."""
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_delta_log(tmp_path / "delta", checkpoint=True)
    log = dest / "_delta_log"
    last = json.loads((log / "_last_checkpoint").read_text())
    assert last["version"] == t.version
    ckpt = log / f"{t.version:020d}.checkpoint.parquet"
    assert ckpt.exists()
    want = _sorted_rows(t.read())
    for v in range(t.version + 1):
        (log / f"{v:020d}.json").unlink()
    assert _sorted_rows(read_delta(spark, dest)) == want


def test_export_refuses_unmaterialized_tombstones(spark, tmp_path):
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("k > 35", lazy=True)
    with pytest.raises(DeltaExportError, match="materialize_tombstones"):
        t.export_delta_log(tmp_path / "delta")
    t.materialize_tombstones()
    with pytest.raises(DeltaExportError, match="allow_tombstone_history"):
        t.export_delta_log(tmp_path / "delta")
    dest = t.export_delta_log(tmp_path / "delta", allow_tombstone_history=True)
    assert _sorted_rows(read_delta(spark, dest)) == _sorted_rows(t.read())


def test_column_mapping_and_constraints_roundtrip(spark, tmp_path):
    """Rename → column mapping mode=name with physicalName metadata and
    protocol (2, 5); CHECK constraint → delta.constraints.* configuration.
    The reader resolves physical names back to logical ones."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.alter_rename_column("price", "amount")
    t.add_constraint("amount_nonneg", "amount >= 0")
    t.append(
        spark.createDataFrame([{"k": 200, "status": "Z", "amount": 5.0}],
                              "k long, status string, amount double")
    )
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    snap = r.snapshot()
    assert snap.protocol == {"minReaderVersion": 2, "minWriterVersion": 5}
    conf = snap.configuration
    assert conf["delta.columnMapping.mode"] == "name"
    assert conf["delta.constraints.amount_nonneg"] == "amount >= 0"
    amount = next(f for f in snap.schema.fields if f.name == "amount")
    assert amount.metadata["delta.columnMapping.physicalName"] == "price"
    assert _sorted_rows(r.to_df()) == _sorted_rows(t.read())
    # pre-rename snapshot still reads under the old logical name
    assert "price" in r.to_df(version=0).columns


def test_idempotent_append_exports_txn_action(spark, tmp_path):
    df = spark.createDataFrame(ROWS[:5], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.append_idempotent(df, app_id="pipe.a", txn_version=7)
    dest = t.export_delta_log(tmp_path / "delta")
    snap = DeltaLogReader(spark, dest).snapshot()
    assert snap.txns == {"pipe.a": 7}


def test_convert_from_delta_adopts_in_place(spark, tmp_path):
    """export → convert_from_delta on the exported dir = a working LakeTable
    over the SAME parquet files (no rewrite): rows, schema, column mapping,
    constraints, and stats-driven planning all intact."""
    t = _mk_table(spark, tmp_path / "lake")
    t.add_constraint("k_pos", "k > 0")
    t.alter_rename_column("price", "amount")
    dest = t.export_delta_log(tmp_path / "delta")
    t2 = LakeTable.convert_from_delta(spark, dest)
    assert _sorted_rows(t2.read()) == _sorted_rows(t.read())
    assert t2.state().constraints == {"k_pos": "k > 0"}
    assert t2.state().column_mapping.get("amount") == "price"
    # adopted table keeps working as a LakeTable (constraint enforced)
    from lakehouses_spark.tables.table import ConstraintViolationError

    with pytest.raises(ConstraintViolationError):
        t2.insert_values([{"k": -1, "status": "X", "amount": 0.0, "note": None}])
    t2.insert_values([{"k": 999, "status": "X", "amount": 0.0, "note": None}])
    assert t2.read().where("k = 999").count() == 1


def test_partitioned_delta_reader(spark, tmp_path):
    """read_delta on a hive-partitioned Delta table written by ANOTHER
    writer (hand-built log, partition values only in add.partitionValues —
    never in the files): values come back typed and positioned."""
    base = tmp_path / "ext_delta"
    (base / "_delta_log").mkdir(parents=True)
    for part, ks in (("2024-01-01", [1, 2]), ("2024-01-02", [3])):
        pdir = base / f"dt={part}"
        pdir.mkdir()
        spark.createDataFrame([(k, k * 1.5) for k in ks], "k long, v double") \
            .coalesce(1).write.mode("overwrite").parquet(str(pdir / "out"))
        # re-home the part file like a real writer lays it out
        pf = next((pdir / "out").rglob("part-*.parquet"))
        pf.rename(pdir / f"part-{part}.parquet")
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            {"name": "dt", "type": "date", "nullable": True, "metadata": {}},
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": ["dt"],
            "configuration": {}, "createdTime": 0}},
        {"add": {"path": "dt=2024-01-01/part-2024-01-01.parquet",
                 "partitionValues": {"dt": "2024-01-01"}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "dt=2024-01-02/part-2024-01-02.parquet",
                 "partitionValues": {"dt": "2024-01-02"}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(base / "_delta_log" / f"{0:020d}.json", "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    df = read_delta(spark, base)
    assert df.columns == ["k", "v", "dt"]
    assert df.schema["dt"].dataType.typeName() == "date"
    rows = sorted((r.k, r.v, str(r.dt)) for r in df.collect())
    assert rows == [(1, 1.5, "2024-01-01"), (2, 3.0, "2024-01-01"),
                    (3, 4.5, "2024-01-02")]
    # partitioned tables refuse in-place LakeTable adoption with guidance
    with pytest.raises(ValueError, match="hive-partitioned"):
        LakeTable.convert_from_delta(spark, base)


def test_reader_rejects_unsupported_features(spark, tmp_path):
    base = tmp_path / "dv_delta"
    (base / "_delta_log").mkdir(parents=True)
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}}]}
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "x", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema), "partitionColumns": [],
                      "configuration": {}, "createdTime": 0}},
    ]
    with open(base / "_delta_log" / f"{0:020d}.json", "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    from lakehouses_spark.tables.delta_log import DeltaProtocolError

    with pytest.raises(DeltaProtocolError, match="deletionVectors"):
        read_delta(spark, base)


def test_max_column_id_monotonic_after_drop(spark, tmp_path):
    """PROTOCOL.md: delta.columnMapping.maxColumnId is the max id EVER
    assigned — dropping the highest-id column must not lower it (it guards
    physical-name/id reuse by later writers)."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    # rename turns mapping on; add then drop a 4th column so the max EVER
    # assigned id (4) exceeds the max among survivors (3)
    t.alter_rename_column("price", "amount")
    t.alter_add_column("note", "string")
    t.alter_drop_column("note")
    dest = t.export_delta_log(tmp_path / "delta")
    snap = DeltaLogReader(spark, dest).snapshot()
    assert int(snap.configuration["delta.columnMapping.maxColumnId"]) == 4
    ids = [
        f.metadata["delta.columnMapping.id"] for f in snap.schema.fields
    ]
    assert sorted(ids) == [1, 2, 3]
