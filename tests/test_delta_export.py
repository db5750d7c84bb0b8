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
    DeltaProtocolError,
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


def _split_checkpoint_multipart(spark, log, version: int, n_parts: int,
                                drop_part: int | None = None):
    """Turn the single-file checkpoint at `version` into a classic
    multi-part set (`<v>.checkpoint.<part>.<of>.parquet`) by round-robining
    its rows over n_parts, optionally withholding one part."""
    import pyarrow.parquet as pq

    ckpt = log / f"{version:020d}.checkpoint.parquet"
    tbl = pq.read_table(ckpt)
    for k in range(1, n_parts + 1):
        if k == drop_part:
            continue
        idx = [i for i in range(tbl.num_rows) if i % n_parts == k - 1]
        pq.write_table(
            tbl.take(idx),
            log / f"{version:020d}.checkpoint.{k:010d}.{n_parts:010d}.parquet",
        )
    ckpt.unlink()
    (log / "_last_checkpoint").write_text(
        json.dumps({"version": version, "size": tbl.num_rows,
                    "parts": n_parts})
    )


def test_multipart_checkpoint_reads(spark, tmp_path):
    """Classic multi-part checkpoints (`<v>.checkpoint.<k>.<n>.parquet`,
    delta PROTOCOL.md "Checkpoints"): with every JSON commit at/below the
    checkpoint deleted, all parts reconcile as ONE scan and a JSON tail
    still replays on top."""
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_delta_log(tmp_path / "delta", checkpoint=True)
    log = dest / "_delta_log"
    want = _sorted_rows(read_delta(spark, dest))
    cv = t.version
    _split_checkpoint_multipart(spark, log, cv, 3)
    for v in range(cv + 1):
        (log / f"{v:020d}.json").unlink()
    assert _sorted_rows(read_delta(spark, dest)) == want


def test_exporter_writes_multipart_checkpoint_past_threshold(spark, tmp_path, monkeypatch):
    """The export writer emits a classic multi-part set when the action
    count exceeds CHECKPOINT_PART_ACTIONS (like real Delta writers) — and
    our own reader reconstructs from it after JSON cleanup."""
    import lakehouses_spark.tables.delta_log as dl

    monkeypatch.setattr(dl, "CHECKPOINT_PART_ACTIONS", 16)
    t = _mk_table(spark, tmp_path / "lake")
    # explicit file count: the split must not depend on the harness's
    # default parallelism producing enough part files on its own
    t.append(
        spark.createDataFrame(
            [{"k": 1000 + i, "status": "Q", "price": 1.0 * i}
             for i in range(20)],
            "k long, status string, price double",
        ).repartition(20)
    )
    assert len(t.state().files) > 16
    dest = t.export_delta_log(tmp_path / "delta", checkpoint=True)
    log = dest / "_delta_log"
    parts = sorted(log.glob("*.checkpoint.*.*.parquet"))
    assert len(parts) >= 2
    assert not (log / f"{t.version:020d}.checkpoint.parquet").exists()
    assert json.loads((log / "_last_checkpoint").read_text())["parts"] == len(parts)
    want = _sorted_rows(t.read())
    for v in range(t.version + 1):
        (log / f"{v:020d}.json").unlink()
    assert _sorted_rows(read_delta(spark, dest)) == want


def test_multipart_checkpoint_missing_part_fails_loudly(spark, tmp_path):
    """An incomplete part set must never replay (each part holds a disjoint
    slice of the adds — a partial read silently drops live files)."""
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_delta_log(tmp_path / "delta", checkpoint=True)
    log = dest / "_delta_log"
    cv = t.version
    _split_checkpoint_multipart(spark, log, cv, 3, drop_part=2)
    for v in range(cv + 1):
        (log / f"{v:020d}.json").unlink()
    with pytest.raises(DeltaProtocolError, match="incomplete"):
        read_delta(spark, dest)


def test_tombstones_export_as_native_deletion_vectors(spark, tmp_path):
    """r8 (mirror of the Iceberg position-delete export): a LakeTable with
    ACTIVE merge-on-read tombstones exports WITHOUT materializing — each
    tombstone commit re-adds affected files with an add.deletionVector
    descriptor (protocol 3/7 + deletionVectors feature). Snapshots at every
    version round-trip; stacked tombstones union their bitmaps; rows
    appended after a tombstone are not filtered by it."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("k > 35", lazy=True)                       # tombstone 1
    t.append(spark.createDataFrame(
        [{"k": 99, "status": "Z", "price": 1.0}],
        "k long, status string, price double"))
    t.delete("status = 'B' AND k < 6", lazy=True)       # tombstone 2 (stacks)
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    # every historical version matches the LakeTable's own time travel
    for v in range(t.version + 1):
        assert _sorted_rows(r.to_df(v)) == _sorted_rows(t.read(version=v))
    # k=99 was appended AFTER tombstone 1 (k > 35) and must survive
    assert any(row.k == 99 for row in r.to_df().collect())
    snap = r.snapshot()
    assert snap.protocol["minReaderVersion"] == 3
    assert "deletionVectors" in snap.protocol["readerFeatures"]
    dv_adds = [a for a in snap.files.values() if a.get("deletionVector")]
    assert dv_adds, "tombstoned files must carry deletionVector descriptors"
    # checkpoint carries the DVs: read from the checkpoint alone
    log = dest / "_delta_log"
    for v in range(t.version + 1):
        (log / f"{v:020d}.json").unlink()
    assert _sorted_rows(read_delta(spark, dest)) == _sorted_rows(t.read())


def test_dv_export_external_client_proof(spark, tmp_path):
    """DuckDB (external client) reconstructs the tombstoned table from the
    exported log alone: live files read raw + the DV descriptors decoded by
    the standalone dv.py parser → file_row_number anti-join."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("k > 30", lazy=True)
    dest = t.export_delta_log(tmp_path / "delta")
    snap = DeltaLogReader(spark, dest).snapshot()
    files, deleted = [], []
    for rel, a in snap.files.items():
        ap = str((dest / rel).resolve())
        files.append(ap)
        for idx in dvmod.read_descriptor(a["deletionVector"], dest) \
                if a.get("deletionVector") else []:
            deleted.append((ap, idx))
    con = duckdb.connect()
    con.execute("CREATE TABLE dels (fp VARCHAR, rn BIGINT)")
    con.executemany("INSERT INTO dels VALUES (?, ?)", deleted or [("", -1)])
    got = con.execute(
        """
        SELECT count(*), sum(k) FROM (
          SELECT *, filename AS fp, file_row_number AS rn
          FROM read_parquet($files, filename=true, file_row_number=true)
        ) d WHERE NOT EXISTS (
          SELECT 1 FROM dels WHERE dels.fp = d.fp AND dels.rn = d.rn)
        """,
        {"files": files},
    ).fetchone()
    want = t.read().agg(
        F.count(F.lit(1)).alias("n"), F.sum("k").alias("s")).collect()[0]
    assert got == (want["n"], want["s"])
    assert deleted, "tombstone must have produced DV-deleted rows"


def test_dv_descriptors_survive_multipart_checkpoint(spark, tmp_path, monkeypatch):
    """Interaction pin: deletionVector descriptors round-trip through a
    MULTI-PART checkpoint (checkpoint schema carries the DV struct in every
    part; reconstruction after JSON cleanup applies the deletes)."""
    import lakehouses_spark.tables.delta_log as dl

    monkeypatch.setattr(dl, "CHECKPOINT_PART_ACTIONS", 8)
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("k > 30", lazy=True)
    dest = t.export_delta_log(tmp_path / "delta")
    log = dest / "_delta_log"
    assert len(list(log.glob("*.checkpoint.*.*.parquet"))) >= 2
    want = _sorted_rows(t.read())
    for v in range(t.version + 1):
        (log / f"{v:020d}.json").unlink()
    assert _sorted_rows(read_delta(spark, dest)) == want


def test_tombstone_then_materialize_export(spark, tmp_path):
    """After materialize_tombstones() the DV re-adds drop out (files are
    rewritten); the export still replays the tombstone version exactly."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("k > 35", lazy=True)
    t.materialize_tombstones()
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    for v in range(t.version + 1):
        assert _sorted_rows(r.to_df(v)) == _sorted_rows(t.read(version=v))
    assert not [a for a in r.snapshot().files.values()
                if a.get("deletionVector")]


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
    base = tmp_path / "v2ckpt_delta"
    (base / "_delta_log").mkdir(parents=True)
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}}]}
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["someFutureFeature"]}},
        {"metaData": {"id": "x", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema), "partitionColumns": [],
                      "configuration": {}, "createdTime": 0}},
    ]
    with open(base / "_delta_log" / f"{0:020d}.json", "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    from lakehouses_spark.tables.delta_log import DeltaProtocolError

    with pytest.raises(DeltaProtocolError, match="someFutureFeature"):
        read_delta(spark, base)
    # deletionVectors / v2Checkpoint are no longer rejected features
    actions[0] = {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                               "readerFeatures": ["deletionVectors",
                                                  "v2Checkpoint"]}}
    with open(base / "_delta_log" / f"{0:020d}.json", "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    assert read_delta(spark, base).count() == 0


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


# --------------------------------------------------------------------------- #
# deletion vectors (VERDICT r6 #4) — fixture writer lives HERE, test-only
# --------------------------------------------------------------------------- #
import struct
import uuid as _uuid
import zlib
from collections import defaultdict

from lakehouses_spark.tables import dv as dvmod


def _ser_roaring32(vals: list[int], run_container: bool = False) -> bytes:
    """Test-side 32-bit RoaringBitmap serializer (RoaringFormatSpec portable
    layout) — array/bitmap containers by cardinality, or all-run when asked."""
    containers: dict[int, list[int]] = defaultdict(list)
    for v in sorted(vals):
        containers[v >> 16].append(v & 0xFFFF)
    keys = sorted(containers)
    size = len(keys)
    if run_container:
        cookie = dvmod.SERIAL_COOKIE | ((size - 1) << 16)
        out = struct.pack("<i", cookie)
        flags = bytearray((size + 7) // 8)
        for i in range(size):
            flags[i // 8] |= 1 << (i % 8)
        out += bytes(flags)
        out += b"".join(
            struct.pack("<HH", k, len(containers[k]) - 1) for k in keys
        )
        bodies = []
        for k in keys:
            c = containers[k]
            runs = []
            start = prev = c[0]
            for v in c[1:]:
                if v == prev + 1:
                    prev = v
                else:
                    runs.append((start, prev - start))
                    start = prev = v
            runs.append((start, prev - start))
            bodies.append(
                struct.pack("<H", len(runs))
                + b"".join(struct.pack("<HH", s, l) for s, l in runs)
            )
        if size >= dvmod.NO_OFFSET_THRESHOLD:
            base = len(out) + 4 * size
            offs, cur = [], base
            for b in bodies:
                offs.append(cur)
                cur += len(b)
            out += struct.pack(f"<{size}i", *offs)
        return out + b"".join(bodies)
    out = struct.pack("<ii", dvmod.SERIAL_COOKIE_NO_RUNCONTAINER, size)
    out += b"".join(struct.pack("<HH", k, len(containers[k]) - 1) for k in keys)
    bodies = []
    for k in keys:
        c = containers[k]
        if len(c) > 4096:
            words = [0] * 1024
            for v in c:
                words[v >> 6] |= 1 << (v & 63)
            bodies.append(struct.pack("<1024Q", *words))
        else:
            bodies.append(struct.pack(f"<{len(c)}H", *c))
    base = len(out) + 4 * size
    offs, cur = [], base
    for b in bodies:
        offs.append(cur)
        cur += len(b)
    out += struct.pack(f"<{size}i", *offs)
    return out + b"".join(bodies)


def _ser_dv_payload(values: list[int], run_container: bool = False) -> bytes:
    buckets: dict[int, list[int]] = defaultdict(list)
    for v in sorted(values):
        buckets[v >> 32].append(v & 0xFFFFFFFF)
    n = max(buckets) + 1 if buckets else 0
    out = struct.pack("<i", dvmod.MAGIC) + struct.pack("<q", n)
    for hi in range(n):
        out += _ser_roaring32(buckets.get(hi, []), run_container=run_container)
    return out


def _write_dv_file(path, payload: bytes) -> int:
    """On-disk DV layout: [version=1][dataSize BE][payload][crc32 BE];
    returns the descriptor offset (points at the dataSize word)."""
    blob = bytes([1]) + struct.pack(">i", len(payload)) + payload
    blob += struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF)
    path.write_bytes(blob)
    return 1


def test_dv_roundtrip_parser_units():
    """Parser units: array, bitmap (>4096 dense), run containers, and
    multi-bucket (>2^32 row indexes) all decode back exactly."""
    small = [1, 5, 70000, 70001]
    assert dvmod.decode_dv_payload(_ser_dv_payload(small)) == small
    dense = list(range(5000))  # one bitmap container (card > 4096)
    assert dvmod.decode_dv_payload(_ser_dv_payload(dense)) == dense
    runs = [3, 4, 5, 6, 100, 101, 102]
    assert dvmod.decode_dv_payload(
        _ser_dv_payload(runs, run_container=True)) == runs
    big = [7, (1 << 32) + 9, (3 << 32) + 1]  # empty bucket 2 in between
    assert dvmod.decode_dv_payload(_ser_dv_payload(big)) == big
    # z85 roundtrip
    raw = bytes(range(16))
    assert dvmod.z85_decode(dvmod.z85_encode(raw)) == raw


def _hand_built_dv_table(spark, base, deleted: list[int], descriptor_fn):
    """100-row single-file Delta table whose add carries a DV descriptor
    built by descriptor_fn(payload) -> dict."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    (base / "_delta_log").mkdir(parents=True)
    pq.write_table(
        pa.table({"k": list(range(100)), "v": [float(i) for i in range(100)]}),
        base / "part-000.parquet",
    )
    payload = _ser_dv_payload(deleted)
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {}}]}
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "t", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema), "partitionColumns": [],
                      "configuration": {}, "createdTime": 0}},
        {"add": {"path": "part-000.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": descriptor_fn(payload)}},
    ]
    with open(base / "_delta_log" / f"{0:020d}.json", "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def test_dv_inline_rows_absent(spark, tmp_path):
    deleted = [3, 17, 50, 98]
    base = tmp_path / "dv_inline"
    _hand_built_dv_table(
        spark, base, deleted,
        lambda payload: {"storageType": "i",
                         "pathOrInlineDv": dvmod.z85_encode(
                             payload + b"\0" * (-len(payload) % 4)),
                         "sizeInBytes": len(payload),
                         "cardinality": len(deleted)},
    )
    got = sorted(r.k for r in read_delta(spark, base).collect())
    assert got == sorted(set(range(100)) - set(deleted))


def test_dv_uuid_file_rows_absent(spark, tmp_path):
    """storageType 'u': file named deletion_vector_<uuid>.bin under the table
    root, uuid z85-encoded in the descriptor; CRC verified."""
    deleted = list(range(0, 100, 7))
    base = tmp_path / "dv_file"
    u = _uuid.uuid4()

    def make_desc(payload):
        off = _write_dv_file(base / f"deletion_vector_{u}.bin", payload)
        return {"storageType": "u",
                "pathOrInlineDv": dvmod.z85_encode(u.bytes),
                "offset": off, "sizeInBytes": len(payload),
                "cardinality": len(deleted)}

    _hand_built_dv_table(spark, base, deleted, make_desc)
    df = read_delta(spark, base)
    got = sorted(r.k for r in df.collect())
    assert got == sorted(set(range(100)) - set(deleted))
    # snapshot row accounting nets out the DV cardinality
    snap = DeltaLogReader(spark, base).snapshot()
    assert snap.num_records == -1 or snap.num_records == 100 - len(deleted)
    # in-place adoption MATERIALIZES the DV files (VERDICT r7 #4): the
    # converted table reads exactly the DV-filtered source
    t = LakeTable.convert_from_delta(spark, base)
    assert sorted(r.k for r in t.read().collect()) == got
    # the raw (pre-filter) file is no longer referenced by the lake log
    assert all("part-000.parquet" not in rel for rel in t.state().files)


def test_dv_corrupt_checksum_fails_loudly(spark, tmp_path):
    deleted = [1, 2, 3]
    base = tmp_path / "dv_bad"
    u = _uuid.uuid4()

    def make_desc(payload):
        off = _write_dv_file(base / f"deletion_vector_{u}.bin", payload)
        blob = bytearray((base / f"deletion_vector_{u}.bin").read_bytes())
        blob[-1] ^= 0xFF  # corrupt the CRC
        (base / f"deletion_vector_{u}.bin").write_bytes(bytes(blob))
        return {"storageType": "u",
                "pathOrInlineDv": dvmod.z85_encode(u.bytes),
                "offset": off, "sizeInBytes": len(payload),
                "cardinality": len(deleted)}

    _hand_built_dv_table(spark, base, deleted, make_desc)
    with pytest.raises(dvmod.DeletionVectorError, match="checksum"):
        read_delta(spark, base).collect()


# --------------------------------------------------------------------------- #
# partition fan-out (VERDICT r6 #3): one scan, not one per partition tuple
# --------------------------------------------------------------------------- #
def test_many_partition_read_is_single_scan(spark, tmp_path):
    """A 200-partition external Delta table must plan ONE parquet scan plus a
    broadcast map join — not 200 unioned scans (driver-side analyzer blow-up
    at real partition counts)."""
    import contextlib
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tmp_path / "manyparts"
    (base / "_delta_log").mkdir(parents=True)
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "p", "type": "integer", "nullable": True, "metadata": {}}]}
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "m", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": ["p"],
                      "configuration": {}, "createdTime": 0}},
    ]
    for i in range(200):
        rel = f"p={i}/part-{i:03d}.parquet"
        (base / f"p={i}").mkdir()
        pq.write_table(pa.table({"k": [int(i)]}), base / rel)
        actions.append({"add": {"path": rel, "partitionValues": {"p": str(i)},
                                "size": 1, "modificationTime": 0,
                                "dataChange": True}})
    with open(base / "_delta_log" / f"{0:020d}.json", "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    df = read_delta(spark, base)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Scan parquet") <= 2, plan
    assert "Union" not in plan, plan
    rows = df.collect()
    assert len(rows) == 200
    assert sorted(r.p for r in rows) == list(range(200))
    assert all(r.k == r.p for r in rows)


# --------------------------------------------------------------------------- #
# ------------------- external COW DML (VERDICT r9 #4/#7) ------------------ #
def test_external_delete_update(spark, tmp_path):
    """DeltaLogReader.delete/update: copy-on-write DML committed as
    native Delta JSON against an external `_delta_log` — no LakeTable
    adoption. Affected files rewrite, untouched files stay, history and
    time travel keep working (02.delta_lake_primer.py:213-320 arc)."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.append(spark.createDataFrame(
        [{"k": 100 + i, "status": "Z", "price": 1.0} for i in range(5)],
        "k long, status string, price double"))
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    v0 = r.snapshot().version
    n_files0 = len(r.snapshot().files)

    dry = r.delete("status = 'Z'", dry_run=True)
    assert dry["rewritten_files"] >= 1 and r.snapshot().version == v0

    res = r.delete("status = 'Z'")
    assert res["version"] == v0 + 1
    got = sorted(x.k for x in read_delta(spark, dest).collect())
    assert got == [x["k"] for x in ROWS]
    # untouched files were NOT rewritten
    assert len(set(r.snapshot().files) & set(
        DeltaLogReader(spark, dest).snapshot(v0).files)) \
        == n_files0 - res["rewritten_files"]
    # time travel to the pre-delete version still sees the Z rows
    assert sorted(x.k for x in r.to_df(v0).collect()) \
        == got + [100, 101, 102, 103, 104]

    res = r.update({"price": "price * 2"}, where="k <= 5")
    assert res["version"] == v0 + 2
    rows = {x.k: x.price for x in read_delta(spark, dest).collect()}
    for i in range(1, 41):
        assert rows[i] == (10.0 * i * 2 if i <= 5 else 10.0 * i)
    hist = r.describe_history().collect()
    assert [h.operation for h in hist[:2]] == ["UPDATE", "DELETE"]

    # a no-match predicate commits nothing
    v = r.snapshot().version
    assert r.delete("k > 99999")["rewritten_files"] == 0
    assert r.snapshot().version == v

    with pytest.raises(ValueError, match="SET column"):
        r.update({"nope": "1"})


def test_external_dml_under_column_mapping(spark, tmp_path):
    """COW DML against an exported COLUMN-MAPPED table: predicates and
    SET expressions use LOGICAL names, rewritten data files store
    PHYSICAL names, and the read round-trips — the mapping layer must be
    applied symmetrically on both sides of the rewrite."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.alter_rename_column("price", "amount")  # metadata-only: mapping on
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    assert r.snapshot().configuration.get(
        "delta.columnMapping.mode") in ("name", "id")

    res = r.delete("amount > 350.0")           # logical name in predicate
    assert res["rewritten_files"] >= 1
    got = read_delta(spark, dest)
    assert "amount" in got.columns
    assert sorted(x.k for x in got.collect()) == list(range(1, 36))

    r.update({"amount": "amount + 0.5"}, where="k = 1")
    rows = {x.k: x.amount for x in read_delta(spark, dest).collect()}
    assert rows[1] == 10.5 and rows[2] == 20.0

    src = spark.createDataFrame(
        [{"k": 2, "status": "M", "amount": 99.0},
         {"k": 777, "status": "N", "amount": 7.0}],
        "k long, status string, amount double")
    res = r.merge(src, "t.k = s.k")
    rows = {x.k: (x.status, x.amount)
            for x in read_delta(spark, dest).collect()}
    assert rows[2] == ("M", 99.0) and rows[777] == ("N", 7.0)
    # the rewritten parquet really stores the PHYSICAL column name
    import pyarrow.parquet as pq
    newest = max(
        (p for p in Path(dest).rglob("*.parquet")
         if "_delta_log" not in p.parts and "_change_data" not in p.parts),
        key=lambda p: p.stat().st_mtime,
    )
    names = set(pq.ParquetFile(newest).schema_arrow.names)
    assert "amount" not in names and "k" in names, names


def test_external_dml_refusals(spark, tmp_path):
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.set_properties({"delta.appendOnly": "true"})
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        r.delete("k = 1")


def test_external_dml_records_cdf(spark, tmp_path):
    """With delta.enableChangeDataFeed set, external DELETE/UPDATE write
    cdc change files so `table_changes` spans the foreign-client DML."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.set_properties({"delta.enableChangeDataFeed": "true"})
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    v0 = r.snapshot().version

    r.delete("k > 38")
    r.update({"price": "price + 1"}, where="k = 1")
    ch = r.table_changes(v0 + 1, v0 + 2).collect()
    by_type = {}
    for x in ch:
        by_type.setdefault(x["_change_type"], []).append(x)
    assert sorted(x.k for x in by_type["delete"]) == [39, 40]
    assert [x.price for x in by_type["update_preimage"]] == [10.0]
    assert [x.price for x in by_type["update_postimage"]] == [11.0]


def test_external_merge_upsert(spark, tmp_path):
    """DeltaLogReader.merge: the delta_lake_primer MERGE arc
    (02.delta_lake_primer.py:312-320) against an external log — matched
    rows update in place (only their files rewrite), unmatched source
    rows insert as new files."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    v0 = r.snapshot().version

    src = spark.createDataFrame(
        [{"k": 1, "status": "X", "price": 111.0},
         {"k": 2, "status": "X", "price": 222.0},
         {"k": 999, "status": "N", "price": 9.0}],
        "k long, status string, price double")
    res = r.merge(src, "t.k = s.k")
    assert res["version"] == v0 + 1
    assert res["rewritten_files"] >= 1 and res["inserted_rows"] == 1
    rows = {x.k: (x.status, x.price)
            for x in read_delta(spark, dest).collect()}
    assert len(rows) == 41
    assert rows[1] == ("X", 111.0) and rows[2] == ("X", 222.0)
    assert rows[999] == ("N", 9.0)
    assert rows[3] == ("B", 30.0)  # untouched row intact
    assert [h.operation for h in r.describe_history().collect()][:1] \
        == ["MERGE"]

    # matched-DELETE clause
    res = r.merge(
        spark.createDataFrame([{"k": 999}], "k long"),
        "t.k = s.k", when_matched_update=None,
        when_not_matched_insert=None, when_matched_delete=True)
    assert 999 not in {x.k for x in read_delta(spark, dest).collect()}

    # multiple source matches with an update clause raise, like Delta
    dup = spark.createDataFrame(
        [{"k": 5, "status": "D1", "price": 1.0},
         {"k": 5, "status": "D2", "price": 2.0}],
        "k long, status string, price double")
    with pytest.raises(DeltaProtocolError, match="multiple source rows"):
        r.merge(dup, "t.k = s.k")

    # schema evolution is refused on the external path
    wide = spark.createDataFrame(
        [{"k": 1, "extra": "x"}], "k long, extra string")
    with pytest.raises(DeltaProtocolError, match="not in the table schema"):
        r.merge(wide, "t.k = s.k")


def test_external_merge_records_cdf(spark, tmp_path):
    df = spark.createDataFrame(ROWS[:10], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.set_properties({"delta.enableChangeDataFeed": "true"})
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    v0 = r.snapshot().version
    src = spark.createDataFrame(
        [{"k": 1, "status": "X", "price": 111.0},
         {"k": 77, "status": "N", "price": 7.0}],
        "k long, status string, price double")
    r.merge(src, "t.k = s.k")
    ch = r.table_changes(v0 + 1, v0 + 1).collect()
    by_type = {}
    for x in ch:
        by_type.setdefault(x["_change_type"], []).append(x)
    assert [x.k for x in by_type["insert"]] == [77]
    assert [x.price for x in by_type["update_preimage"]] == [10.0]
    assert [x.price for x in by_type["update_postimage"]] == [111.0]


def test_external_restore(spark, tmp_path):
    """DeltaLogReader.restore: metadata-only commit re-adding a prior
    snapshot's file set; round-trips against LakeTable's own RESTORE
    exported through the log (VERDICT r9 #7)."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)          # v0
    t.delete("k > 30")                                          # v1
    t.update({"price": "price * 2"}, where="k <= 3")            # v2
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    want_v0 = _sorted_rows(r.to_df(0))

    res = r.restore(0)
    assert res["version"] == 3 and res["added_files"] >= 1
    assert _sorted_rows(read_delta(spark, dest)) == want_v0
    # the twin arc through LakeTable.restore exports to the same state
    t.restore(0)
    dest2 = t.export_delta_log(tmp_path / "delta2")
    assert _sorted_rows(read_delta(spark, dest2)) == want_v0
    # history/time travel intact after the restore commit
    assert [h.operation for h in r.describe_history().collect()][:1] \
        == ["RESTORE"]
    assert len(r.to_df(2).collect()) == 30

    with pytest.raises(DeltaProtocolError, match="restore"):
        r2 = DeltaLogReader(spark, dest)
        r2.vacuum(retention_hours=0)
        r2.restore(2)  # v2's rewritten files were vacuumed


# vacuum prescan (ADVICE r6): no partial export on missing historical files
# --------------------------------------------------------------------------- #
def test_export_vacuumed_table_fails_before_writing(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "lake")
    t.vacuum()  # drops files only referenced by historical versions
    dest = tmp_path / "delta"
    with pytest.raises(DeltaExportError, match="vacuumed"):
        t.export_delta_log(dest)
    assert not dest.exists()  # nothing half-written
    # and a retry doesn't trip over partial state either
    with pytest.raises(DeltaExportError, match="vacuumed"):
        t.export_delta_log(dest)


# --------------------------------------------------------------------------- #
# drop -> re-add (ADVICE r6): fresh physical name, no resurrection
# --------------------------------------------------------------------------- #
def test_drop_readd_column_reads_null_and_exports_fresh_id(spark, tmp_path):
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.alter_drop_column("price")
    t.alter_add_column("price", "double")
    # LakeTable read: old files' dropped data must NOT resurrect
    assert t.read().where(F.col("price").isNotNull()).count() == 0
    # new writes land under the minted physical name and read back fine
    t.append(spark.createDataFrame(
        [{"k": 500, "status": "Z", "price": 9.5}],
        "k long, status string, price double"))
    vals = {r.k: r.price for r in t.read().collect()}
    assert vals[500] == 9.5 and all(v is None for k, v in vals.items() if k != 500)
    # export succeeds and the re-added column has a FRESH id + physical name
    dest = t.export_delta_log(tmp_path / "delta")
    snap = DeltaLogReader(spark, dest).snapshot()
    price = next(f for f in snap.schema.fields if f.name == "price")
    assert price.metadata["delta.columnMapping.physicalName"] != "price"
    assert price.metadata["delta.columnMapping.id"] == 4  # 3 originals + 1
    assert int(snap.configuration["delta.columnMapping.maxColumnId"]) == 4
    # the exported table reads identically through the independent reader
    assert _sorted_rows(read_delta(spark, dest)) == _sorted_rows(t.read())


def test_rename_then_add_old_name_gets_fresh_physical(spark, tmp_path):
    """rename x->y keeps physical 'price'; adding a new 'price' must not
    collide with the surviving column's physical name."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.alter_rename_column("price", "amount")
    t.alter_add_column("price", "double")
    got = t.read()
    assert got.where(F.col("price").isNotNull()).count() == 0
    assert got.where(F.col("amount").isNotNull()).count() == len(ROWS)
    dest = t.export_delta_log(tmp_path / "delta")
    snap = DeltaLogReader(spark, dest).snapshot()
    by_name = {f.name: f.metadata["delta.columnMapping.physicalName"]
               for f in snap.schema.fields}
    assert by_name["amount"] == "price"
    assert by_name["price"] not in ("price", "amount")


def test_export_legacy_resurrect_log_fails_loudly(spark, tmp_path):
    """A log written BEFORE fresh-name minting (drop then re-add of the same
    physical name, no mapping) is unexportable without resurrecting dropped
    values — the exporter must refuse, not guess."""
    from lakehouses_spark.tables import log as txlog

    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    st = t.state()
    base_schema = json.loads(st.schema_json)
    dropped = {"type": "struct",
               "fields": [f for f in base_schema["fields"]
                          if f["name"] != "price"]}
    txlog.try_commit(t.path, 1, {"operation": "ALTER TABLE",
                                 "schema": json.dumps(dropped),
                                 "column_mapping": {}})
    txlog.try_commit(t.path, 2, {"operation": "ALTER TABLE",
                                 "schema": st.schema_json,
                                 "column_mapping": {}})
    with pytest.raises(DeltaExportError, match="re-added"):
        t.export_delta_log(tmp_path / "delta")


# --------------------------------------------------------------------------- #
# URL-encoded action paths (ADVICE r6): external writers encode specials
# --------------------------------------------------------------------------- #
def test_reader_percent_decodes_action_paths(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tmp_path / "enc"
    (base / "_delta_log").mkdir(parents=True)
    (base / "dt=2024-01-01 00%3A00").mkdir()
    rel_fs = "dt=2024-01-01 00%3A00/part with space.parquet"
    pq.write_table(pa.table({"k": [1, 2]}), base / rel_fs)
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}}]}
    from urllib.parse import quote

    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "e", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema), "partitionColumns": [],
                      "configuration": {}, "createdTime": 0}},
        {"add": {"path": quote(rel_fs), "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(base / "_delta_log" / f"{0:020d}.json", "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    assert sorted(r.k for r in read_delta(spark, base).collect()) == [1, 2]


def test_reader_prunes_columns_and_skips_files(spark, tmp_path):
    """r8: read_delta(columns=, filters=) — column pruning shrinks the
    ReadSchema; data-column filters skip files via the exported min/max
    stats; partition filters skip files via add.partitionValues. Results
    always match the unpruned read + row filter."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df,
                         partition_by=["k"], num_files=4)
    dest = t.export_delta_log(tmp_path / "delta")

    got = read_delta(spark, dest, columns=["status"], filters=[("k", "<=", 10)])
    assert got.columns == ["status"]
    assert sorted(r.status for r in got.collect()) == sorted(
        r.status for r in t.read().where(F.col("k") <= 10).collect()
    )
    # stats skipping: k-clustered export → the k<=10 read scans fewer files
    full = read_delta(spark, dest)
    assert len(set(got.inputFiles())) < len(set(full.inputFiles()))
    # the pruned scan reads ONLY the needed columns
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "price" not in plan.split("ReadSchema")[-1]

    # hive-partitioned external table: partition filter prunes whole files
    base = tmp_path / "ext"
    (base / "_delta_log").mkdir(parents=True)
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "x", "format": {"provider": "parquet",
                                            "options": {}},
                      "schemaString": json.dumps(
                          {"type": "struct", "fields": [
                              {"name": "v", "type": "long",
                               "nullable": True, "metadata": {}},
                              {"name": "dt", "type": "string",
                               "nullable": True, "metadata": {}}]}),
                      "partitionColumns": ["dt"],
                      "configuration": {}, "createdTime": 0}},
    ]
    for i, dt in enumerate(("2024-01-01", "2024-01-02")):
        (base / f"dt={dt}").mkdir()
        rel = f"dt={dt}/part-{i}.parquet"
        pq.write_table(pa.table({"v": [i * 10, i * 10 + 1]}), base / rel)
        actions.append({"add": {"path": rel, "partitionValues": {"dt": dt},
                                "size": 1, "modificationTime": 0,
                                "dataChange": True}})
    with open(base / "_delta_log" / f"{0:020d}.json", "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    one = read_delta(spark, base, filters=[("dt", "==", "2024-01-02")])
    assert sorted(r.v for r in one.collect()) == [10, 11]
    assert len(set(one.inputFiles())) == 1  # the other partition never scanned


def test_reader_percent_decodes_partitioned_dv_paths(spark, tmp_path):
    """ADVICE r7 (high): the partition-value map join and the DV anti-join
    key on `_metadata.file_path`, which Spark reports URL-ENCODED — a data
    file path containing a space arrives as %20 while the map keys are raw
    resolved paths. Before the fix the inner join missed silently (0 rows)
    and DV-deleted rows resurrected. Both joins must survive spaces AND a
    literal % in the path (%3A from Delta's own partition-dir encoding)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from urllib.parse import quote

    base = tmp_path / "encdv"
    part_dir = "dt=2024-01-01 00%3A00"
    (base / "_delta_log").mkdir(parents=True)
    (base / part_dir).mkdir()
    rel_fs = f"{part_dir}/part with space.parquet"
    pq.write_table(
        pa.table({"k": list(range(10))}), base / rel_fs
    )
    deleted = [2, 7]
    payload = _ser_dv_payload(deleted)
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "dt", "type": "string", "nullable": True, "metadata": {}}]}
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "e2", "format": {"provider": "parquet",
                                             "options": {}},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": ["dt"],
                      "configuration": {}, "createdTime": 0}},
        {"add": {"path": quote(rel_fs),
                 "partitionValues": {"dt": "2024-01-01 00:00"}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": {
                     "storageType": "i",
                     "pathOrInlineDv": dvmod.z85_encode(
                         payload + b"\0" * (-len(payload) % 4)),
                     "sizeInBytes": len(payload),
                     "cardinality": len(deleted)}}},
    ]
    with open(base / "_delta_log" / f"{0:020d}.json", "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    rows = read_delta(spark, base).collect()
    assert sorted(r.k for r in rows) == sorted(set(range(10)) - set(deleted))
    assert {r.dt for r in rows} == {"2024-01-01 00:00"}


# --------------------------------------------------------------------------- #
# v2 checkpoints (PROTOCOL.md "V2 Checkpoint Table Feature")
# --------------------------------------------------------------------------- #
def test_v2_checkpoint_with_sidecars_reads(spark, tmp_path):
    """A table whose ONLY recovery point is a v2 checkpoint — top-level
    uuid-named JSON with protocol/metaData/checkpointMetadata + sidecar
    pointers, file actions in _delta_log/_sidecars/*.parquet, no JSON
    commits surviving at or below the checkpoint — must reconstruct, and a
    JSON tail after it must still replay on top."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tmp_path / "v2ckpt"
    (base / "_delta_log" / "_sidecars").mkdir(parents=True)
    pq.write_table(pa.table({"k": [1, 2, 3]}), base / "part-a.parquet")
    pq.write_table(pa.table({"k": [4, 5]}), base / "part-b.parquet")
    pq.write_table(pa.table({"k": [6]}), base / "part-c.parquet")
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}}]}
    add_schema = (
        "add struct<path:string,partitionValues:map<string,string>,"
        "size:bigint,modificationTime:bigint,dataChange:boolean,stats:string>"
    )
    for name, rel in (("sc-0.parquet", "part-a.parquet"),
                      ("sc-1.parquet", "part-b.parquet")):
        spark.createDataFrame(
            [((rel, {}, 1, 0, True, None),)], add_schema
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp_sc"))
        src = next((tmp_path / "tmp_sc").glob("part-*.parquet"))
        src.rename(base / "_delta_log" / "_sidecars" / name)
    top = [
        {"checkpointMetadata": {"version": 1}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["v2Checkpoint"],
                      "writerFeatures": ["v2Checkpoint"]}},
        {"metaData": {"id": "v2", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema), "partitionColumns": [],
                      "configuration": {}, "createdTime": 0}},
        {"sidecar": {"path": "sc-0.parquet", "sizeInBytes": 1,
                     "modificationTime": 0}},
        {"sidecar": {"path": "sc-1.parquet", "sizeInBytes": 1,
                     "modificationTime": 0}},
    ]
    with open(base / "_delta_log" / f"{1:020d}.checkpoint.abc0-def1.json", "w") as fh:
        for a in top:
            fh.write(json.dumps(a) + "\n")
    with open(base / "_delta_log" / "_last_checkpoint", "w") as fh:
        json.dump({"version": 1}, fh)
    got = sorted(r.k for r in read_delta(spark, base).collect())
    assert got == [1, 2, 3, 4, 5]
    # a JSON commit after the checkpoint replays on top of it
    with open(base / "_delta_log" / f"{2:020d}.json", "w") as fh:
        fh.write(json.dumps({"add": {"path": "part-c.parquet",
                                     "partitionValues": {}, "size": 1,
                                     "modificationTime": 0,
                                     "dataChange": True}}) + "\n")
    assert sorted(r.k for r in read_delta(spark, base).collect()) == [1, 2, 3, 4, 5, 6]
    # time travel back to the checkpoint version still works
    assert sorted(
        r.k for r in DeltaLogReader(spark, base).to_df(version=1).collect()
    ) == [1, 2, 3, 4, 5]


# (multi-part classic checkpoints are SUPPORTED since r8 —
# see test_multipart_checkpoint_reads / _missing_part_fails_loudly)


def test_pruned_replay_bounds_driver_rss_on_100k_file_checkpoint(spark, tmp_path):
    """VERDICT r7 #2: a checkpoint with 100k add actions, each carrying a
    ~1.5 KB stats string (~150 MB of stats total), must reconstruct WITHOUT
    materializing the stats on the driver — the pruned replay extracts
    numRecords JVM-side and collects only narrow rows. Asserts snapshot
    correctness + bounded Python-driver RSS growth (same probe as the
    ingestion ladder)."""
    import resource

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lakehouses_spark.tables.delta_log import PRUNED_REPLAY_FILE_THRESHOLD

    n = 100_000
    assert n > PRUNED_REPLAY_FILE_THRESHOLD
    base = tmp_path / "big"
    log = base / "_delta_log"
    log.mkdir(parents=True)
    schema_json = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}}]})

    add_t = pa.struct([
        ("path", pa.string()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
        ("size", pa.int64()),
        ("modificationTime", pa.int64()),
        ("dataChange", pa.bool_()),
        ("stats", pa.string()),
    ])
    meta_t = pa.struct([
        ("id", pa.string()),
        ("schemaString", pa.string()),
        ("partitionColumns", pa.list_(pa.string())),
        ("configuration", pa.map_(pa.string(), pa.string())),
        ("createdTime", pa.int64()),
    ])
    proto_t = pa.struct([("minReaderVersion", pa.int32()),
                         ("minWriterVersion", pa.int32())])
    full = pa.schema([("add", add_t), ("metaData", meta_t),
                      ("protocol", proto_t)])

    # part 1: the two table actions
    pq.write_table(
        pa.Table.from_pydict(
            {"add": [None, None],
             "metaData": [None, {"id": "big", "schemaString": schema_json,
                                 "partitionColumns": [],
                                 "configuration": [], "createdTime": 0}],
             "protocol": [{"minReaderVersion": 1, "minWriterVersion": 2},
                          None]},
            schema=full,
        ),
        log / f"{0:020d}.checkpoint.{1:010d}.{2:010d}.parquet",
    )
    # part 2: 100k fat adds, written in 10k-row batches; each carries k
    # bounds ([i*10, i*10+9]) inside the fat stats so the r9 lazy re-
    # projection below has something real to skip on
    fat_cols = json.dumps({f"c{i}": "x" * 24 for i in range(40)})[1:-1]
    mk_stats = (
        '{{"numRecords": 7, "minValues": {{"k": {lo}, ' + fat_cols +
        '}}, "maxValues": {{"k": {hi}, ' + fat_cols + "}}}}"
    ).format
    with pq.ParquetWriter(
        log / f"{0:020d}.checkpoint.{2:010d}.{2:010d}.parquet", full
    ) as w:
        for lo in range(0, n, 10_000):
            adds = [{"path": f"data/f-{i:07d}.parquet", "partitionValues": [],
                     "size": 1, "modificationTime": 0, "dataChange": False,
                     "stats": mk_stats(lo=i * 10, hi=i * 10 + 9)}
                    for i in range(lo, lo + 10_000)]
            w.write_table(pa.Table.from_pydict(
                {"add": adds, "metaData": [None] * len(adds),
                 "protocol": [None] * len(adds)}, schema=full))

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    snap = DeltaLogReader(spark, base).snapshot()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    grew_mb = (rss1 - rss0) / 1024
    assert len(snap.files) == n
    a = snap.files["data/f-0042424.parquet"]
    assert json.loads(a["stats"]) == {"numRecords": 7}  # pruned, not fat
    assert snap.num_records == 7 * n
    # measured: full-fidelity collect grows the Python driver ~258 MiB on
    # this fixture; the pruned path ~87 MiB (the narrow file dict itself)
    assert grew_mb < 180, f"driver RSS grew {grew_mb:.0f} MiB"

    # VERDICT r8 #2: stats skipping survives the pruned replay — min/max
    # for the FILTER column re-projects lazily (typed, JVM-side) and the
    # '=' probe keeps exactly the one file whose k-range covers it
    import pyspark.sql.types as T

    import lakehouses_spark.tables.delta_log as dl

    r = DeltaLogReader(spark, base)
    snap2 = r.snapshot()
    keys = {a["__statsPruned"] for a in snap2.files.values()}
    assert keys, "100k-add checkpoint must take the pruned path"
    lazy = r._lazy_minmax(keys, [("k", T.LongType())])
    keep = [
        p for p, a in snap2.files.items()
        if dl._delta_file_may_match(
            {**a, "__lazyStats": lazy.get(p, {})},
            [("k", "=", 424243)], {}, {"k": "k"},
        )
    ]
    assert keep == ["data/f-0042424.parquet"]


def test_restore_readd_under_tombstone_exports_dv(spark, tmp_path):
    """ADVICE r8 (high): RESTORE re-adds previously-removed files under
    their ORIGINAL add version (log.py:302) with the tombstone set
    UNCHANGED — the export replay must re-emit deletion vectors for them.
    Previously the DV pass only ran when the tombstone set changed, so a
    restored pre-tombstone file exported as a plain add and its deleted
    rows resurrected in the exported Delta table."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)    # v0: file A
    t.delete("k > 30", lazy=True)                         # v1: tombstone @1
    t.update({"price": "price + 1"}, where="k < 1000")    # v2: A -> A'
    t.restore(1)                                          # v3: re-adds A, same tombstones
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    for v in range(t.version + 1):
        assert _sorted_rows(r.to_df(v)) == _sorted_rows(t.read(version=v)), v
    got = r.to_df().collect()
    assert got and all(row.k <= 30 for row in got)
    dv_adds = [a for a in r.snapshot().files.values()
               if a.get("deletionVector")]
    assert dv_adds, "restored pre-tombstone file must carry its DV"


def test_clone_with_tombstones_exports_correct_dv_targets(spark, tmp_path):
    """ADVICE r8 (high): a CLONE's v0 adds carry add_version overrides —
    files POST-dating a cloned tombstone must export WITHOUT a DV.
    Previously every clone add replayed as add_version 0, so the tombstone
    wrongly applied to post-tombstone appends (over-deleting), and with the
    set_tombstones arriving in the same v0 the pre-tombstone file's DV was
    computed over the wrong target set."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    src = LakeTable.create(spark, tmp_path / "src", df)   # v0: file A
    src.delete("k > 30", lazy=True)                       # v1: tombstone @1 (hits A)
    src.append(spark.createDataFrame(
        [{"k": 999, "status": "Z", "price": 1.0}],
        "k long, status string, price double"))           # v2: file B post-dates it
    clone = src.clone(tmp_path / "clone", shallow=False)
    dest = clone.export_delta_log(tmp_path / "delta")
    got = read_delta(spark, dest).collect()
    assert _sorted_rows(read_delta(spark, dest)) == _sorted_rows(src.read())
    assert any(row.k == 999 for row in got), "post-tombstone row over-deleted"
    assert all(row.k <= 30 or row.k == 999 for row in got)


def test_stats_skipping_survives_pruned_replay(spark, tmp_path, monkeypatch):
    """VERDICT r8 #2: past PRUNED_REPLAY_FILE_THRESHOLD the replay keeps
    stats strings JVM-side — but read_delta(filters=) must still skip
    files, by lazily re-projecting min/max for JUST the filter columns
    from the checkpoint parquet. Pinned by comparing the scanned-file set
    pruned vs unpruned on the same export."""
    import lakehouses_spark.tables.delta_log as dl

    mk = lambda lo, hi: spark.createDataFrame(
        [{"k": i, "status": "AB"[i % 2], "price": float(10 * i)}
         for i in range(lo, hi)],
        "k long, status string, price double").coalesce(1)
    t = LakeTable.create(spark, tmp_path / "lake", mk(1, 11))
    for lo in (11, 21, 31):
        t.append(mk(lo, lo + 10))
    dest = t.export_delta_log(tmp_path / "delta")

    full = DeltaLogReader(spark, dest)  # full-fidelity replay
    want = full.to_df(filters=[("k", "<=", 10)])
    want_rows, want_files = _sorted_rows(want), set(want.inputFiles())
    all_files = set(full.to_df().inputFiles())
    assert len(want_files) < len(all_files), "fixture must be k-clustered"

    monkeypatch.setattr(dl, "PRUNED_REPLAY_FILE_THRESHOLD", 0)
    pruned = DeltaLogReader(spark, dest)
    snap = pruned.snapshot()
    assert all(a.get("__statsPruned") for a in snap.files.values())
    assert all(set(json.loads(a["stats"])) == {"numRecords"}
               for a in snap.files.values())  # fat stats never reach Python
    got = pruned.to_df(filters=[("k", "<=", 10)])
    assert _sorted_rows(got) == want_rows
    assert set(got.inputFiles()) == want_files  # same files skipped


def test_dataframe_json_tail_replay_matches_python_loop(spark, tmp_path, monkeypatch):
    """VERDICT r8 #6 (equivalence half): past JSON_TAIL_DATAFRAME_BYTES the
    commit-JSON tail reconciles as a DataFrame (last-add-wins window +
    latest-remove anti-join). On a log exercising every tricky shape —
    removes, schema evolution, merge-on-read DV re-adds, RESTORE's
    within-commit duplicate add — every historical snapshot must equal the
    Python-loop replay exactly."""
    import lakehouses_spark.tables.delta_log as dl

    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("k > 30", lazy=True)                      # tombstone → DV adds
    t.update({"price": "price + 1"}, where="k <= 3")   # remove + add
    t.append(spark.createDataFrame(
        [{"k": 500, "status": "Z", "price": 1.0, "note": "n"}],
        "k long, status string, price double, note string"),
        merge_schema=True)                             # metaData change
    t.restore(1)                                       # duplicate-add commit
    dest = t.export_delta_log(tmp_path / "delta", checkpoint=False)

    py = DeltaLogReader(spark, dest)
    monkeypatch.setattr(dl, "JSON_TAIL_DATAFRAME_BYTES", -1)
    dfr = DeltaLogReader(spark, dest)
    for v in range(t.version + 1):
        s_py, s_df = py.snapshot(v), dfr.snapshot(v)
        assert set(s_py.files) == set(s_df.files), v
        assert {p: bool(a.get("deletionVector"))
                for p, a in s_py.files.items()} == \
               {p: bool(a.get("deletionVector"))
                for p, a in s_df.files.items()}, v
        assert s_py.metadata["schemaString"] == s_df.metadata["schemaString"]
        assert s_py.protocol == s_df.protocol
        assert s_py.num_records == s_df.num_records, v
        # full row compare on the two versions whose READ semantics can
        # diverge (DV filtering at v1, duplicate-add RESTORE head);
        # identical file sets + DV flags + metadata pin the rest without
        # 4 more full-table replays (suite-time discipline, VERDICT r8 #4)
        if v in (1, t.version):
            assert _sorted_rows(dfr.to_df(v)) == _sorted_rows(py.to_df(v)), v
    # stats stayed JVM-side on the DataFrame path
    assert all(a.get("__statsPruned")
               for a in dfr.snapshot().files.values())


@pytest.mark.slow  # 6k-file fixture + ~50 s; the equivalence test above
# covers the DataFrame-replay semantics in the default run
def test_dataframe_json_tail_replay_many_commits(spark, tmp_path):
    """VERDICT r8 #6 (scale half): a pathological 6k-commit log with fat
    per-add stats (no checkpoint) crosses JSON_TAIL_DATAFRAME_BYTES
    naturally; the reader reconciles it DataFrame-side with the fat stats
    never materializing on the driver, and lazy min/max re-projection
    still skips files for filtered reads."""
    import resource

    import pyspark.sql.types as T

    import lakehouses_spark.tables.delta_log as dl
    from lakehouses_spark.tables.delta_log import JSON_TAIL_DATAFRAME_BYTES

    n = 6_000
    base = tmp_path / "many"
    log = base / "_delta_log"
    log.mkdir(parents=True)
    schema_json = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}}]})
    fat_cols = json.dumps({f"c{i}": "x" * 24 for i in range(40)})[1:-1]
    mk_stats = (
        '{{"numRecords": 7, "minValues": {{"k": {lo}, ' + fat_cols +
        '}}, "maxValues": {{"k": {hi}, ' + fat_cols + "}}}}"
    ).format
    with open(log / f"{0:020d}.json", "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 1,
                                          "minWriterVersion": 2}}) + "\n")
        fh.write(json.dumps({"metaData": {
            "id": "many", "schemaString": schema_json,
            "partitionColumns": [], "configuration": {},
            "createdTime": 0}}) + "\n")
    for v in range(1, n):
        acts = [{"add": {"path": f"data/f-{v:06d}.parquet",
                         "partitionValues": {}, "size": 1,
                         "modificationTime": 0, "dataChange": True,
                         "stats": mk_stats(lo=v * 10, hi=v * 10 + 9)}}]
        if v % 5 == 0:  # churn: remove the file added two commits ago
            acts.append({"remove": {"path": f"data/f-{v - 2:06d}.parquet",
                                    "deletionTimestamp": 0,
                                    "dataChange": True}})
        with open(log / f"{v:020d}.json", "w") as fh:
            for a in acts:
                fh.write(json.dumps(a) + "\n")
    tail_bytes = sum(p.stat().st_size for p in log.glob("*.json"))
    assert tail_bytes > JSON_TAIL_DATAFRAME_BYTES, "fixture must cross bound"

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    r = DeltaLogReader(spark, base)
    snap = r.snapshot()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    n_removed = len([v for v in range(1, n) if v % 5 == 0])
    assert len(snap.files) == (n - 1) - n_removed
    assert "data/f-000005.parquet" in snap.files      # re-check: 5 adds f-5
    assert "data/f-000003.parquet" not in snap.files  # removed at v=5
    a = snap.files["data/f-000100.parquet"]
    assert json.loads(a["stats"]) == {"numRecords": 7}  # pruned, not fat
    assert snap.num_records == 7 * len(snap.files)
    assert (rss1 - rss0) / 1024 < 120, "driver RSS must stay bounded"

    # lazy bounds re-projection keeps exactly the covering file
    lazy = r._lazy_minmax(
        {a["__statsPruned"] for a in snap.files.values()},
        [("k", T.LongType())])
    keep = [p for p, a in snap.files.items()
            if dl._delta_file_may_match(
                {**a, "__lazyStats": lazy.get(p, {})},
                [("k", "=", 1003)], {}, {"k": "k"})]
    assert keep == ["data/f-000100.parquet"]


# ------------------------- v2 checkpoint WRITE ---------------------------- #
def test_v2_checkpoint_write_roundtrip(spark, tmp_path):
    """checkpoint_format="v2" (r9): the exporter writes the UUID-named
    top-level `<v>.checkpoint.<uuid>.json` + `_sidecars/*.parquet` layout
    (PROTOCOL.md "V2 Checkpoint Table Feature") the reader already
    consumes; protocol advertises v2Checkpoint as a (3,7) reader feature
    in BOTH commit 0 and the checkpoint; after deleting every JSON commit
    the snapshot reconstructs from the v2 checkpoint alone."""
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_delta_log(tmp_path / "delta", checkpoint_format="v2")
    log = dest / "_delta_log"

    tops = list(log.glob(f"{t.version:020d}.checkpoint.*.json"))
    assert len(tops) == 1 and len(tops[0].name.split(".")) == 4
    assert not (log / f"{t.version:020d}.checkpoint.parquet").exists()
    sidecars = list((log / "_sidecars").glob("*.parquet"))
    assert len(sidecars) >= 1
    assert json.loads((log / "_last_checkpoint").read_text())["version"] == \
        t.version

    # top-level holds ONLY non-file actions + sidecar pointers
    with open(tops[0]) as fh:
        top_actions = [json.loads(line) for line in fh]
    kinds = [next(iter(a)) for a in top_actions]
    assert "checkpointMetadata" in kinds and "sidecar" in kinds
    assert "add" not in kinds and "remove" not in kinds
    proto = next(a for a in top_actions if "protocol" in a)["protocol"]
    assert (proto["minReaderVersion"], proto["minWriterVersion"]) == (3, 7)
    assert "v2Checkpoint" in proto["readerFeatures"]
    with open(log / f"{0:020d}.json") as fh:
        c0 = [json.loads(line) for line in fh]
    p0 = next(a for a in c0 if "protocol" in a)["protocol"]
    assert "v2Checkpoint" in p0["readerFeatures"]

    want = _sorted_rows(t.read())
    assert _sorted_rows(read_delta(spark, dest)) == want
    for v in range(t.version + 1):
        (log / f"{v:020d}.json").unlink()
    assert _sorted_rows(read_delta(spark, dest)) == want


def test_v2_checkpoint_dv_and_sidecar_chunking(spark, tmp_path, monkeypatch):
    """Interaction pin: deletionVector descriptors survive the sidecar
    parquet, and past CHECKPOINT_PART_ACTIONS adds the file actions chunk
    into MULTIPLE sidecars (the scale shape), all reconciled on read."""
    import lakehouses_spark.tables.delta_log as dl

    monkeypatch.setattr(dl, "CHECKPOINT_PART_ACTIONS", 8)
    # explicit file count (≥ the chunk threshold) so the sidecar split
    # never depends on the harness's default parallelism
    df = spark.createDataFrame(
        ROWS, "k long, status string, price double").repartition(12)
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("k > 30", lazy=True)               # tombstone -> native DV
    dest = t.export_delta_log(tmp_path / "delta", checkpoint_format="v2")
    log = dest / "_delta_log"
    assert len(list((log / "_sidecars").glob("*.parquet"))) >= 2
    proto_feats = None
    with open(next(log.glob(f"{t.version:020d}.checkpoint.*.json"))) as fh:
        for line in fh:
            a = json.loads(line)
            if "protocol" in a:
                proto_feats = a["protocol"]["readerFeatures"]
    assert set(proto_feats) >= {"deletionVectors", "v2Checkpoint"}
    want = _sorted_rows(t.read())
    for v in range(t.version + 1):
        (log / f"{v:020d}.json").unlink()
    assert _sorted_rows(read_delta(spark, dest)) == want

    with pytest.raises(ValueError, match="classic"):
        t.export_delta_log(tmp_path / "delta2", checkpoint_format="v3")


# ------------------------------ external VACUUM --------------------------- #
def test_external_vacuum(spark, tmp_path):
    """DeltaLogReader.vacuum: files only OLD versions reference are
    reclaimed past the retention cutoff; live files, the current
    snapshot's DV sidecars, `_delta_log/` and `_change_data/` survive;
    current reads are unchanged; vacuumed time travel fails."""
    import time as _time

    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.update({"price": "price * 2"}, where="k <= 5")   # COW rewrite: orphans v0 file
    t.delete("k > 38", lazy=True)                      # current snapshot carries a DV
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    want = _sorted_rows(read_delta(spark, dest))
    n_live = len(r.snapshot().files)

    # default 7-day retention protects everything just written
    assert r.vacuum()["files"] == []

    dry = r.vacuum(retention_hours=0, dry_run=True)
    assert dry["deleted"] == 0 and len(dry["files"]) >= 1
    assert all("deletion_vector" not in f and "_delta_log" not in f
               for f in dry["files"])

    res = r.vacuum(retention_hours=0)
    assert res["files"] == dry["files"] and res["deleted"] == len(dry["files"])
    assert _sorted_rows(read_delta(spark, dest)) == want
    assert len(r.snapshot().files) == n_live
    # time travel to version 0 now fails: its rewritten file is gone
    with pytest.raises(Exception):
        r.to_df(0).collect()
    # idempotent
    assert r.vacuum(retention_hours=0)["files"] == []
    with pytest.raises(ValueError):
        r.vacuum(retention_hours=-1)
    _ = _time  # (kept for symmetry with other maintenance tests)


def test_external_vacuum_retention_by_deletion_timestamp(spark, tmp_path):
    """ADVICE r9 (high): retention is keyed on the remove action's
    deletionTimestamp, NOT file mtime. Exports hard-link/copy2 data files
    preserving mtimes, so a week-old mtime must not defeat the 7-day
    guard for a file whose tombstone was committed seconds ago — time
    travel and in-flight readers stay protected for the full window.
    Untracked junk files (never in the log) still fall to the mtime
    clock."""
    import os
    import time as _time

    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.append(spark.createDataFrame(ROWS, "k long, status string, price double"))
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)

    # simulate an export of an old table: every data file's mtime is 30
    # days in the past (copy2/hard-link preserve source mtimes)
    old = _time.time() - 30 * 24 * 3600
    for p in Path(dest).rglob("*.parquet"):
        if "_delta_log" not in p.parts:
            os.utime(p, (old, old))
    v0_files = set(r.snapshot().files)

    res = r.optimize()  # removes every pre-compaction file, tombstones NOW
    assert res["output_files"] >= 1

    # default 7-day retention: tombstones are seconds old → protected,
    # even though the files' mtimes are 30 days old (the former bug
    # reclaimed them here, breaking time travel inside the window)
    assert r.vacuum()["files"] == []
    assert {Path(f).name for f in r.to_df(len(r.versions()) - 2).inputFiles()} \
        <= {Path(f).name for f in map(str, Path(dest).rglob("*.parquet"))}

    # an untracked file with an old mtime is mtime-governed: reclaimed
    junk = Path(dest) / "junk-not-in-log.parquet"
    junk.write_bytes(b"x")
    os.utime(junk, (old, old))
    got = r.vacuum()
    assert got["files"] == ["junk-not-in-log.parquet"]

    # retention 0: tombstoned files now eligible; old snapshot unreadable
    reclaimed = set(r.vacuum(retention_hours=0)["files"])
    assert v0_files <= reclaimed
    with pytest.raises(Exception):
        r.to_df(0).collect()


def test_external_optimize(spark, tmp_path):
    """DeltaLogReader.optimize: fragmented files + an active DV bin-pack
    into ONE file via a dataChange=false commit; reads identical; DVs
    purged; time travel untouched; VACUUM then reclaims the old files;
    a tailing stream resumes across the rewrite WITHOUT re-emitting."""
    from lakehouses_spark.tables.delta_stream import DeltaTableDataSource

    df = spark.createDataFrame(ROWS[:20], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.append(spark.createDataFrame(ROWS[20:], "k long, status string, price double"))
    t.delete("k > 35", lazy=True)
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    want = _sorted_rows(read_delta(spark, dest))
    n_live = len(r.snapshot().files)
    assert n_live >= 2
    v_before = r.snapshot().version

    # drain a stream BEFORE the optimize so its checkpoint sits at v_before
    spark.dataSource.register(DeltaTableDataSource)
    sink, ckpt = tmp_path / "sink", tmp_path / "ckpt"

    def drain():
        q = (
            spark.readStream.format("deltatable")
            .option("path", str(dest)).option("ignoreChanges", "true")
            .load()
            .writeStream.format("parquet")
            .option("path", str(sink)).option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(sink)).count()

    n_streamed = drain()

    dry = r.optimize(target_files=1, dry_run=True)
    assert dry["input_files"] == n_live and dry["dv_files_purged"] >= 1
    res = r.optimize(target_files=1)
    assert res["output_files"] == 1 and res["version"] == v_before + 1

    r2 = DeltaLogReader(spark, dest)
    assert len(r2.snapshot().files) == 1
    assert not any(a.get("deletionVector")
                   for a in r2.snapshot().files.values())
    assert _sorted_rows(read_delta(spark, dest)) == want
    assert _sorted_rows(r2.to_df(v_before)) == want  # time travel intact
    # the compaction commit is dataChange=false: the resumed stream
    # advances past it without emitting a single row
    assert drain() == n_streamed
    # vacuum reclaims the replaced files (+ the now-unreferenced DV sidecar)
    res_v = r2.vacuum(retention_hours=0)
    assert len(res_v["files"]) >= n_live
    assert _sorted_rows(read_delta(spark, dest)) == want


def test_external_optimize_zorder_skips_files(spark, tmp_path):
    """optimize(zorder_by=): the rewritten files carry footer min/max in
    add.stats and the z-ordered layout lets read_delta(filters=) open a
    strict subset of files on EITHER clustered column; LakeTable's own
    optimize_zorder (refactored onto the shared z-expression) stays green."""
    rows = [(i, float((i * 37) % 100), "AB"[i % 2]) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, price double, status string")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    want = _sorted_rows(read_delta(spark, dest))
    res = r.optimize(target_files=8, zorder_by=["k", "price"])
    assert res["output_files"] == 8

    r2 = DeltaLogReader(spark, dest)
    assert _sorted_rows(read_delta(spark, dest)) == want
    adds = list(r2.snapshot().files.values())
    assert all("minValues" in json.loads(a["stats"]) for a in adds)
    full = len(r2.to_df().inputFiles())
    for col, op, val in (("k", "<", 30), ("price", "<", 10.0)):
        pruned = len(r2.to_df(filters=[(col, op, val)]).inputFiles())
        assert pruned < full, (col, pruned, full)

    # the shared z-expression also still drives the in-table ZORDER
    t2 = LakeTable.create(
        spark, tmp_path / "lake2",
        spark.createDataFrame(rows, "k long, price double, status string"))
    zres = t2.optimize_zorder(["k", "price"], num_files=8)
    assert zres["new_files"] >= 1
    assert _sorted_rows(t2.read()) == want


def test_external_history(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    hist = r.describe_history().collect()
    assert [h.version for h in hist] == list(range(t.version, -1, -1))
    assert all(h.timestamp_ms > 0 for h in hist)
    ops = {h.operation for h in hist}
    assert ops & {"CREATE", "WRITE", "DELETE", "UPDATE", "CREATE TABLE AS SELECT"}
    assert hist[-1].num_added_files >= 1          # the CTAS commit
    # an external OPTIMIZE shows up at the head
    r.optimize(target_files=1)
    h2 = DeltaLogReader(spark, dest).describe_history().collect()[0]
    assert h2.operation == "OPTIMIZE" and h2.num_removed_files >= 1


# -------- round-11: NULL-predicate DML + bounds exactness (ADVICE r10) ---- #
def test_external_delete_keeps_null_predicate_rows(spark, tmp_path):
    """DELETE keeps rows where the predicate evaluates to NULL, not just
    FALSE — Delta's DeleteCommand filters kept rows on !(cond <=> true),
    so DELETE WHERE price = 5 on a file holding price IS NULL must keep
    the NULL rows, and the CDF delete image holds only the TRUE rows."""
    rows = [
        {"k": 1, "price": 5.0}, {"k": 2, "price": None},
        {"k": 3, "price": 7.0}, {"k": 4, "price": None},
    ]
    df = spark.createDataFrame(rows, "k long, price double").coalesce(1)
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.set_properties({"delta.enableChangeDataFeed": "true"})
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    v0 = r.snapshot().version
    res = r.delete("price = 5.0")
    assert res["rewritten_files"] == 1
    assert sorted(x.k for x in read_delta(spark, dest).collect()) == [2, 3, 4]
    ch = r.table_changes(v0 + 1, v0 + 1).collect()
    assert sorted(x.k for x in ch if x["_change_type"] == "delete") == [1]


def test_exact_footer_bounds_omits_partially_covered_columns(tmp_path):
    """A row group holding values whose min/max the writer dropped (the
    all-NaN float case here) poisons the whole column: bounds folded from
    the OTHER row groups would under-cover the file and let stats-driven
    skipping wrongly drop it (NaN compares greater than any value in
    Spark, so NaN rows DO match `> x` filters). The column gets no
    bounds; exact columns keep theirs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lakehouses_spark.tables.delta_log import exact_footer_bounds

    t1 = pa.table({"k": [1, 2], "price": [float("nan")] * 2})
    t2 = pa.table({"k": [10, 11], "price": [5.0, 6.0]})
    f = tmp_path / "two_rg.parquet"
    w = pq.ParquetWriter(f, t1.schema)
    w.write_table(t1)
    w.write_table(t2)
    w.close()
    md = pq.ParquetFile(f).metadata
    # precondition: the writer really produced a values-but-no-min/max
    # row group for price (otherwise this test pins nothing)
    st0 = md.row_group(0).column(1).statistics
    assert not st0.has_min_max and st0.null_count == 0
    mins, maxs = exact_footer_bounds(md)
    assert "price" not in mins and "price" not in maxs
    assert mins["k"] == 1 and maxs["k"] == 11


def test_pruning_ignores_nan_bounds():
    """Legacy/foreign stats can carry literal NaN bounds (Spark 4's
    writer emits NaN row-group min/max; F.max over a NaN-bearing double
    IS NaN). Every comparison against NaN is False in Python, so without
    a guard the pruners would 'prove' no-match and skip a file that
    matches — NaN bounds must read as 'no bound'."""
    from lakehouses_spark.tables.delta_log import _delta_file_may_match
    from lakehouses_spark.tables.table import _file_may_match

    nan = float("nan")
    add = {"stats": {"price": {"min": nan, "max": nan}}}
    for op in ("<", "<=", ">", ">=", "="):
        assert _file_may_match(add, [("price", op, 100.0)])
    d_add = {"stats":
             '{"minValues": {"price": NaN}, "maxValues": {"price": NaN}}'}
    for op in ("<", "<=", ">", ">=", "="):
        assert _delta_file_may_match(d_add, [("price", op, 100.0)], {}, {})


def test_nan_stats_recorded_as_null_never_skip(spark, tmp_path):
    """End-to-end: a LakeTable holding NaN doubles records no NaN bound
    (json-safe null instead), and a `> x` filter still returns the
    matching rows — including the NaN rows Spark considers greater than
    everything."""
    rows = [{"k": 1, "price": float("nan")}, {"k": 2, "price": 150.0},
            {"k": 3, "price": 1.0}]
    df = spark.createDataFrame(rows, "k long, price double").coalesce(1)
    t = LakeTable.create(spark, tmp_path / "lake", df)
    got = sorted(x.k for x in t.read(filters=[("price", ">", 100.0)]).collect())
    assert got == [1, 2]  # NaN > 100.0 is TRUE in Spark semantics
    for a in t.state().files.values():
        s = (a.get("stats") or {}).get("price") or {}
        for v in (s.get("min"), s.get("max")):
            assert not (isinstance(v, float) and v != v), a


def test_external_restore_restores_metadata(spark, tmp_path):
    """RESTORE across a metadata change also restores the target
    version's metaData (schema/configuration), like Delta's
    RestoreTableCommand — otherwise the newer config would sit over the
    old file set."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    v_pre = t.version
    t.set_properties({"lakehouses.audit": "on"})
    t.append(spark.createDataFrame(
        [{"k": 100, "status": "C", "price": 1.0}],
        "k long, status string, price double"))
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)
    assert r.snapshot().configuration.get("lakehouses.audit") == "on"
    r.restore(v_pre)
    r2 = DeltaLogReader(spark, dest)
    assert r2.snapshot().configuration.get("lakehouses.audit") is None
    assert r2.to_df().count() == len(ROWS)


# ------------- round-11: COW DML on hive-partitioned tables -------------- #
# the canonical hive-partitioned foreign fixture now lives in
# tests/foreign_fixtures.py (VERDICT r11 #6), shared with the stream and
# cross-plane agreement tests
from tests.foreign_fixtures import mk_foreign_delta as _mk_partitioned_delta  # noqa: E402,E501


def test_external_dml_on_partitioned_table(spark, tmp_path):
    """Per-partition COW DML (VERDICT r10 #2, the 'better' path): DELETE
    and UPDATE on a hive-partitioned foreign table rewrite only affected
    files, stamp partitionValues on every new add, keep untouched
    partitions byte-shared, record partitioned CDF — and an UPDATE that
    SETs the partition column moves rows to their new partition."""
    base = tmp_path / "pdelta"
    _mk_partitioned_delta(spark, base, cdf=True)
    r = DeltaLogReader(spark, base)
    assert r.snapshot().partition_columns == ["seg"]

    # DELETE keyed on a data column spanning two partitions
    res = r.delete("k in (1, 4)")
    assert res["rewritten_files"] == 2
    df = read_delta(spark, base)
    assert sorted(x.k for x in df.collect()) == [2, 3, 5, 6]
    snap = DeltaLogReader(spark, base).snapshot()
    assert {a["partitionValues"]["seg"]
            for a in snap.files.values()} == {"A", "B", "C"}
    assert "seg=C/part-C.parquet" in snap.files  # untouched -> shared
    assert {x.k: x.seg for x in df.collect()} == {
        2: "A", 3: "A", 5: "B", 6: "C"}

    # UPDATE with the predicate on the partition column itself — plans
    # DRIVER-SIDE from partitionValues (r11 partition pruning: the
    # planning job never reads data); result identical to the row scan
    res = r.update({"v": "v + 0.5"}, where="seg = 'B'")
    assert res["rewritten_files"] == 1
    rows = {x.k: x.v for x in read_delta(spark, base).collect()}
    assert rows[5] == 50.5 and rows[2] == 20.0

    # UPDATE that SETs the partition column: the row changes partition
    r.update({"seg": "'Z'"}, where="k = 6")
    df = read_delta(spark, base)
    assert [x.seg for x in df.where("k = 6").collect()] == ["Z"]
    snap = DeltaLogReader(spark, base).snapshot()
    assert any(a["partitionValues"].get("seg") == "Z"
               for a in snap.files.values())

    # CDF spans the partitioned DML, partition column populated
    ch = r.table_changes(1, 3).collect()
    assert sorted(x.k for x in ch if x["_change_type"] == "delete") == [1, 4]
    assert all(x.seg is not None for x in ch), ch
    moved = [x for x in ch if x["_change_type"] == "update_postimage"
             and x.k == 6]
    assert [x.seg for x in moved] == ["Z"]

    # partition-pruned read works on the rewritten layout
    got = DeltaLogReader(spark, base).to_df(filters=[("seg", "=", "Z")])
    assert [x.k for x in got.collect()] == [6]

    # MIXED predicate (partition + data column) falls back to the scan
    # planner and still answers correctly
    r2 = DeltaLogReader(spark, base)
    res = r2.delete("seg = 'A' AND v > 25.0")  # deletes k=3 only
    assert res["rewritten_files"] == 1
    assert sorted(x.k for x in read_delta(spark, base).collect()) \
        == [2, 5, 6]


def test_external_merge_on_partitioned_table(spark, tmp_path):
    """MERGE on a partitioned foreign table: matched files rewrite in
    place, inserts land in their partitions with partitionValues."""
    base = tmp_path / "pdelta_m"
    _mk_partitioned_delta(spark, base)
    r = DeltaLogReader(spark, base)
    src = spark.createDataFrame(
        [{"k": 2, "v": 99.0, "seg": "A"},
         {"k": 7, "v": 70.0, "seg": "B"}],
        "k long, v double, seg string")
    res = r.merge(src, "t.k = s.k")
    assert res["rewritten_files"] == 1 and res["inserted_rows"] == 1
    rows = {x.k: (x.v, x.seg)
            for x in read_delta(spark, base).collect()}
    assert rows[2] == (99.0, "A") and rows[7] == (70.0, "B")
    assert rows[4] == (40.0, "B")  # untouched partition intact
    snap = DeltaLogReader(spark, base).snapshot()
    assert "seg=C/part-C.parquet" in snap.files
    # every live add carries its partition value
    assert all("seg" in (a.get("partitionValues") or {})
               for a in snap.files.values())


def test_partition_only_planning_never_reads_data(spark, tmp_path, monkeypatch):
    """r11: a DML predicate referencing ONLY partition columns plans
    driver-side from partitionValues — the planner must never open a
    data file. Pinned by making every to_df call explode during a
    dry-run plan."""
    base = tmp_path / "pplan"
    _mk_partitioned_delta(spark, base)
    r = DeltaLogReader(spark, base)

    def boom(*a, **k):
        raise AssertionError("partition-only planning read data")

    monkeypatch.setattr(r, "to_df", boom)
    plan = r.delete("seg = 'B'", dry_run=True)
    assert plan["rewritten_files"] == 1  # exactly the seg=B file
    plan = r.delete("seg in ('A', 'C')", dry_run=True)
    assert plan["rewritten_files"] == 2
    # a data-column predicate falls back to the scan (and trips the boom)
    with pytest.raises(AssertionError, match="read data"):
        r.delete("v > 0", dry_run=True)


def test_partitioned_dml_under_column_mapping(spark, tmp_path):
    """Partitioned + COLUMN-MAPPED foreign table (the combined input
    class): metadata.partitionColumns hold LOGICAL names, add
    partitionValues key by PHYSICAL name, data files store physical
    column names with the partition column absent. DML plans partition-
    only predicates from the physical-keyed partitionValues, rewrites
    per partition with physical-named dirs, and the read round-trips."""
    base = tmp_path / "pm_delta"
    _mk_partitioned_delta(spark, base, column_mapped=True)

    r = DeltaLogReader(spark, base)
    got = read_delta(spark, base)
    assert {x.k: x.seg for x in got.collect()} == {
        1: "A", 2: "A", 3: "A", 4: "B", 5: "B", 6: "C"}

    # partition-only predicate: plans from the PHYSICAL-keyed pv map
    res = r.update({"v": "v + 0.5"}, where="seg = 'B'")
    assert res["rewritten_files"] == 1
    rows = {x.k: x.v for x in read_delta(spark, base).collect()}
    assert rows[4] == 40.5 and rows[1] == 10.0
    # the rewritten add keys partitionValues by the PHYSICAL name
    snap = DeltaLogReader(spark, base).snapshot()
    assert any((a.get("partitionValues") or {}).get("col-seg") == "B"
               for a in snap.files.values())
    # mixed predicate falls back to the scan and still answers right
    r2 = DeltaLogReader(spark, base)
    r2.delete("seg = 'A' AND v > 15.0")
    assert sorted(x.k for x in read_delta(spark, base).collect()) \
        == [1, 4, 5, 6]
    # the rewritten files store PHYSICAL column names
    import pyarrow.parquet as pq
    newest = max(
        (p for p in base.rglob("*.parquet") if "_delta_log" not in p.parts),
        key=lambda p: p.stat().st_mtime)
    names = set(pq.ParquetFile(newest).schema_arrow.names)
    assert "col-k" in names and "seg" not in names and "k" not in names


def test_mixed_predicate_prunes_candidates_before_scan(spark, tmp_path,
                                                       monkeypatch):
    """r12: a DML predicate mixing a partition conjunct with a data
    conjunct must not scan the table — the partition-only top-level AND
    conjuncts prune candidates driver-side (sound superset: a matching
    row satisfies every conjunct) and the exact scan runs over the
    candidates only. Pinned by spying on to_df's _paths."""
    base = tmp_path / "mixed"
    _mk_partitioned_delta(spark, base)
    r = DeltaLogReader(spark, base)
    want = {str((base / p).resolve())
            for p, a in r.snapshot().files.items()
            if a["partitionValues"]["seg"] == "B"}
    seen = []
    real = r.to_df

    def spy(*a, **k):
        seen.append(k.get("_paths"))
        return real(*a, **k)

    monkeypatch.setattr(r, "to_df", spy)
    res = r.delete("seg = 'B' AND v > 45.0")
    assert res["rewritten_files"] == 1
    assert seen and all(p is not None and p <= want for p in seen), \
        [None if p is None else len(p) for p in seen]
    rows = sorted(x.k for x in read_delta(spark, base).collect())
    assert rows == [1, 2, 3, 4, 6]  # only (5, 50.0, 'B') matched
    # TOP-LEVEL OR defeats conjunct pruning entirely (r12 review: AND
    # binds tighter, so "a AND b OR c" makes `a` NOT a required
    # conjunct) — rows matching only the OR branch must still delete
    r2 = DeltaLogReader(spark, base)
    res2 = r2.delete("seg = 'B' AND v > 39.0 OR seg = 'C'")
    assert res2["rewritten_files"] == 2  # the B file AND the C file
    assert sorted(x.k for x in read_delta(spark, base).collect()) \
        == [1, 2, 3]
