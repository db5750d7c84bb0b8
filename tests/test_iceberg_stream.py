"""Streaming FROM an external Iceberg v2 table via the `icebergtable`
Python Data Source — sequence-number offsets over the snapshot chain,
incremental ADDED-manifest planning, full-snapshot initial catch-up after
expiration, gap/delete gating, name-mapping renames."""

from __future__ import annotations

import pytest

from lakehouses_spark.tables import LakeTable
from lakehouses_spark.tables.iceberg_meta import (
    IcebergMetadataReader,
    read_iceberg,
)
from lakehouses_spark.tables.iceberg_stream import (
    IcebergStreamReader,
    IcebergTableDataSource,
)

ROWS = [
    {"k": i, "status": "AB"[i % 2], "price": float(10 * i)} for i in range(1, 21)
]


def _sorted_rows(df, cols=None):
    cols = sorted(cols or df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def _drain(spark, dest, tmp_path, name, **opts):
    spark.dataSource.register(IcebergTableDataSource)
    out = tmp_path / f"out_{name}"
    reader = spark.readStream.format("icebergtable").option("path", str(dest))
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


def test_stream_appends_and_resume(spark, tmp_path):
    """Append-only snapshot chain drains to the table state; a re-export
    with more appends resumes from the SAME checkpoint and picks up only
    the new sequence numbers."""
    df = spark.createDataFrame(ROWS[:10], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.append(spark.createDataFrame(ROWS[10:15], "k long, status string, price double"))
    dest = t.export_iceberg_metadata(tmp_path / "ice")

    got = _drain(spark, dest, tmp_path, "tail")
    assert _sorted_rows(got) == _sorted_rows(read_iceberg(spark, dest))

    t.append(spark.createDataFrame(ROWS[15:], "k long, status string, price double"))
    t.export_iceberg_metadata(tmp_path / "ice", mode="overwrite")
    got = _drain(spark, dest, tmp_path, "tail")  # same checkpoint
    assert sorted(r.k for r in got.collect()) == list(range(1, 21))


def test_stream_skips_replace_snapshots(spark, tmp_path):
    """ADVICE r9: rewrite_data_files commits a `replace` snapshot — data
    unchanged, only its layout. A tailing stream must skip it (the
    Spark-Iceberg source's compaction rule): no error without
    ignoreChanges, and NO re-emission of the compacted table."""
    df = spark.createDataFrame(ROWS[:10], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.append(spark.createDataFrame(
        ROWS[10:15], "k long, status string, price double"))
    dest = t.export_iceberg_metadata(tmp_path / "ice")

    got = _drain(spark, dest, tmp_path, "replace")
    assert sorted(r.k for r in got.collect()) == list(range(1, 16))

    r = IcebergMetadataReader(spark, dest)
    assert len(r.live_files()) >= 2
    res = r.rewrite_data_files(target_files=1)
    assert res["output_files"] == 1

    # same checkpoint across the compaction: nothing new streams
    got = _drain(spark, dest, tmp_path, "replace")
    assert sorted(r.k for r in got.collect()) == list(range(1, 16))


def test_stream_plans_main_ancestry_not_branch_heads(spark, tmp_path):
    """ADVICE r9: offsets/planning walk the parent chain from the `main`
    ref, not the global sequence-ordered snapshot list — a branch-only
    snapshot with a higher sequence number must not become the stream's
    opening state (nor feed branch commits into the main tail)."""
    import json as _json
    from lakehouses_spark.tables.iceberg_stream import _current_meta, _meta_dir

    df = spark.createDataFrame(ROWS[:10], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.append(spark.createDataFrame(
        ROWS[10:], "k long, status string, price double"))
    dest = t.export_iceberg_metadata(tmp_path / "ice")

    # graft a branch-only snapshot ON TOP of snapshot 0 (its manifest list
    # re-used — the branch head sees only the first 10 rows) with the
    # HIGHEST sequence number, referenced by an `audit` branch ref
    md = _meta_dir(str(dest))
    hint = md / "version-hint.text"
    meta_path = md / f"v{hint.read_text().strip()}.metadata.json"
    meta = _json.loads(meta_path.read_text())
    snaps = sorted(meta["snapshots"], key=lambda s: s["sequence-number"])
    branch = {
        "snapshot-id": 999001,
        "parent-snapshot-id": snaps[0]["snapshot-id"],
        "sequence-number": snaps[-1]["sequence-number"] + 1,
        "timestamp-ms": snaps[-1]["timestamp-ms"] + 1,
        "manifest-list": snaps[0]["manifest-list"],
        "summary": {"operation": "append"},
        "schema-id": snaps[0].get("schema-id", 0),
    }
    meta["snapshots"].append(branch)
    meta.setdefault("refs", {})["audit"] = {
        "snapshot-id": 999001, "type": "branch",
    }
    meta_path.write_text(_json.dumps(meta))
    assert _current_meta(str(dest))["refs"]["audit"]["snapshot-id"] == 999001

    # the stream opens on the MAIN head (all 20 rows), not the branch
    # head (10 rows) that the old global-sequence ordering would pick
    got = _drain(spark, dest, tmp_path, "branch")
    assert sorted(r.k for r in got.collect()) == list(range(1, 21))


def test_initial_catchup_after_expiration(spark, tmp_path):
    """Older snapshots expired: the first batch reads the CURRENT snapshot
    (whose manifests list the older files as EXISTING), then tails
    incrementally — no data lost."""
    df = spark.createDataFrame(ROWS[:5], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.append(spark.createDataFrame(ROWS[5:10], "k long, status string, price double"))
    t.append(spark.createDataFrame(ROWS[10:15], "k long, status string, price double"))
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    IcebergMetadataReader(spark, dest).expire_snapshots(keep_last=2)

    got = _drain(spark, dest, tmp_path, "exp")
    assert sorted(r.k for r in got.collect()) == list(range(1, 16))


def test_initial_snapshot_tolerates_dml_history(spark, tmp_path):
    """Iceberg-source semantics: the INITIAL batch is the CURRENT
    snapshot's live entries, so COW DML anywhere in history streams
    cleanly from scratch — exact rows, no ignoreChanges needed."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("k > 15")  # copy-on-write delete IN HISTORY
    t.update({"price": "price * 2"}, where="k <= 3")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    got = _drain(spark, dest, tmp_path, "hist")
    assert _sorted_rows(got) == _sorted_rows(read_iceberg(spark, dest))


def test_stream_fails_on_delete_unless_ignore_changes(spark, tmp_path):
    """POST-START delete snapshots break the append-only tail; ACTIVE
    position deletes at start gate on ignoreChanges."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    _drain(spark, dest, tmp_path, "del")           # checkpoint at head
    t.delete("k > 15")                             # COW delete AFTER start
    t.export_iceberg_metadata(tmp_path / "ice", mode="overwrite")
    with pytest.raises(Exception, match="ignoreChanges"):
        _drain(spark, dest, tmp_path, "del")       # resume hits the delete
    got = _drain(spark, dest, tmp_path, "del2", ignoreChanges="true")
    # fresh drain reads the (clean) current snapshot
    assert {r.k for r in got.collect()} >= {r.k for r in t.read().collect()}

    t2 = LakeTable.create(
        spark, tmp_path / "lake2",
        spark.createDataFrame(ROWS, "k long, status string, price double"))
    t2.delete("k > 15", lazy=True)                 # ACTIVE position deletes
    dest2 = t2.export_iceberg_metadata(tmp_path / "ice2")
    with pytest.raises(Exception, match="position/equality deletes"):
        _drain(spark, dest2, tmp_path, "mor")
    got2 = _drain(spark, dest2, tmp_path, "mor2", ignoreChanges="true")
    assert {r.k for r in got2.collect()} >= {r.k for r in t2.read().collect()}


def test_resume_into_expired_gap_fails_loudly(spark, tmp_path):
    df = spark.createDataFrame(ROWS[:5], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    for lo in (5, 10, 15):
        t.append(spark.createDataFrame(
            ROWS[lo:lo + 5], "k long, status string, price double"))
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    seqs = sorted(s["sequence-number"] for s in r.meta["snapshots"])
    reader = IcebergStreamReader(str(dest), read_iceberg(spark, dest).schema)
    # processed through seqs[0]; snapshots up to seqs[-2] then expire
    r.expire_snapshots(keep_last=1)
    with pytest.raises(RuntimeError, match="expired"):
        reader.partitions({"seq": seqs[0]}, {"seq": seqs[-1]})


def test_rename_surfaces_logical_names(spark, tmp_path):
    df = spark.createDataFrame(ROWS[:8], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.alter_rename_column("price", "amount")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    got = _drain(spark, dest, tmp_path, "ren")
    assert "amount" in got.columns and "price" not in got.columns
    assert _sorted_rows(got) == _sorted_rows(t.read())


def test_batch_read_refused_with_pointer(spark, tmp_path):
    df = spark.createDataFrame(ROWS[:4], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    spark.dataSource.register(IcebergTableDataSource)
    with pytest.raises(Exception, match="read_iceberg"):
        spark.read.format("icebergtable").option("path", str(dest)).load().collect()


# ----------------------------- changelog mode ----------------------------- #
def _drain_changelog(spark, dest, tmp_path, name):
    return _drain(spark, dest, tmp_path, name, readChangeFeed="true")


def _apply_feed(rows, key_cols):
    """Reduce an INSERT/DELETE multiset to the surviving row multiset."""
    from collections import Counter

    c = Counter()
    for r in rows:
        k = tuple(r[c_] for c_ in key_cols)
        c[k] += 1 if r["_change_type"] == "INSERT" else -1
    assert all(v >= 0 for v in c.values()), c
    return Counter({k: v for k, v in c.items() if v > 0})


def test_changelog_cow_update_delete(spark, tmp_path):
    """COW arc: UPDATE emits its DELETE(old)+INSERT(new) pair at one
    ordinal, DELETE emits removed rows; replaying the feed reproduces the
    final table exactly."""
    from collections import Counter

    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.update({"price": "price * 2"}, where="k <= 3")
    t.delete("k > 17")
    dest = t.export_iceberg_metadata(tmp_path / "ice")

    got = _drain_changelog(spark, dest, tmp_path, "cl")
    rows = [r.asDict() for r in got.collect()]
    cols = ["k", "status", "price"]
    final = Counter(
        tuple(r[c] for c in cols) for r in t.read().collect()
    )
    assert _apply_feed(rows, cols) == final
    # the update's pair shares one ordinal; old and new price both present
    upd = [r for r in rows if r["k"] == 1]
    assert {r["_change_type"] for r in upd} == {"INSERT", "DELETE"}
    ords = {r["_change_ordinal"] for r in upd if r["price"] in (20.0, 10.0)
            and r["_change_ordinal"] > 1}
    assert len(ords) == 1  # DELETE(10.0) + INSERT(20.0) at the update commit
    # ordinals are the snapshot sequence numbers: monotone from 1
    assert min(r["_change_ordinal"] for r in rows) == 1


def test_changelog_skips_replace_snapshots(spark, tmp_path):
    """Compaction is not change data: after rewrite_data_files, the
    changelog tail emits NOTHING (no DELETE+INSERT churn for the
    rewritten layout)."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.append(spark.createDataFrame(
        [{"k": 100, "status": "Z", "price": 1.0}],
        "k long, status string, price double"))
    dest = t.export_iceberg_metadata(tmp_path / "ice")

    got = _drain_changelog(spark, dest, tmp_path, "clr")
    n_before = got.count()
    assert n_before == 21 and set(
        r["_change_type"] for r in got.collect()
    ) == {"INSERT"}

    r = IcebergMetadataReader(spark, dest)
    res = r.rewrite_data_files(target_files=1)
    assert res["output_files"] == 1
    got = _drain_changelog(spark, dest, tmp_path, "clr")  # same checkpoint
    assert got.count() == n_before


def test_changelog_mor_position_deletes(spark, tmp_path):
    """A merge-on-read tombstone emits exactly the targeted rows as DELETE
    (read back through the position-delete file), no rewrite needed."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("k > 15", lazy=True)
    dest = t.export_iceberg_metadata(tmp_path / "ice")

    got = _drain_changelog(spark, dest, tmp_path, "mor")
    dels = [r for r in got.collect() if r["_change_type"] == "DELETE"]
    assert sorted(r.k for r in dels) == list(range(16, 21))
    assert {r["_change_ordinal"] for r in dels} == {2}
    from collections import Counter

    cols = ["k", "status", "price"]
    final = Counter(tuple(r[c] for c in cols) for r in t.read().collect())
    assert _apply_feed([r.asDict() for r in got.collect()], cols) == final


def test_changelog_pos_deletes_join_full_path_not_basename(spark, tmp_path):
    """ADVICE r9: two data files in different dirs sharing a BASENAME
    (compaction outputs are all part-00000.parquet) must not cross-match
    in the position-delete semi-join — a position targeting file A would
    otherwise also delete the same row index of file B, emitting wrong
    DELETE rows."""
    from lakehouses_spark.functions.avro_py import read_ocf_bytes
    from lakehouses_spark.tables.iceberg_meta import (
        _MANIFEST_ENTRY_SCHEMA,
        write_ocf_bytes_with_meta,
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = LakeTable.create(
        spark, tmp_path / "lake",
        spark.createDataFrame(
            ROWS[:10], "k long, status string, price double").coalesce(1),
        num_files=1,
    )
    t.append(spark.createDataFrame(
        ROWS[10:], "k long, status string, price double").coalesce(1))
    t.delete("k <= 3", lazy=True)  # MOR: positions 0-2 of the FIRST file
    dest = t.export_iceberg_metadata(tmp_path / "ice")

    # surgery: rename both commit dirs' data files to ONE basename, then
    # rewrite every path that mentions them (data manifests + the
    # pos-delete parquet's file_path column)
    import json as _json
    meta = _json.loads(sorted(
        (dest / "metadata").glob("v*.metadata.json"),
        key=lambda p: int(p.name.split(".")[0][1:]))[-1].read_text())
    loc = meta["location"].rstrip("/")
    rename: dict[str, str] = {}
    for p in sorted(dest.rglob("*.parquet")):
        if p.parent == dest / "data" or "_delta_log" in p.parts \
                or "metadata" in p.parts:
            continue  # flat data/ holds the pos-delete parquet; skip it
        new = p.parent / "part-00000.snappy.parquet"
        rel_old = p.relative_to(dest).as_posix()
        rel_new = new.relative_to(dest).as_posix()
        p.rename(new)
        rename[f"{loc}/{rel_old}"] = f"{loc}/{rel_new}"
    assert len(rename) == 2, rename

    for mf in (dest / "metadata").glob("*.avro"):
        schema, rows = read_ocf_bytes(mf.read_bytes())
        if not rows or "data_file" not in rows[0]:
            continue  # manifest list — manifest paths unchanged
        changed = False
        for e in rows:
            fp = e["data_file"]["file_path"]
            if fp in rename:
                e["data_file"]["file_path"] = rename[fp]
                changed = True
        if changed:
            mf.write_bytes(write_ocf_bytes_with_meta(
                rows, _MANIFEST_ENTRY_SCHEMA,
                {"partition-spec": "[]", "partition-spec-id": "0",
                 "format-version": "2", "content": "data"},
            ))
    for pd_file in (dest / "data").glob("*.parquet"):
        tbl = pq.read_table(pd_file)
        fps = [rename.get(v, v) for v in tbl.column("file_path").to_pylist()]
        pq.write_table(
            tbl.set_column(
                tbl.schema.get_field_index("file_path"), "file_path",
                pa.array(fps, tbl.schema.field("file_path").type)),
            pd_file,
        )

    # reads still resolve (paths consistent after surgery)
    assert sorted(r.k for r in read_iceberg(spark, dest).collect()) \
        == list(range(4, 21))
    # the changelog's DELETE set is EXACTLY the targeted file's rows —
    # a basename join would also emit k=11..13 (same positions, file 2)
    cl = IcebergMetadataReader(spark, dest).changelog()
    dels = sorted(r.k for r in cl.collect() if r["_change_type"] == "DELETE")
    assert dels == [1, 2, 3]


def test_changelog_unreproducible_cases_fail_loudly(spark, tmp_path):
    """(1) COW-removing a file earlier position deletes targeted cannot be
    replayed from manifests alone; (2) an initial snapshot with ACTIVE
    position deletes cannot open as a full-snapshot INSERT set."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("k > 15", lazy=True)
    t.materialize_tombstones()  # rewrites the DV-targeted files
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    with pytest.raises(Exception, match="position deletes already targeted"):
        _drain_changelog(spark, dest, tmp_path, "bad")

    t2 = LakeTable.create(
        spark, tmp_path / "lake2",
        spark.createDataFrame(ROWS, "k long, status string, price double"))
    t2.delete("k > 15", lazy=True)
    dest2 = t2.export_iceberg_metadata(tmp_path / "ice2")
    IcebergMetadataReader(spark, dest2).expire_snapshots(keep_last=1)
    with pytest.raises(Exception, match="active position deletes"):
        _drain_changelog(spark, dest2, tmp_path, "bad2")


def test_incremental_planning_decodes_only_new_manifests(
        spark, tmp_path, monkeypatch):
    """Scale pin: planning a 1-snapshot batch decodes exactly TWO Avro
    files — the new snapshot's manifest list and its ONE added manifest —
    never the reused manifests of prior snapshots. At 100× (thousands of
    snapshots, thousands of manifests) per-batch planning stays O(new)."""
    import lakehouses_spark.functions.avro_py as avro_py

    df = spark.createDataFrame(ROWS[:5], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    for lo in (5, 10, 15):
        t.append(spark.createDataFrame(
            ROWS[lo:lo + 5], "k long, status string, price double"))
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    seqs = sorted(s["sequence-number"] for s in r.meta["snapshots"])
    reader = IcebergStreamReader(str(dest), read_iceberg(spark, dest).schema)

    calls = []
    real = avro_py.read_ocf_bytes
    monkeypatch.setattr(
        avro_py, "read_ocf_bytes",
        lambda b: (calls.append(1), real(b))[1],
    )
    slices = reader.partitions({"seq": seqs[-2]}, {"seq": seqs[-1]})
    assert len(calls) == 2, f"decoded {len(calls)} OCF files, want 2"
    assert len(slices) >= 1 and all(s.path for s in slices)


def test_batch_changelog_matches_stream(spark, tmp_path):
    """IcebergMetadataReader.changelog (batch) returns exactly the rows
    the streamed changelog drains — COW update pair, MOR position-delete
    rows, full-insert opening state — and (from_seq, to_seq] windows
    select the right slice."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.update({"price": "price * 2"}, where="k <= 3")
    t.delete("k > 17", lazy=True)
    dest = t.export_iceberg_metadata(tmp_path / "ice")

    streamed = _drain_changelog(spark, dest, tmp_path, "bvs")
    batch = IcebergMetadataReader(spark, dest).changelog()
    cols = ["k", "status", "price", "_change_type", "_change_ordinal",
            "_commit_snapshot_id"]
    assert _sorted_rows(batch, cols) == _sorted_rows(streamed, cols)

    # windowed: only the MOR delete commit (last sequence number)
    r = IcebergMetadataReader(spark, dest)
    seqs = sorted(s["sequence-number"] for s in r.meta["snapshots"])
    win = r.changelog(from_seq=seqs[-2], to_seq=seqs[-1])
    rows = win.collect()
    assert {x["_change_type"] for x in rows} == {"DELETE"}
    assert sorted(x.k for x in rows) == list(range(18, 21))


# ------- round-11: foreign PARTITIONED manifests tail and changelog ------- #
def _make_foreign_partitioned(spark, tmp_path, dest_name):
    """Hand-built partitioned foreign table (the `.partitions` fixture):
    manifest entries carry non-empty partition records under a re-encoded
    Avro schema — what a real identity-partitioned writer publishes. Data
    files keep all columns (Iceberg, unlike Delta, stores identity
    partition source columns in the files)."""
    import copy
    import json

    from lakehouses_spark.functions.avro_py import read_ocf_bytes
    from lakehouses_spark.tables.iceberg_meta import (
        _MANIFEST_ENTRY_SCHEMA,
        write_ocf_bytes_with_meta,
    )

    t = LakeTable.create(
        spark, tmp_path / f"lake_{dest_name}",
        spark.createDataFrame(
            ROWS[:10], "k long, status string, price double").coalesce(1),
        num_files=1,
    )
    t.append(spark.createDataFrame(
        ROWS[10:], "k long, status string, price double").coalesce(1))
    dest = t.export_iceberg_metadata(tmp_path / dest_name)

    part_schema = copy.deepcopy(_MANIFEST_ENTRY_SCHEMA)
    for f in part_schema["fields"]:
        if f["name"] == "data_file":
            for g in f["type"]["fields"]:
                if g["name"] == "partition":
                    g["type"]["fields"] = [{
                        "name": "status", "type": ["null", "string"],
                        "field-id": 1000,
                    }]
    stamped = 0
    for mf in sorted((dest / "metadata").glob("*.avro")):
        _, rows = read_ocf_bytes(mf.read_bytes())
        if not rows or "data_file" not in rows[0]:
            continue
        for e in rows:
            if e["data_file"].get("content", 0) == 0:
                e["data_file"]["partition"] = {"status": "p%d" % stamped}
                stamped += 1
        mf.write_bytes(write_ocf_bytes_with_meta(
            rows, part_schema,
            {"partition-spec": "[]", "partition-spec-id": "0",
             "format-version": "2", "content": "data"},
        ))
    assert stamped >= 2
    # the table metadata declares the matching identity spec
    metas = sorted(
        (dest / "metadata").glob("v*.metadata.json"),
        key=lambda p: int(p.name.split(".")[0][1:]),
    )
    m = json.loads(metas[-1].read_text())
    m["partition-specs"] = [{"spec-id": 0, "fields": [
        {"name": "status", "transform": "identity",
         "source-id": 2, "field-id": 1000}]}]
    m["default-spec-id"] = 0
    metas[-1].write_text(json.dumps(m))
    return dest


def test_tail_foreign_partitioned_table(spark, tmp_path):
    """VERDICT r10 #6: a foreign table whose manifests carry partition
    tuples tails cleanly — entries decode under the widened partition
    record, and every column (including the identity-partitioned one)
    round-trips from the data files."""
    dest = _make_foreign_partitioned(spark, tmp_path, "ice_pt")
    got = _drain(spark, dest, tmp_path, "pt_tail")
    assert _sorted_rows(got) == _sorted_rows(read_iceberg(spark, dest))
    assert sorted(r.k for r in got.collect()) == list(range(1, 21))


def test_changelog_foreign_partitioned_table(spark, tmp_path):
    """The changelog twin: both streaming and batch changelog plan over
    partition-stamped manifests; INSERT rows carry the partition source
    column values from the files."""
    dest = _make_foreign_partitioned(spark, tmp_path, "ice_pc")
    streamed = _drain_changelog(spark, dest, tmp_path, "pc_cl")
    assert {x["_change_type"] for x in streamed.collect()} == {"INSERT"}
    assert sorted(x.k for x in streamed.collect()) == list(range(1, 21))
    assert all(x.status in ("A", "B") for x in streamed.collect())
    batch = IcebergMetadataReader(spark, dest).changelog()
    cols = ["k", "status", "price", "_change_type"]
    assert _sorted_rows(batch, cols) == _sorted_rows(streamed, cols)
