"""Iceberg v2 metadata export / independent read (VERDICT r6 #2).

Contract: a LakeTable exported with `export_iceberg_metadata` is a
spec-conformant Iceberg table — `metadata/v*.metadata.json` parses with
NOTHING but stdlib json, the `snap-*.avro` manifest lists and `*-m0.avro`
manifests parse with the in-repo pure-Python Avro OCF codec (the same files
03.iceberg_primer.py:411-456 reads with spark-avro), snapshot time travel
matches LakeTable version time travel, and the independent
`IcebergMetadataReader` reconstructs every snapshot plus the `snapshots` /
`manifests` / `metadata_log_entries` / `history` metadata tables the
reference queries (03.iceberg_primer.py:376-404).
"""

from __future__ import annotations

import json

import duckdb
import pytest

from pyspark.sql import functions as F

from lakehouses_spark.functions.avro_py import read_ocf_bytes
from lakehouses_spark.tables import LakeTable
from lakehouses_spark.tables.iceberg_meta import (
    IcebergExportError,
    IcebergFormatError,
    IcebergMetadataReader,
    read_iceberg,
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
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def test_export_roundtrip_current_and_snapshots(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    # final snapshot matches the LakeTable read
    assert _sorted_rows(read_iceberg(spark, dest)) == _sorted_rows(t.read())
    # snapshot ids are version+1: each data-changing LakeTable version is
    # reachable via time travel and matches the LakeTable at that version
    snaps = {s["snapshot-id"] for s in r.meta["snapshots"]}
    for v in range(t.version + 1):
        if (v + 1) in snaps:
            assert _sorted_rows(r.to_df(snapshot_id=v + 1)) == _sorted_rows(
                t.read(version=v)
            ), v


def test_metadata_json_is_stdlib_parseable_and_spec_shaped(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    meta_dir = dest / "metadata"
    hint = int((meta_dir / "version-hint.text").read_text())
    assert hint == t.version + 1
    meta = json.loads((meta_dir / f"v{hint}.metadata.json").read_text())
    assert meta["format-version"] == 2
    assert meta["current-schema-id"] == max(s["schema-id"] for s in meta["schemas"])
    assert meta["partition-specs"] == [{"spec-id": 0, "fields": []}]
    assert meta["current-snapshot-id"] == meta["snapshots"][-1]["snapshot-id"]
    # sequence numbers are monotonic, parents chain
    seqs = [s["sequence-number"] for s in meta["snapshots"]]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    for prev, cur in zip(meta["snapshots"], meta["snapshots"][1:]):
        assert cur["parent-snapshot-id"] == prev["snapshot-id"]
    # one metadata file per LakeTable version; metadata-log lists the priors
    assert len(list(meta_dir.glob("v*.metadata.json"))) == t.version + 1
    assert len(meta["metadata-log"]) == t.version
    # name mapping present (Spark parquet has no field ids — spec mechanism)
    nm = json.loads(meta["properties"]["schema.name-mapping.default"])
    assert {m["names"][0] for m in nm} >= {"k", "status", "price"}


def test_manifests_parse_with_pure_python_avro(spark, tmp_path):
    """The exact inspection the reference does with spark-avro
    (03.iceberg_primer.py:433,452-456), done with the in-repo codec and no
    Spark involvement at all."""
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    meta = json.loads(
        (dest / "metadata" / f"v{t.version + 1}.metadata.json").read_text()
    )
    snap = meta["snapshots"][-1]
    ml_path = dest / "metadata" / snap["manifest-list"].rsplit("/metadata/", 1)[1]
    schema, ml_rows = read_ocf_bytes(ml_path.read_bytes())
    assert schema["name"] == "manifest_file"
    assert all(m["content"] == 0 for m in ml_rows)
    total_live = 0
    for m in ml_rows:
        man_path = dest / "metadata" / m["manifest_path"].rsplit("/metadata/", 1)[1]
        eschema, entries = read_ocf_bytes(man_path.read_bytes())
        assert eschema["name"] == "manifest_entry"
        for e in entries:
            assert e["data_file"]["file_format"] == "PARQUET"
            assert e["data_file"]["content"] == 0
        total_live += sum(1 for e in entries if e["status"] != 2)
    assert total_live == len(meta and ml_rows) or total_live > 0
    # live manifest entries cover exactly the reader's live files
    r = IcebergMetadataReader(spark, dest)
    assert total_live == len(r.live_files())


def test_external_client_proof_duckdb_reads_live_files(spark, tmp_path):
    """stdlib JSON + pure-Python Avro resolve the live files; DuckDB reads
    them with no engine involvement and matches the LakeTable."""
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    paths = [str(r._local_data(f["file_path"])) for f in r.live_files()]
    con = duckdb.connect()
    n, total = con.execute(
        "SELECT count(*), sum(k) FROM read_parquet(?, union_by_name=true)",
        [paths],
    ).fetchone()
    want = t.read().agg(
        F.count(F.lit(1)).alias("n"), F.sum("k").alias("s")
    ).collect()[0]
    assert (n, total) == (want["n"], want["s"])


def test_metadata_tables_shapes(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    snaps = r.snapshots().collect()
    assert [s.operation for s in snaps][0] == "append"
    assert {"delete", "overwrite"} & {s.operation for s in snaps}
    mans = r.manifests().collect()
    # manifest REUSE: one manifest per surviving data-changing commit
    assert len(mans) >= 1 and all(m.partition_spec_id == 0 for m in mans)
    logs = r.metadata_log_entries().collect()
    assert len(logs) == t.version  # priors only, per spec
    hist = r.history().collect()
    assert all(h.is_current_ancestor for h in hist)  # linear main branch
    files = r.files().collect()
    assert all(f.record_count > 0 for f in files)
    # totals in the files table match the data
    assert sum(f.record_count for f in files) == t.read().count()


def test_schema_evolution_and_rename_keep_field_ids(spark, tmp_path):
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.alter_rename_column("price", "amount")  # metadata-only, id must survive
    t.alter_add_column("note", "string")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    meta = json.loads(
        (dest / "metadata" / f"v{t.version + 1}.metadata.json").read_text()
    )
    first = meta["schemas"][0]
    last = meta["schemas"][-1]
    ids0 = {f["name"]: f["id"] for f in first["fields"]}
    ids1 = {f["name"]: f["id"] for f in last["fields"]}
    assert ids1["amount"] == ids0["price"]  # rename kept the id
    assert ids1["note"] == meta["last-column-id"]  # fresh id for new column
    # data still reads correctly through the independent reader
    got = read_iceberg(spark, dest)
    assert got.where(F.col("amount").isNotNull()).count() == len(ROWS)
    assert got.where(F.col("note").isNotNull()).count() == 0


def test_drop_readd_gets_fresh_field_id(spark, tmp_path):
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.alter_drop_column("price")
    t.alter_add_column("price", "double")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    meta = json.loads(
        (dest / "metadata" / f"v{t.version + 1}.metadata.json").read_text()
    )
    ids0 = {f["name"]: f["id"] for f in meta["schemas"][0]["fields"]}
    ids_last = {f["name"]: f["id"] for f in meta["schemas"][-1]["fields"]}
    assert ids_last["price"] != ids0["price"]  # re-add minted a fresh id
    assert read_iceberg(spark, dest).where(F.col("price").isNotNull()).count() == 0


def test_export_vacuumed_table_fails_before_writing(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "lake")
    t.vacuum()
    dest = tmp_path / "ice"
    with pytest.raises(IcebergExportError, match="vacuumed"):
        t.export_iceberg_metadata(dest)
    assert not dest.exists()


def _with_delete_manifest(spark, tmp_path, delete_file_content: int,
                          deleted_pos: list[int],
                          eq_values: list | None = None,
                          eq_ids: list[int] | None = None,
                          delete_seq: int | None = None,
                          dest_name: str = "ice"):
    """Export a one-snapshot table, then hand-append a DELETE manifest
    (manifest-list content=1) whose entry is a delete file of the given
    data_file.content — 1 = position deletes ((file_path, pos) parquet),
    2 = equality deletes (value-tuple parquet on `status` by default)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lakehouses_spark.tables.iceberg_meta import (
        _MANIFEST_ENTRY_SCHEMA,
        _MANIFEST_LIST_SCHEMA,
        write_ocf_bytes_with_meta,
    )

    t = LakeTable.create(
        spark, tmp_path / f"lake-for-{dest_name}",
        spark.createDataFrame(ROWS, "k long, status string, price double")
        .coalesce(1),
        num_files=1,
    )
    dest = t.export_iceberg_metadata(tmp_path / dest_name)
    meta = json.loads((dest / "metadata" / "v1.metadata.json").read_text())
    snap = meta["snapshots"][-1]
    ml_rel = snap["manifest-list"].rsplit("/metadata/", 1)[1]
    _, ml_rows = read_ocf_bytes((dest / "metadata" / ml_rel).read_bytes())
    # the single data file the export produced (num_files=1)
    _, entries = read_ocf_bytes(
        (dest / "metadata"
         / ml_rows[0]["manifest_path"].rsplit("/metadata/", 1)[1]).read_bytes()
    )
    assert len(entries) == 1
    data_uri = entries[0]["data_file"]["file_path"]
    # write the delete parquet + its manifest
    if delete_file_content == 1:
        del_name = "pos-delete-000.parquet"
        pq.write_table(
            pa.table({"file_path": [data_uri] * len(deleted_pos),
                      "pos": deleted_pos}),
            dest / "data" / del_name,
        )
        n_del = len(deleted_pos)
    else:
        del_name = "eq-delete-000.parquet"
        pq.write_table(
            pa.table({"status": eq_values or ["A"]}), dest / "data" / del_name
        )
        n_del = len(eq_values or ["A"])
    del_entry = {
        "status": 1, "snapshot_id": snap["snapshot-id"],
        "sequence_number": (
            delete_seq if delete_seq is not None else snap["sequence-number"]
        ),
        "file_sequence_number": snap["sequence-number"],
        "data_file": {
            "content": delete_file_content,
            "file_path": f"{meta['location']}/data/{del_name}",
            "file_format": "PARQUET",
            "partition": {},
            "record_count": n_del,
            "file_size_in_bytes": 1,
            "lower_bounds": None, "upper_bounds": None,
            "equality_ids": (
                (eq_ids or [2]) if delete_file_content == 2 else None
            ),
        },
    }
    del_manifest = write_ocf_bytes_with_meta(
        [del_entry], _MANIFEST_ENTRY_SCHEMA, {"content": "deletes"}
    )
    (dest / "metadata" / "deletes-m0.avro").write_bytes(del_manifest)
    ml_rows.append({
        **ml_rows[0],
        "manifest_path": f"{meta['location']}/metadata/deletes-m0.avro",
        "manifest_length": len(del_manifest),
        "content": 1,
    })
    (dest / "metadata" / ml_rel).write_bytes(
        write_ocf_bytes_with_meta(ml_rows, _MANIFEST_LIST_SCHEMA, {})
    )
    return t, dest


def test_position_delete_rows_absent(spark, tmp_path):
    """v2 position deletes (spec "Position Delete Files"): (file_path, pos)
    parquet rows anti-filter the named data file's row ordinals — the
    Iceberg analog of the Delta deletion-vector path."""
    deleted = [0, 3, 17]  # row ordinals in the single data file
    t, dest = _with_delete_manifest(spark, tmp_path, 1, deleted)
    all_rows = sorted(r.k for r in t.read().collect())
    got = sorted(r.k for r in read_iceberg(spark, dest).collect())
    removed = sorted(set(all_rows) - set(got))
    assert len(got) == len(all_rows) - len(deleted)
    assert len(removed) == len(deleted)
    # in-place adoption MATERIALIZES position-deleted files (r8): the
    # converted table reads exactly the delete-filtered source
    t2 = LakeTable.convert_from_iceberg(spark, dest)
    assert sorted(r.k for r in t2.read().collect()) == got


def test_distributed_manifest_decode_matches_driver_walk(spark, tmp_path, monkeypatch):
    """VERDICT r7 #2 (Iceberg side): past the manifest-count threshold the
    OCF decode fans out to executors; both paths must yield identical
    entries (same order, same content routing)."""
    from lakehouses_spark.tables import iceberg_meta as im

    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    snap = r._snapshot(None)
    seq_data, seq_del = r._manifest_rows(snap)
    monkeypatch.setattr(im, "DISTRIBUTED_MANIFEST_THRESHOLD", 0)
    dist_data, dist_del = r._manifest_rows(snap)
    assert dist_data == seq_data
    assert dist_del == seq_del


def test_tombstones_export_as_native_position_deletes(spark, tmp_path):
    """VERDICT r7 #5: a LakeTable with ACTIVE merge-on-read tombstones
    exports WITHOUT materialize_tombstones() — each tombstone becomes a
    native v2 position-delete file + content=1 delete manifest. The reader
    round-trips, time travel shows pre-delete rows, and DuckDB (external
    client, file_row_number anti-join) proves deleted rows absent."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("k > 30", lazy=True)           # tombstone 1
    t.append(spark.createDataFrame([{"k": 200, "status": "Z",
                                     "price": 5.0}],
                                   "k long, status string, price double"))
    t.delete("status = 'B' AND k < 6", lazy=True)   # tombstone 2
    dest = t.export_iceberg_metadata(tmp_path / "ice")

    want = _sorted_rows(t.read())
    assert _sorted_rows(read_iceberg(spark, dest)) == want
    # rows appended AFTER a tombstone are not filtered by it (k=200 > 30)
    assert any(r[0] == 200 for r in want)
    # time travel: the pre-tombstone snapshot still has k>30 rows
    r = IcebergMetadataReader(spark, dest)
    assert r.to_df(snapshot_id=1).where(F.col("k") > 30).count() > 0

    # external-client proof: DuckDB reconstructs the live rows from the
    # data files + position-delete parquet alone
    live = [str(r._local_data(f["file_path"])) for f in r.live_files()]
    dels = [str(r._local_data(d["file_path"]))
            for d in r.position_delete_files()]
    assert dels, "export produced no position-delete files"
    con = duckdb.connect()
    got_n = con.execute(
        """
        WITH data AS (
          SELECT *, filename AS fp, file_row_number AS rn
          FROM read_parquet($live, union_by_name=true, filename=true,
                            file_row_number=true)
        ), dels AS (SELECT file_path, pos FROM read_parquet($dels))
        SELECT count(*) FROM data
        WHERE NOT EXISTS (SELECT 1 FROM dels
                          WHERE dels.file_path = data.fp AND dels.pos = data.rn)
        """,
        {"live": live, "dels": dels},
    ).fetchone()[0]
    assert got_n == len(want)


def test_tombstone_then_materialize_export_roundtrip(spark, tmp_path):
    """materialize_tombstones() after a lazy delete: the delete manifests
    drop out once their target files are rewritten; every snapshot still
    round-trips."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("k > 35", lazy=True)
    t.materialize_tombstones()
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    assert _sorted_rows(read_iceberg(spark, dest)) == _sorted_rows(t.read())
    # after materialization the CURRENT snapshot lists no delete files
    assert r.position_delete_files() == []


def test_row_level_deletes_survive_space_in_table_path(spark, tmp_path):
    """ADVICE r7 (medium): the position-delete uri_map and equality-delete
    seq_map key on raw resolved paths but join against the URL-encoded
    `_metadata.file_path` — a table path with a space previously resurrected
    deleted rows silently. Both delete kinds must apply under such a path."""
    deleted = [1, 4]
    t, dest = _with_delete_manifest(
        spark, tmp_path, 1, deleted, dest_name="ice dir with space"
    )
    assert " " in str(dest)
    got = sorted(r.k for r in read_iceberg(spark, dest).collect())
    assert len(got) == t.read().count() - len(deleted)

    t2, dest2 = _with_delete_manifest(
        spark, tmp_path, 2, [], eq_values=["A"], delete_seq=10**6,
        dest_name="ice eq with space",
    )
    src = t2.read()
    got2 = read_iceberg(spark, dest2)
    assert got2.where(F.col("status") == "A").count() == 0
    assert got2.count() == src.where(F.col("status") != "A").count()


def test_equality_delete_strict_sequence_semantics(spark, tmp_path):
    """Equality deletes (spec "Equality Delete Files"): value-tuple match
    on the equality_ids columns, applying ONLY to data files with a
    strictly smaller data sequence number. With delete seq > data seq all
    status='A' rows vanish; with delete seq == data seq nothing does."""
    t, dest = _with_delete_manifest(
        spark, tmp_path, 2, [], eq_values=["A"], delete_seq=2
    )
    all_rows = {r.k: r.status for r in t.read().collect()}
    got = sorted(r.k for r in read_iceberg(spark, dest).collect())
    assert got == sorted(k for k, s in all_rows.items() if s != "A")
    with pytest.raises(ValueError, match="delete files"):
        LakeTable.convert_from_iceberg(spark, dest)
    # strictly-smaller rule: a delete at the data file's own sequence
    # number does not apply to it
    t2, dest2 = _with_delete_manifest(
        spark, tmp_path / "same_seq", 2, [], eq_values=["A"], delete_seq=1
    )
    assert read_iceberg(spark, dest2).count() == t2.read().count()


def test_equality_delete_unknown_field_ids_fail_loudly(spark, tmp_path):
    from lakehouses_spark.tables.iceberg_meta import IcebergFormatError

    _, dest = _with_delete_manifest(
        spark, tmp_path, 2, [], eq_values=["A"], eq_ids=[999], delete_seq=2
    )
    with pytest.raises(IcebergFormatError, match="unknown field ids"):
        read_iceberg(spark, dest).collect()


def test_moved_table_directory_stays_readable(spark, tmp_path):
    """Manifest URIs embed the export-time absolute location; the reader
    re-roots them so a copied/moved table directory still reads."""
    import shutil as _sh

    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    moved = tmp_path / "elsewhere" / "ice2"
    moved.parent.mkdir()
    _sh.copytree(dest, moved)
    assert _sorted_rows(read_iceberg(spark, moved)) == _sorted_rows(t.read())


def test_convert_from_iceberg_roundtrip(spark, tmp_path):
    """Export → adopt in place → the adopted LakeTable reads identically and
    keeps DML working (the full S6-sibling arc, both directions)."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("k > 35")
    t.alter_rename_column("price", "amount")  # mapping must carry over
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    t2 = LakeTable.convert_from_iceberg(spark, dest)
    assert _sorted_rows(t2.read()) == _sorted_rows(t.read())
    assert t2.state().column_mapping == {"amount": "price"}
    # adopted table stays a fully working LakeTable
    t2.delete("k <= 5")
    assert t2.read().count() == t.read().count() - 5
    # double adoption refuses
    with pytest.raises(FileExistsError, match="already a lake table"):
        LakeTable.convert_from_iceberg(spark, dest)


def test_to_df_column_pruning(spark, tmp_path):
    """r8 parity with the Delta reader: columns= shrinks the ReadSchema to
    the requested logical columns (filter columns read but not returned),
    values identical to the unpruned read."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df,
                         partition_by=["k"], num_files=4)
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    got = r.to_df(filters=[("k", "<=", 10)], columns=["status"])
    assert got.columns == ["status"]
    assert sorted(x.status for x in got.collect()) == sorted(
        x.status for x in t.read().where(F.col("k") <= 10).collect()
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "price" not in plan.split("ReadSchema")[-1]
    from lakehouses_spark.tables.iceberg_meta import IcebergFormatError

    with pytest.raises(IcebergFormatError, match="unknown column"):
        r.to_df(columns=["nope"])


def test_convert_from_iceberg_carries_bounds_as_stats(spark, tmp_path):
    """r8: manifest lower/upper bounds decode into LakeTable min/max stats
    (keyed by PHYSICAL name), so stats-based file skipping works on the
    adopted table without a stats recompute."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(
        spark, tmp_path / "lake", df, partition_by=["k"], num_files=4
    )
    t.alter_rename_column("price", "amount")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    t2 = LakeTable.convert_from_iceberg(spark, dest)
    st = t2.state()
    per_file = [a["stats"] for a in st.files.values()]
    assert all("k" in s and "price" in s for s in per_file)  # physical names
    ks = [(s["k"]["min"], s["k"]["max"]) for s in per_file]
    assert all(lo is not None and hi is not None for lo, hi in ks)
    # k-clustered export → disjoint ranges → a point filter prunes files
    rows = t2.read(filters=[("k", "=", 1)]).collect()
    assert [r.k for r in rows] == [1]
    assert sum(1 for lo, hi in ks if lo <= 1 <= hi) < len(ks)


def test_manifest_reuse_across_snapshots(spark, tmp_path):
    """Real-Iceberg manifest economics: an append writes ONE new manifest
    and references the previous snapshot's manifests unchanged; a delete
    rewrites only the touched manifest. Per-snapshot metadata work is
    O(changed files), not O(table files)."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.append(spark.createDataFrame(
        [{"k": 200 + i, "status": "Z", "price": 1.0} for i in range(5)],
        "k long, status string, price double"))
    t.append(spark.createDataFrame(
        [{"k": 300 + i, "status": "Y", "price": 2.0} for i in range(5)],
        "k long, status string, price double"))
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    meta = r.meta

    def ml_paths(snap):
        _, rows = read_ocf_bytes(r._local(snap["manifest-list"]).read_bytes())
        return [m["manifest_path"] for m in rows]

    s1, s2, s3 = meta["snapshots"]
    p1, p2, p3 = ml_paths(s1), ml_paths(s2), ml_paths(s3)
    # each append REFERENCES the prior manifests and adds exactly one
    assert set(p1) < set(p2) < set(p3)
    assert len(p2) == len(p1) + 1 and len(p3) == len(p2) + 1
    # and the reader still sees every row exactly once
    assert read_iceberg(spark, dest).count() == len(ROWS) + 10
    # a delete touching only the FIRST manifest rewrites it, reuses the rest
    t.delete("k <= 5")
    dest2 = t.export_iceberg_metadata(tmp_path / "ice2")
    r2 = IcebergMetadataReader(spark, dest2)
    s3b, s4 = r2.meta["snapshots"][-2], r2.meta["snapshots"][-1]
    p3b, p4 = (
        [m for m in _ml(r2, s3b)], [m for m in _ml(r2, s4)]
    )
    reused = {m["manifest_path"] for m in p3b} & {m["manifest_path"] for m in p4}
    assert len(reused) == 2  # the two untouched append manifests
    deleting = [m for m in p4 if m["deleted_files_count"] > 0]
    assert len(deleting) == 1
    assert read_iceberg(spark, dest2).count() == t.read().count()


def _ml(r, snap):
    _, rows = read_ocf_bytes(r._local(snap["manifest-list"]).read_bytes())
    return rows


def test_bounds_exported_and_plan_files_prunes(spark, tmp_path):
    """Manifest entries carry per-field lower/upper bounds; plan_files does
    min/max pruning driver-side. A table clustered by k into 4 files must
    plan exactly one file for a point-ish predicate, and to_df(filters)
    returns the same rows as the unpruned read filtered after the fact."""
    df = spark.createDataFrame(
        [{"k": i, "status": "AB"[i % 2], "price": float(i)} for i in range(400)],
        "k long, status string, price double",
    )
    t = LakeTable.create(spark, tmp_path / "lake", df,
                         partition_by=["k"], num_files=4)
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    files = r.live_files()
    assert len(files) == 4
    assert all(f.get("lower_bounds") and f.get("upper_bounds") for f in files)
    planned = r.plan_files([("k", ">=", 390)])
    assert len(planned) == 1
    got = sorted(x.k for x in r.to_df(filters=[("k", ">=", 390)]).collect())
    assert got == list(range(390, 400))
    # string bounds prune too
    planned_s = r.plan_files([("status", "=", "A")])
    assert 1 <= len(planned_s) <= 4
    # equality outside every file's range plans zero files
    assert r.plan_files([("k", ">", 100000)]) == []
    assert r.to_df(filters=[("k", ">", 100000)]).count() == 0


def test_restore_readd_under_tombstone_relists_position_deletes(spark, tmp_path):
    """ADVICE r8 (high): the Iceberg replay (a) must honor RESTORE/CLONE
    add_version overrides and (b) must NOT permanently shrink a delete
    manifest's target set — when every target dies (copy-on-write rewrite)
    and one is later RESTOREd, the position deletes must come back, and at
    a sequence number >= the restored data file's (spec: a position delete
    applies only to data files with data seq <= delete seq)."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)    # v0: file A
    t.delete("k > 30", lazy=True)                         # v1: tombstone @1
    t.update({"price": "price + 1"}, where="k < 1000")    # v2: A -> A' (target dead)
    t.restore(1)                                          # v3: re-adds A, same tombstones
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    got = read_iceberg(spark, dest).collect()
    assert _sorted_rows(read_iceberg(spark, dest)) == _sorted_rows(t.read())
    assert got and all(row.k <= 30 for row in got)
    dels = r.position_delete_files()
    assert dels, "restored tombstone target must relist its delete file"
    # spec-strict sequencing: the relisted delete's sequence number covers
    # the restored data file's sequence
    del_seq = max(int(e.get("sequence_number") or 0)
                  for e in r._live_delete_entries())
    data_seq = max(int(e.get("sequence_number") or 0)
                   for e in r._live_data_entries())
    assert del_seq >= data_seq


def test_clone_with_tombstones_exports_correct_delete_targets(spark, tmp_path):
    """ADVICE r8 (high, clone half): a CLONE's v0 adds carry add_version
    overrides — files POST-dating a cloned tombstone must not be targeted
    by its position deletes (previously all clone adds got add_version 0,
    over-deleting appended rows)."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    src = LakeTable.create(spark, tmp_path / "src", df)   # v0: file A
    src.delete("k > 30", lazy=True)                       # v1: tombstone @1
    src.append(spark.createDataFrame(
        [{"k": 999, "status": "Z", "price": 1.0}],
        "k long, status string, price double"))           # v2: file B post-dates it
    clone = src.clone(tmp_path / "clone", shallow=False)
    dest = clone.export_iceberg_metadata(tmp_path / "ice")
    got = read_iceberg(spark, dest).collect()
    assert _sorted_rows(read_iceberg(spark, dest)) == _sorted_rows(src.read())
    assert any(row.k == 999 for row in got), "post-tombstone row over-deleted"
    assert all(row.k <= 30 or row.k == 999 for row in got)


def test_position_delete_parquet_carries_reserved_field_ids(spark, tmp_path):
    """ADVICE r8 (medium): spec-strict external readers resolve delete-file
    columns by the RESERVED parquet field ids (file_path=2147483546,
    pos=2147483545), not by name — the exported position-delete parquet
    must carry them in its schema metadata."""
    import pyarrow.parquet as pq

    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.delete("k > 30", lazy=True)
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    dels = r.position_delete_files()
    assert dels
    for d in dels:
        sch = pq.ParquetFile(r._local_data(d["file_path"])).schema_arrow
        fid = {f.name: (f.metadata or {}).get(b"PARQUET:field_id")
               for f in sch}
        assert fid["file_path"] == b"2147483546"
        assert fid["pos"] == b"2147483545"


def test_expire_snapshots_maintenance(spark, tmp_path):
    """expireSnapshots (r9): retain the newest snapshot, prune the rest
    from a NEW metadata.json, delete only expired-only files. Current
    reads identical before/after; expired ids raise; retained data files
    survive; the cleanup actually reclaims manifest lists + old data."""
    t = _mk_table(spark, tmp_path / "lake")          # 4 snapshots (COW arc)
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    n_snaps = len(r.meta["snapshots"])
    assert n_snaps >= 4
    want = _sorted_rows(read_iceberg(spark, dest))
    hint_before = (dest / "metadata" / "version-hint.text").read_text()

    dry = r.expire_snapshots(keep_last=1, dry_run=True)
    assert len(dry["expired"]) == n_snaps - 1
    assert (dest / "metadata" / "version-hint.text").read_text() == \
        hint_before, "dry_run must not flip the version hint"

    res = r.expire_snapshots(keep_last=1)
    assert res["expired"] == dry["expired"]
    assert res["deleted_manifest_lists"] >= 1
    assert res["deleted_data_files"] >= 1  # COW rewrites orphaned old files

    r2 = IcebergMetadataReader(spark, dest)          # fresh, via new hint
    assert len(r2.meta["snapshots"]) == 1
    assert _sorted_rows(read_iceberg(spark, dest)) == want
    for f in r2.live_files():
        assert r2._local_data(f["file_path"]).exists()
    with pytest.raises(IcebergFormatError):
        r2.to_df(snapshot_id=1)
    # idempotent: nothing left to expire
    assert r2.expire_snapshots(keep_last=1)["expired"] == []
    # metadata-log chains to the pre-expire file
    assert r2.meta["metadata-log"][-1]["metadata-file"].endswith(
        f"v{n_snaps}.metadata.json")


def test_expire_snapshots_keeps_shared_manifests(spark, tmp_path):
    """Manifest REUSE interaction: an append-only arc shares its early
    manifests across every later snapshot — expiring old snapshots must
    not delete manifests (or data) the retained snapshot still lists."""
    df = spark.createDataFrame(ROWS[:10], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    for lo in (11, 21):
        t.append(spark.createDataFrame(
            [{"k": i, "status": "Z", "price": 1.0 * i}
             for i in range(lo, lo + 10)],
            "k long, status string, price double"))
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    want = _sorted_rows(read_iceberg(spark, dest))
    r = IcebergMetadataReader(spark, dest)
    res = r.expire_snapshots(keep_last=1)
    assert len(res["expired"]) == 2
    assert res["deleted_data_files"] == 0  # appends: all files still live
    assert _sorted_rows(read_iceberg(spark, dest)) == want


def test_expire_snapshots_trims_metadata_log(spark, tmp_path):
    """max_metadata_versions (Iceberg's previous-versions-max +
    delete-after-commit): old v*.metadata.json unlinked, metadata-log
    trimmed to the newest N, current file + hint untouched, table still
    reads and re-opens."""
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    meta_dir = dest / "metadata"
    n_json = len(list(meta_dir.glob("v*.metadata.json")))
    assert n_json >= 4
    want = _sorted_rows(read_iceberg(spark, dest))

    r = IcebergMetadataReader(spark, dest)
    res = r.expire_snapshots(keep_last=1, max_metadata_versions=2)
    assert res["deleted_metadata_files"] >= 2
    left = sorted(meta_dir.glob("v*.metadata.json"))
    assert len(left) == n_json + 1 - res["deleted_metadata_files"]
    assert not (meta_dir / "v1.metadata.json").exists()

    r2 = IcebergMetadataReader(spark, dest)
    assert _sorted_rows(read_iceberg(spark, dest)) == want
    assert len(r2.meta["metadata-log"]) == 2
    assert r2.metadata_log_entries().count() == 2


# --------------------------- snapshot refs ------------------------------- #
def test_refs_create_read_and_metadata_table(spark, tmp_path):
    """Branches/tags (r9, spec `refs` map): CREATE TAG / CREATE BRANCH
    commit a NEW metadata.json an external (fresh) reader sees; read-by-ref
    equals snapshot time travel; the `.refs` metadata table matches
    Spark-Iceberg's schema; duplicate/unknown names fail loudly."""
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    snaps = [s["snapshot-id"] for s in r.meta["snapshots"]]
    v_before = int((dest / "metadata" / "version-hint.text").read_text())

    r.create_tag("pre-evolve", snapshot_id=snaps[2], max_ref_age_ms=864000)
    r.create_branch("audit", snapshot_id=snaps[1], min_snapshots_to_keep=2)

    # two ref commits -> two new metadata versions, hint flipped each time
    assert int((dest / "metadata" / "version-hint.text").read_text()) == \
        v_before + 2

    r2 = IcebergMetadataReader(spark, dest)  # fresh open via the new hint
    refs = {row["name"]: row for row in r2.refs().collect()}
    assert set(refs) == {"main", "pre-evolve", "audit"}
    assert refs["pre-evolve"]["type"] == "tag"
    assert refs["pre-evolve"]["snapshot_id"] == snaps[2]
    assert refs["pre-evolve"]["max_reference_age_in_ms"] == 864000
    assert refs["audit"]["type"] == "branch"
    assert refs["audit"]["min_snapshots_to_keep"] == 2
    assert refs["main"]["snapshot_id"] == snaps[-1]

    assert _sorted_rows(r2.to_df(ref="pre-evolve")) == \
        _sorted_rows(r2.to_df(snapshot_id=snaps[2]))
    assert _sorted_rows(r2.to_df(ref="main")) == _sorted_rows(r2.to_df())
    # ref reads use the referenced snapshot's schema: the branch points
    # before the schema-evolution append, so no `note` column
    assert "note" not in r2.to_df(ref="audit").columns

    with pytest.raises(IcebergFormatError, match="already exists"):
        r2.create_tag("audit")
    with pytest.raises(IcebergFormatError, match="not found"):
        r2.create_tag("ghost", snapshot_id=999999)
    with pytest.raises(IcebergFormatError, match="not found"):
        r2.to_df(ref="nope")
    with pytest.raises(ValueError, match="not both"):
        r2.to_df(snapshot_id=snaps[0], ref="main")


def test_refs_protect_snapshots_from_expiration(spark, tmp_path):
    """expire_snapshots retains every ref target (Iceberg's ExpireSnapshots
    contract) — a tagged old snapshot survives keep_last=1 and stays
    readable by ref; dropping the tag releases it to the next pass."""
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    snaps = [s["snapshot-id"] for s in r.meta["snapshots"]]
    r.create_tag("pinned", snapshot_id=snaps[0])
    pinned_rows = _sorted_rows(r.to_df(ref="pinned"))

    res = r.expire_snapshots(keep_last=1)
    assert snaps[0] not in res["expired"]
    assert set(res["expired"]) == set(snaps[1:-1])
    r2 = IcebergMetadataReader(spark, dest)
    assert _sorted_rows(r2.to_df(ref="pinned")) == pinned_rows

    with pytest.raises(IcebergFormatError, match="main branch"):
        r2.drop_ref("main")
    r2.drop_ref("pinned")
    with pytest.raises(IcebergFormatError, match="not found"):
        r2.drop_ref("pinned")
    res2 = r2.expire_snapshots(keep_last=1)
    assert res2["expired"] == [snaps[0]]
    r3 = IcebergMetadataReader(spark, dest)
    assert [s["snapshot-id"] for s in r3.meta["snapshots"]] == [snaps[-1]]


def test_fast_forward_branch(spark, tmp_path):
    """fast_forward advances a branch along its ancestry only (the
    procedure's not-fast-forward guard); tags refuse to move."""
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    snaps = [s["snapshot-id"] for s in r.meta["snapshots"]]

    r.create_branch("dev", snapshot_id=snaps[0])
    old, new = r.fast_forward("dev")                 # default: to current
    assert (old, new) == (snaps[0], snaps[-1])
    assert _sorted_rows(r.to_df(ref="dev")) == _sorted_rows(r.to_df())
    # no-op fast-forward is a no-op, not an error
    assert r.fast_forward("dev") == (snaps[-1], snaps[-1])

    # backwards is NOT a fast-forward
    r.create_branch("stale", snapshot_id=snaps[-1])
    with pytest.raises(IcebergFormatError, match="not an ancestor"):
        r.fast_forward("stale", to=snaps[0])
    r.create_tag("v1", snapshot_id=snaps[0])
    with pytest.raises(IcebergFormatError, match="is a tag"):
        r.fast_forward("v1")
    with pytest.raises(IcebergFormatError, match="not found"):
        r.fast_forward("missing")
    # `to` accepts a ref name too
    r.create_branch("dev2", snapshot_id=snaps[1])
    assert r.fast_forward("dev2", to="dev") == (snaps[1], snaps[-1])


# ------------------------- remove_orphan_files --------------------------- #
def test_remove_orphan_files(spark, tmp_path):
    """removeOrphanFiles (r9): strays under data AND metadata are listed
    by dry_run and deleted by the real pass; every file any metadata
    version references survives (incl. files only OLD snapshots list);
    reads are byte-identical after the sweep; second pass finds nothing."""
    import shutil as _sh
    import time as _t

    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    want = _sorted_rows(read_iceberg(spark, dest))
    n_files = sum(1 for p in dest.rglob("*") if p.is_file())

    # plant strays: a fake data parquet + a fake manifest avro
    live = r._local_data(r.live_files()[0]["file_path"])
    stray_data = live.parent / "stray-orphan.parquet"
    _sh.copy2(live, stray_data)
    stray_meta = dest / "metadata" / "zzz-orphan-m9.avro"
    stray_meta.write_bytes(b"Obj\x01 not a real manifest")

    future = int(_t.time() * 1000) + 60_000
    dry = r.remove_orphan_files(older_than_ms=future, dry_run=True)
    assert sorted(p.rsplit("/", 1)[-1] for p in dry["orphans"]) == [
        "stray-orphan.parquet", "zzz-orphan-m9.avro"
    ]
    assert dry["deleted"] == 0 and stray_data.exists()

    # default cutoff (now - 3 days) protects fresh files — in-flight commits
    assert r.remove_orphan_files()["orphans"] == []
    assert stray_data.exists()

    res = r.remove_orphan_files(older_than_ms=future)
    assert res["deleted"] == 2
    assert not stray_data.exists() and not stray_meta.exists()
    # nothing else was touched: same file count as before planting
    assert sum(1 for p in dest.rglob("*") if p.is_file()) == n_files
    assert _sorted_rows(read_iceberg(spark, dest)) == want
    # files only HISTORICAL snapshots reference are kept: time travel works
    first = r.meta["snapshots"][0]["snapshot-id"]
    assert r.to_df(snapshot_id=first).count() > 0
    assert r.remove_orphan_files(older_than_ms=future)["orphans"] == []


# --------------------------- rewrite_data_files --------------------------- #
def test_rewrite_data_files_compaction(spark, tmp_path):
    """rewriteDataFiles: many small files + an active position delete
    bin-pack into ONE file; reads identical; the delete manifests drop
    out (rows physically gone); time travel to the pre-rewrite snapshot
    untouched; expire afterwards reclaims the replaced files."""
    df = spark.createDataFrame(ROWS[:10], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    for lo in (11, 21):
        t.append(spark.createDataFrame(
            [{"k": i, "status": "Z", "price": 1.0 * i}
             for i in range(lo, lo + 10)],
            "k long, status string, price double"))
    t.delete("k > 25", lazy=True)            # MOR tombstone -> pos deletes
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    want = _sorted_rows(r.to_df())
    n_live = len(r.live_files())
    assert n_live >= 3 and r.position_delete_files()
    pre_head = r.meta["current-snapshot-id"]

    dry = r.rewrite_data_files(target_files=1, dry_run=True)
    assert dry["input_files"] == n_live and dry["applied_delete_files"] >= 1
    assert r.meta["current-snapshot-id"] == pre_head  # dry_run committed nothing

    res = r.rewrite_data_files(target_files=1)
    assert res["output_files"] == 1
    r2 = IcebergMetadataReader(spark, dest)          # fresh via new hint
    assert r2.meta["current-snapshot-id"] == res["snapshot_id"]
    assert len(r2.live_files()) == 1
    assert not r2.position_delete_files()            # deletes applied away
    assert _sorted_rows(r2.to_df()) == want
    # bounds survive the rewrite: plan_files prunes on k
    assert r2.plan_files(filters=[("k", ">", 100)]) == []
    assert len(r2.plan_files(filters=[("k", "<=", 25)])) == 1
    # prior snapshot still time-travels (manifest list untouched)
    assert len(r2.to_df(snapshot_id=pre_head).collect()) == len(want)
    # summary + refs moved with the head
    head = r2.meta["snapshots"][-1]
    assert head["summary"]["operation"] == "replace"
    assert r2.meta["refs"]["main"]["snapshot-id"] == res["snapshot_id"]
    # expire now reclaims the replaced small files
    exp = r2.expire_snapshots(keep_last=1)
    assert exp["deleted_data_files"] >= n_live - 1
    assert _sorted_rows(IcebergMetadataReader(spark, dest).to_df()) == want


def test_rewrite_manifests(spark, tmp_path):
    """rewriteManifests: N data manifests collapse into ONE (entries
    relisted EXISTING, sequence numbers preserved so position deletes
    still apply), delete manifests pass through, reads identical, time
    travel intact, the reuse-aware expire keeps the still-listed files."""
    df = spark.createDataFrame(ROWS[:10], "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    for lo in (11, 21):
        t.append(spark.createDataFrame(
            [{"k": i, "status": "Z", "price": 1.0 * i}
             for i in range(lo, lo + 10)],
            "k long, status string, price double"))
    t.delete("k > 25", lazy=True)            # delete manifest must survive
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    want = _sorted_rows(r.to_df())
    pre_head = r.meta["current-snapshot-id"]
    assert r.manifests().count() >= 3

    res = r.rewrite_manifests(dry_run=True)
    assert res["input_manifests"] >= 3 and not res["rewritten"]
    res = r.rewrite_manifests()
    assert res["rewritten"]

    r2 = IcebergMetadataReader(spark, dest)
    _, ml_rows = read_ocf_bytes(
        r2._local(r2._snapshot()["manifest-list"]).read_bytes())
    assert sum(1 for x in ml_rows if x.get("content", 0) == 0) == 1
    assert sum(1 for x in ml_rows if x.get("content", 0) == 1) >= 1
    assert _sorted_rows(r2.to_df()) == want          # deletes still apply
    assert _sorted_rows(r2.to_df(snapshot_id=pre_head)) == want
    # idempotent: second call is a no-op
    assert not r2.rewrite_manifests()["rewritten"]
    # expire keeps every file the consolidated manifest lists as EXISTING
    r2.expire_snapshots(keep_last=1)
    assert _sorted_rows(IcebergMetadataReader(spark, dest).to_df()) == want


# -------------------- external COW DML (Iceberg twin) --------------------- #
def test_iceberg_external_delete_update(spark, tmp_path):
    """IcebergMetadataReader.delete/update: copy-on-write DML committed as
    new Iceberg v2 snapshots against the external metadata layer — the
    format twin of DeltaLogReader's DML. Affected files rewrite; untouched
    files stay EXISTING at their original sequence numbers; time travel to
    pre-DML snapshots is intact."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.append(spark.createDataFrame(
        [{"k": 100 + i, "status": "Z", "price": 1.0} for i in range(5)],
        "k long, status string, price double").coalesce(1))
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    pre = r.meta["current-snapshot-id"]
    n_live0 = len(r.live_files())

    dry = r.delete("status = 'Z'", dry_run=True)
    assert dry["rewritten_files"] == 1
    assert IcebergMetadataReader(spark, dest).meta[
        "current-snapshot-id"] == pre

    res = r.delete("status = 'Z'")
    r2 = IcebergMetadataReader(spark, dest)
    assert r2.meta["current-snapshot-id"] == res["snapshot_id"]
    got = sorted(x.k for x in r2.to_df().collect())
    assert got == [x["k"] for x in ROWS]
    head = r2.meta["snapshots"][-1]
    assert head["summary"]["operation"] == "delete"
    # the affected file held ONLY matching rows -> deleted outright with
    # no replacement; every untouched file is EXISTING, not rewritten
    assert len(r2.live_files()) == n_live0 - 1
    # time travel to the pre-DML snapshot still sees the Z rows
    assert len(r2.to_df(snapshot_id=pre).collect()) == 45

    res = r2.update({"price": "price * 2"}, where="k <= 5")
    r3 = IcebergMetadataReader(spark, dest)
    rows = {x.k: x.price for x in r3.to_df().collect()}
    for i in range(1, 41):
        assert rows[i] == (10.0 * i * 2 if i <= 5 else 10.0 * i)
    assert r3.meta["snapshots"][-1]["summary"]["operation"] == "overwrite"
    # sequence numbers stayed monotonic; the stream source tails cleanly
    seqs = [s["sequence-number"] for s in r3.meta["snapshots"]]
    assert seqs == sorted(seqs)

    # no-match predicate commits nothing
    head = r3.meta["current-snapshot-id"]
    assert r3.delete("k > 99999")["rewritten_files"] == 0
    assert IcebergMetadataReader(spark, dest).meta[
        "current-snapshot-id"] == head
    with pytest.raises(ValueError, match="SET column"):
        r3.update({"nope": "1"})


def test_iceberg_external_dml_under_name_mapping(spark, tmp_path):
    """COW DML on an exported table whose column was RENAMED (the
    name-mapping layer): logical names in predicates/SET, physical names
    in the rewritten files, reads round-trip."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    t.alter_rename_column("price", "amount")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)

    res = r.delete("amount > 350.0")
    assert res["rewritten_files"] >= 1
    r2 = IcebergMetadataReader(spark, dest)
    got = r2.to_df()
    assert "amount" in got.columns
    assert sorted(x.k for x in got.collect()) == list(range(1, 36))
    r2.update({"amount": "amount + 0.5"}, where="k = 1")
    rows = {x.k: x.amount for x in
            IcebergMetadataReader(spark, dest).to_df().collect()}
    assert rows[1] == 10.5 and rows[2] == 20.0


def test_iceberg_external_dml_carries_live_mor_deletes(spark, tmp_path):
    """A COW DELETE touching file A must not lose the position deletes
    still masking file B: live delete manifests carry over into the new
    snapshot's manifest list."""
    df = spark.createDataFrame(
        ROWS[:10], "k long, status string, price double").coalesce(1)
    t = LakeTable.create(spark, tmp_path / "lake", df, num_files=1)
    t.append(spark.createDataFrame(
        ROWS[10:20], "k long, status string, price double").coalesce(1))
    t.delete("k >= 19", lazy=True)   # MOR tombstone on the SECOND file
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    assert r.position_delete_files()
    want_before = sorted(x.k for x in r.to_df().collect())
    assert want_before == list(range(1, 19))

    res = r.delete("k <= 3")          # affects only the FIRST file
    r2 = IcebergMetadataReader(spark, dest)
    assert res["rewritten_files"] == 1
    # file B's MOR delete still applies: 19,20 stay gone; 1-3 now gone too
    assert sorted(x.k for x in r2.to_df().collect()) == list(range(4, 19))
    assert r2.position_delete_files()  # carried, still live

    # update on file B materializes its MOR delete in the rewrite
    r2.update({"status": "'Q'"}, where="k = 15")
    r3 = IcebergMetadataReader(spark, dest)
    rows = {x.k: x.status for x in r3.to_df().collect()}
    assert rows[15] == "Q" and sorted(rows) == list(range(4, 19))


def test_partitions_metadata_table(spark, tmp_path):
    """`.partitions` (03.iceberg_primer.py:370): unpartitioned exports
    emit one row whose totals equal the live file set; MOR deletes
    surface in the position-delete columns."""
    t = _mk_table(spark, tmp_path / "lake")     # history incl. a lazy path?
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    rows = r.partitions().collect()
    assert len(rows) == 1
    p = rows[0]
    assert p.partition == {} and p.spec_id == 0
    assert p.file_count == len(r.live_files())
    assert p.record_count == sum(
        f["record_count"] for f in r.live_files())
    assert p.total_data_file_size_in_bytes == sum(
        f["file_size_in_bytes"] for f in r.live_files())
    assert p.last_updated_snapshot_id in {
        s["snapshot-id"] for s in r.meta["snapshots"]}

    # MOR tombstone → live position-delete entries surface
    t2 = LakeTable.create(
        spark, tmp_path / "lake2",
        spark.createDataFrame(ROWS, "k long, status string, price double"))
    t2.delete("k > 15", lazy=True)
    r2 = IcebergMetadataReader(
        spark, t2.export_iceberg_metadata(tmp_path / "ice2"))
    p2 = r2.partitions().collect()[0]
    assert p2.position_delete_file_count >= 1
    assert p2.position_delete_record_count == 25  # k in 16..40
    assert p2.equality_delete_file_count == 0

    # empty table: no snapshots -> no rows
    t3 = LakeTable.create(
        spark, tmp_path / "lake3",
        spark.createDataFrame([], "k long, status string, price double"))
    r3 = IcebergMetadataReader(
        spark, t3.export_iceberg_metadata(tmp_path / "ice3"))
    assert r3.partitions().count() <= 1  # at most an all-zero row


def test_partitions_metadata_table_partitioned_foreign(spark, tmp_path):
    """A FOREIGN partitioned table (manifest entries carry partition
    tuples — hand-built by re-encoding the export's manifest with a
    populated partition record) aggregates per tuple, Spark-Iceberg's
    partitions semantics."""
    import copy

    from lakehouses_spark.tables.iceberg_meta import (
        _MANIFEST_ENTRY_SCHEMA,
        write_ocf_bytes_with_meta,
    )

    t = LakeTable.create(
        spark, tmp_path / "lake",
        spark.createDataFrame(
            ROWS[:10], "k long, status string, price double").coalesce(1),
        num_files=1,
    )
    t.append(spark.createDataFrame(
        ROWS[10:], "k long, status string, price double").coalesce(1))
    t.append(spark.createDataFrame(
        [{"k": 99, "status": "B", "price": 9.0}],
        "k long, status string, price double"))
    dest = t.export_iceberg_metadata(tmp_path / "ice")

    part_schema = copy.deepcopy(_MANIFEST_ENTRY_SCHEMA)
    for f in part_schema["fields"]:
        if f["name"] == "data_file":
            for g in f["type"]["fields"]:
                if g["name"] == "partition":
                    g["type"]["fields"] = [{
                        "name": "bucket", "type": ["null", "string"],
                        "field-id": 1000,
                    }]
    # assign partitions round-robin: entry i -> bucket "pA"/"pB"
    buckets = ["pA", "pB"]
    i = 0
    for mf in sorted((dest / "metadata").glob("*.avro")):
        _, rows = read_ocf_bytes(mf.read_bytes())
        if not rows or "data_file" not in rows[0]:
            continue
        for e in rows:
            if e["data_file"].get("content", 0) == 0:
                e["data_file"]["partition"] = {"bucket": buckets[i % 2]}
                i += 1
        mf.write_bytes(write_ocf_bytes_with_meta(
            rows, part_schema,
            {"partition-spec": "[]", "partition-spec-id": "0",
             "format-version": "2", "content": "data"},
        ))
    assert i >= 3

    r = IcebergMetadataReader(spark, dest)
    rows = sorted(
        r.partitions().collect(), key=lambda x: x.partition["bucket"])
    assert [x.partition for x in rows] == [
        {"bucket": "pA"}, {"bucket": "pB"}]
    assert sum(x.file_count for x in rows) == len(r.live_files())
    assert sum(x.record_count for x in rows) == 41  # 40 ROWS + 1 extra
    assert all(x.file_count >= 1 for x in rows)


def test_entries_and_all_manifests_metadata_tables(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "lake")
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    ent = r.entries().collect()
    assert {e.status for e in ent} <= {0, 1, 2}
    live = sum(1 for e in ent if e.status != 2 and e.content == 0)
    assert live == len(r.live_files())
    am = r.all_manifests().collect()
    # manifest reuse: strictly more (manifest, reference-snapshot) pairs
    # than distinct manifests; every current manifest is reachable
    assert len(am) > len({m.path for m in am})
    cur = {m.path for m in r.manifests().collect()}
    assert cur <= {m.path for m in am}


def test_iceberg_external_delete_keeps_null_predicate_rows(spark, tmp_path):
    """DELETE keeps rows where the predicate evaluates to NULL — the
    format twin of the Delta NULL-predicate rule (engines filter kept
    rows on !(cond <=> true))."""
    rows = [
        {"k": 1, "price": 5.0}, {"k": 2, "price": None},
        {"k": 3, "price": 7.0}, {"k": 4, "price": None},
    ]
    df = spark.createDataFrame(rows, "k long, price double").coalesce(1)
    t = LakeTable.create(spark, tmp_path / "lake", df)
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    res = r.delete("price = 5.0")
    assert res["rewritten_files"] == 1
    got = sorted(
        x.k for x in IcebergMetadataReader(spark, dest).to_df().collect())
    assert got == [2, 3, 4]


def test_iceberg_plan_files_ignores_nan_bounds(spark, tmp_path):
    """Manifest bounds pruning treats a NaN lower/upper bound as 'no
    bound' (the Iceberg spec keeps NaN out of bounds; foreign writers
    may not) — and `_encode_bound` refuses to emit one."""
    from lakehouses_spark.tables.iceberg_meta import _encode_bound

    from pyspark.sql import types as T

    assert _encode_bound(float("nan"), T.DoubleType()) is None


def test_iceberg_nonidentity_partitioned_dml_refused(spark, tmp_path):
    """A foreign table whose CURRENT spec uses an UNSUPPORTED transform
    refuses metadata-rewriting ops loudly (VERDICT r10 #2): evaluating
    an unknown transform (or a supported one over a type whose
    serialization this writer doesn't carry — here truncate over
    DOUBLE) risks wrong partition tuples — silent data loss for every
    other engine. Identity/date/bucket/truncate specs are the supported
    write path (tests/test_iceberg_transforms.py pins bucket/truncate
    since the r12 continuation)."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    metas = sorted(
        (dest / "metadata").glob("v*.metadata.json"),
        key=lambda p: int(p.name.split(".")[0][1:]),
    )
    m = json.loads(metas[-1].read_text())
    m["partition-specs"] = [{"spec-id": 0, "fields": [
        {"name": "price_trunc", "transform": "truncate[4]",
         "source-id": 3, "field-id": 1000}]}]
    m["default-spec-id"] = 0
    metas[-1].write_text(json.dumps(m))

    r = IcebergMetadataReader(spark, dest)
    for call in (lambda: r.delete("k = 1"),
                 lambda: r.update({"price": "1.0"}),
                 lambda: r.rewrite_data_files(),
                 lambda: r.rewrite_manifests()):
        with pytest.raises(IcebergFormatError, match="transform"):
            call()
    # reading is unaffected by the spec — only writes are refused
    assert IcebergMetadataReader(spark, dest).to_df().count() == len(ROWS)


def test_iceberg_external_merge_upsert(spark, tmp_path):
    """IcebergMetadataReader.merge: the format twin of the Delta external
    MERGE (same clause surface via the shared helpers) — matched files
    rewrite, inserts append, untouched files stay EXISTING, one
    `overwrite` snapshot."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    src = spark.createDataFrame(
        [{"k": 1, "status": "M", "price": 111.0},
         {"k": 999, "status": "N", "price": 9.0}],
        "k long, status string, price double")
    res = r.merge(src, "t.k = s.k")
    assert res["rewritten_files"] >= 1 and res["inserted_rows"] == 1
    r2 = IcebergMetadataReader(spark, dest)
    assert r2.meta["current-snapshot-id"] == res["snapshot_id"]
    rows = {x.k: (x.status, x.price) for x in r2.to_df().collect()}
    assert rows[1] == ("M", 111.0) and rows[999] == ("N", 9.0)
    assert rows[2] == (ROWS[1]["status"], 20.0)
    assert r2.meta["snapshots"][-1]["summary"]["operation"] == "overwrite"
    seqs = [s["sequence-number"] for s in r2.meta["snapshots"]]
    assert seqs == sorted(seqs)

    # matched-delete clause (subset source: just the key)
    r2.merge(spark.createDataFrame([{"k": 999}], "k long"),
             "t.k = s.k", when_matched_update=None,
             when_not_matched_insert=None, when_matched_delete=True)
    left = {x.k for x in IcebergMetadataReader(spark, dest).to_df().collect()}
    assert 999 not in left and 1 in left

    # multiple source rows matching one target row refuse
    dup = spark.createDataFrame(
        [{"k": 1, "status": "X", "price": 1.0},
         {"k": 1, "status": "Y", "price": 2.0}],
        "k long, status string, price double")
    with pytest.raises(IcebergFormatError, match="multiple source rows"):
        IcebergMetadataReader(spark, dest).merge(dup, "t.k = s.k")

    # a source widening the schema refuses (no evolution on externals)
    wide = spark.createDataFrame([{"k": 1, "zz": 1}], "k long, zz long")
    with pytest.raises(IcebergFormatError, match="not in the table"):
        IcebergMetadataReader(spark, dest).merge(wide, "t.k = s.k")


def test_iceberg_rollback_and_set_current_snapshot(spark, tmp_path):
    """rollback_to_snapshot / set_current_snapshot: metadata-only
    re-points of the main ref (Iceberg's procedures; the format-parity
    twin of DeltaLogReader.restore). Data files and manifests untouched;
    abandoned snapshots stay addressable until expiration."""
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, tmp_path / "lake", df)
    dest = t.export_iceberg_metadata(tmp_path / "ice")
    r = IcebergMetadataReader(spark, dest)
    pre = r.meta["current-snapshot-id"]
    n0 = r.to_df().count()
    r.delete("k <= 5")
    mid = r.meta["current-snapshot-id"]
    assert r.to_df().count() == n0 - 5

    res = r.rollback_to_snapshot(pre)
    assert res["rolled_back_to"] == pre and res["previous"] == mid
    r2 = IcebergMetadataReader(spark, dest)
    assert r2.meta["current-snapshot-id"] == pre
    assert r2.to_df().count() == n0
    assert (r2.meta.get("refs") or {}).get("main", {}).get(
        "snapshot-id", pre) == pre

    # roll FORWARD again: mid is not an ancestor of pre, so
    # rollback refuses and set_current_snapshot is the tool
    with pytest.raises(IcebergFormatError, match="not an ancestor"):
        r2.rollback_to_snapshot(mid)
    r2.set_current_snapshot(mid)
    assert IcebergMetadataReader(spark, dest).to_df().count() == n0 - 5
    with pytest.raises(IcebergFormatError, match="unknown snapshot"):
        IcebergMetadataReader(spark, dest).rollback_to_snapshot(10 ** 9)


# -------- round-11: identity-partitioned external COW writes ------------- #
# the canonical identity-partitioned foreign fixture now lives in
# tests/foreign_fixtures.py (VERDICT r11 #6), shared with the stream and
# cross-plane agreement tests
from tests.foreign_fixtures import mk_foreign_iceberg as _mk_identity_partitioned  # noqa: E402,E501


def test_iceberg_partitioned_external_dml(spark, tmp_path):
    """Identity-partitioned external COW DML (VERDICT r10 #2, the
    'better' path on the Iceberg side): DELETE/UPDATE rewrite per
    partition — data files keep every column (native Iceberg layout),
    each new file belongs to exactly one partition tuple, manifests
    carry TYPED partition records under the declared spec, and an
    UPDATE that SETs the partition source moves rows to their new
    partition."""
    from lakehouses_spark.functions.avro_py import read_ocf_bytes as _rd

    dest = _mk_identity_partitioned(spark, tmp_path, "ice_idp")
    r = IcebergMetadataReader(spark, dest)
    assert len(r.live_files()) == 2

    res = r.delete("k in (1, 2)")          # touches only the A file
    assert res["rewritten_files"] == 1
    r2 = IcebergMetadataReader(spark, dest)
    assert sorted(x.k for x in r2.to_df().collect()) == list(range(3, 11))
    # the new manifest carries a truthful typed partition record
    by_part = {}
    for e in r2._live_data_entries():
        p = (e["data_file"].get("partition") or {}).get("status")
        by_part.setdefault(p, []).append(e)
    assert set(by_part) == {"A", "B"}
    # untouched B file is EXISTING at its original path
    assert by_part["B"][0]["data_file"]["file_path"].endswith(".parquet")

    # the writer schema of the new manifest types the partition record
    newest = max((dest / "metadata").glob("*-m0.avro"),
                 key=lambda p: p.stat().st_mtime)
    schema, _ = _rd(newest.read_bytes())
    r102 = next(
        g for f in schema["fields"] if f["name"] == "data_file"
        for g in f["type"]["fields"] if g["name"] == "partition")
    assert [pf["name"] for pf in r102["type"]["fields"]] == ["status"]

    # each rewritten data file holds exactly ONE partition value and
    # KEEPS the partition source column (native Iceberg layout)
    import pyarrow.parquet as pq
    for e in r2._live_data_entries():
        local = r2._local_data(e["data_file"]["file_path"])
        vals = set(pq.read_table(local).column("status").to_pylist())
        assert len(vals) == 1
        assert vals == {(e["data_file"].get("partition") or {}).get("status")}

    # UPDATE that SETs the partition source column: rows move partitions
    res = r2.update({"status": "'B'"}, where="k = 3")
    assert res["rewritten_files"] == 1
    r3 = IcebergMetadataReader(spark, dest)
    moved = [e for e in r3._live_data_entries()
             if (e["data_file"].get("partition") or {}).get("status") == "B"]
    rows = {x.k: x.status for x in r3.to_df().collect()}
    assert rows[3] == "B" and rows[4] == "A"
    # the moved row's file is stamped partition B
    ks_in_b = set()
    for e in moved:
        local = r3._local_data(e["data_file"]["file_path"])
        ks_in_b |= set(pq.read_table(local).column("k").to_pylist())
    assert 3 in ks_in_b

    # .partitions metadata table aggregates the tuples
    parts = {x.partition["status"]: x.record_count
             for x in r3.partitions().collect()}
    assert parts == {"A": 2, "B": 6}


def test_iceberg_partitioned_external_merge_and_compaction(spark, tmp_path):
    """MERGE and rewrite_data_files on an identity-partitioned foreign
    table: inserts land in their partitions, compaction stays
    partition-grouped, every committed entry keeps a truthful tuple."""
    import pyarrow.parquet as pq

    dest = _mk_identity_partitioned(spark, tmp_path, "ice_idpm")
    r = IcebergMetadataReader(spark, dest)
    src = spark.createDataFrame(
        [{"k": 1, "status": "A", "price": 999.0},     # match -> update
         {"k": 20, "status": "B", "price": 200.0}],   # no match -> insert
        "k long, status string, price double")
    res = r.merge(src, "t.k = s.k")
    assert res["rewritten_files"] == 1 and res["inserted_rows"] == 1
    r2 = IcebergMetadataReader(spark, dest)
    rows = {x.k: (x.status, x.price) for x in r2.to_df().collect()}
    assert rows[1] == ("A", 999.0) and rows[20] == ("B", 200.0)
    for e in r2._live_data_entries():
        local = r2._local_data(e["data_file"]["file_path"])
        vals = set(pq.read_table(local).column("status").to_pylist())
        assert vals == {(e["data_file"].get("partition") or {}).get("status")}

    # compaction keeps the partition grouping
    res = r2.rewrite_data_files(target_files=1)
    r3 = IcebergMetadataReader(spark, dest)
    assert sorted(x.k for x in r3.to_df().collect()) == sorted(rows)
    for e in r3._live_data_entries():
        local = r3._local_data(e["data_file"]["file_path"])
        vals = set(pq.read_table(local).column("status").to_pylist())
        assert len(vals) == 1
        assert vals == {(e["data_file"].get("partition") or {}).get("status")}
    # rewrite_manifests relists tuples intact
    r3.rewrite_manifests()
    r4 = IcebergMetadataReader(spark, dest)
    parts = {x.partition["status"] for x in r4.partitions().collect()}
    assert parts == {"A", "B"}


def test_iceberg_partition_only_planning_never_reads_data(
        spark, tmp_path, monkeypatch):
    """r11: under an identity spec, a DML predicate referencing only the
    partition source columns plans from the manifest partition tuples —
    zero data files opened."""
    dest = _mk_identity_partitioned(spark, tmp_path, "ice_pplan")
    r = IcebergMetadataReader(spark, dest)

    def boom(*a, **k):
        raise AssertionError("partition-only planning read data")

    monkeypatch.setattr(r, "to_df", boom)
    plan = r.delete("status = 'A'", dry_run=True)
    assert plan["rewritten_files"] == 1
    with pytest.raises(AssertionError, match="read data"):
        r.delete("price > 0", dry_run=True)


def test_iceberg_partitioned_dml_under_name_mapping(spark, tmp_path):
    """Identity-partitioned + NAME-MAPPED foreign table (the combined
    input class): the partition SOURCE column was renamed after export,
    so its logical name (spec field, predicates) differs from the
    physical name the data files store. DML plans partition-only
    predicates from the manifest tuples, duplicates the PHYSICAL column
    for the partitioned write, and commits truthful typed tuples under
    the logical spec name."""
    import copy

    import pyarrow.parquet as pq

    from lakehouses_spark.tables.iceberg_meta import (
        _MANIFEST_ENTRY_SCHEMA,
        write_ocf_bytes_with_meta,
    )

    rows_a = [{"k": i, "status": "A", "price": float(10 * i)}
              for i in range(1, 6)]
    rows_b = [{"k": i, "status": "B", "price": float(10 * i)}
              for i in range(6, 11)]
    t = LakeTable.create(
        spark, tmp_path / "lake_nm",
        spark.createDataFrame(
            rows_a, "k long, status string, price double").coalesce(1),
        num_files=1)
    t.append(spark.createDataFrame(
        rows_b, "k long, status string, price double").coalesce(1))
    t.alter_rename_column("status", "state")  # mapping: state -> status
    dest = t.export_iceberg_metadata(tmp_path / "ice_nm")

    meta_file = sorted(
        (dest / "metadata").glob("v*.metadata.json"),
        key=lambda p: int(p.name.split(".")[0][1:]))[-1]
    m = json.loads(meta_file.read_text())
    ice = next(s for s in m["schemas"]
               if s["schema-id"] == m["current-schema-id"])
    state_id = next(f["id"] for f in ice["fields"] if f["name"] == "state")

    part_schema = copy.deepcopy(_MANIFEST_ENTRY_SCHEMA)
    for f in part_schema["fields"]:
        if f["name"] == "data_file":
            for g in f["type"]["fields"]:
                if g["name"] == "partition":
                    g["type"]["fields"] = [{
                        "name": "state", "type": ["null", "string"],
                        "field-id": 1000}]
    stamped = 0
    for mf in sorted((dest / "metadata").glob("*.avro")):
        _, mrows = read_ocf_bytes(mf.read_bytes())
        if not mrows or "data_file" not in mrows[0]:
            continue
        for e in mrows:
            if e["data_file"].get("content", 0) == 0:
                fp = e["data_file"]["file_path"]
                tbl = pq.read_table(
                    fp[7:] if fp.startswith("file://") else fp)
                # data files store the PHYSICAL column name
                vals = set(tbl.column("status").to_pylist())
                assert len(vals) == 1
                e["data_file"]["partition"] = {"state": vals.pop()}
                stamped += 1
        mf.write_bytes(write_ocf_bytes_with_meta(
            mrows, part_schema,
            {"partition-spec":
                 '[{"name": "state", "transform": "identity", '
                 '"source-id": %d, "field-id": 1000}]' % state_id,
             "partition-spec-id": "0",
             "format-version": "2", "content": "data"}))
    assert stamped == 2
    m["partition-specs"] = [{"spec-id": 0, "fields": [
        {"name": "state", "transform": "identity",
         "source-id": state_id, "field-id": 1000}]}]
    m["default-spec-id"] = 0
    meta_file.write_text(json.dumps(m))

    r = IcebergMetadataReader(spark, dest)
    # partition-only predicate on the LOGICAL name: tuple-planned
    res = r.delete("state = 'A'")
    assert res["rewritten_files"] == 1
    r2 = IcebergMetadataReader(spark, dest)
    assert sorted(x.k for x in r2.to_df().collect()) == list(range(6, 11))
    # data predicate: per-partition rewrite, tuples stay truthful and
    # files keep the PHYSICAL column
    res = r2.update({"price": "price * 2"}, where="k = 6")
    assert res["rewritten_files"] == 1
    r3 = IcebergMetadataReader(spark, dest)
    rows = {x.k: x.price for x in r3.to_df().collect()}
    assert rows[6] == 120.0 and rows[7] == 70.0
    for e in r3._live_data_entries():
        local = r3._local_data(e["data_file"]["file_path"])
        names = set(pq.ParquetFile(local).schema_arrow.names)
        assert "status" in names and "state" not in names
        vals = set(pq.read_table(local).column("status").to_pylist())
        assert vals == {(e["data_file"].get("partition") or {}).get("state")}


def test_added_entry_null_seq_inherits_from_manifest_list(spark, tmp_path):
    """ADVICE r12 (spec "Sequence Number Inheritance"): foreign v2
    writers leave ADDED entries' sequence numbers null — the reader
    must substitute the manifest-list row's sequence_number. Coercing
    null to 0 made every equality delete apply (over-deleting rows) and
    relisting such entries as EXISTING propagated spec-invalid nulls."""
    from lakehouses_spark.tables.iceberg_meta import (
        _MANIFEST_ENTRY_SCHEMA,
        write_ocf_bytes_with_meta,
    )

    # data at seq 1, eq-delete on status='A' ALSO at seq 1: the
    # strictly-below rule keeps every row — once inheritance resolves
    t, dest = _with_delete_manifest(
        spark, tmp_path, 2, [], eq_values=["A"], delete_seq=1,
        dest_name="ice-null-seq")
    meta = json.loads((dest / "metadata" / "v1.metadata.json").read_text())
    snap = meta["snapshots"][-1]
    ml_rel = snap["manifest-list"].rsplit("/metadata/", 1)[1]
    _, ml_rows = read_ocf_bytes((dest / "metadata" / ml_rel).read_bytes())
    data_ml = next(m for m in ml_rows if int(m.get("content", 0) or 0) == 0)
    mf = dest / "metadata" / data_ml["manifest_path"].rsplit(
        "/metadata/", 1)[1]
    _, entries = read_ocf_bytes(mf.read_bytes())
    for e in entries:
        assert e["status"] == 1  # ADDED: inheritance applies
        e["sequence_number"] = None
        e["file_sequence_number"] = None
    mf.write_bytes(write_ocf_bytes_with_meta(
        entries, _MANIFEST_ENTRY_SCHEMA, {"content": "data"}))

    r = IcebergMetadataReader(spark, dest)
    live = r._live_data_entries()
    assert live and all(
        e["sequence_number"] == data_ml["sequence_number"]
        and e["file_sequence_number"] == data_ml["sequence_number"]
        for e in live)
    # same-seq equality delete must NOT apply; null→0 would delete 'A's
    assert read_iceberg(spark, dest).count() == t.read().count()
