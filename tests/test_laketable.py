"""LakeTable ACID/DML/time-travel tests mirroring the reference's
delta_lake_primer sequence (SURVEY §5 items 2 & 4):

- CTAS → INSERT → DELETE → UPDATE → MERGE with version-N snapshot checks
  (02.delta_lake_primer.py:93-320, 404-421)
- schema enforcement negative test + mergeSchema evolution (:354-362)
- convertToDelta incl. the mandatory-partition-spec failure (01.parquet_
  primer.py:185,348-369)
- VACUUM orphan cleanup (:442), OPTIMIZE compaction, stats-based skipping
- optimistic-concurrency conflict
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from lakehouses_spark.tables import LakeCatalog, LakeTable, SchemaMismatchError
from lakehouses_spark.tables.log import ConcurrentWriteError, try_commit


@pytest.fixture
def people(spark):
    return spark.createDataFrame(
        [(1, "ana", 30000.0), (2, "luis", 40000.0), (3, "eva", 50000.0)],
        "id int, name string, salario double",
    )


def test_footer_stats_match_distributed_agg(spark, tmp_path, monkeypatch):
    """Small commits take the parquet-FOOTER stats fast path (no second
    Spark job); its add actions must be IDENTICAL to the distributed
    `_stat_aggs` job's — min/max per column with NULLs ignored, all-NULL
    columns → None, date/timestamp serialization, num_records, sizes.
    Footers that can't reproduce the agg exactly (long strings past the
    writer's statistics cap, NaN floats) must fall back, not emit
    truncated bounds."""
    import datetime as dt

    from lakehouses_spark.tables import table as tbl

    rows = [
        {"k": i, "s": f"name-{i:03d}", "d": dt.date(2024, 1, 1 + i % 20),
         "ts": dt.datetime(2024, 1, 1, i % 24, 30), "f": float(i) - 5.5,
         "b": i % 2 == 0, "n": None}
        for i in range(40)
    ]
    schema = ("k long, s string, d date, ts timestamp, f double, "
              "b boolean, n string")
    df = spark.createDataFrame(rows, schema).repartition(4)

    t_fast = LakeTable.create(spark, tmp_path / "fast", df)
    monkeypatch.setattr(tbl, "FOOTER_STATS_MAX_FILES", -1)  # force Spark job
    t_slow = LakeTable.create(spark, tmp_path / "slow", df)
    monkeypatch.undo()

    def stats_of(t):
        # file NAMES differ between the two writes (uuid dirs) — compare
        # the multiset of (num_records, stats) payloads
        return sorted(
            (a["num_records"], json.dumps(a["stats"], sort_keys=True))
            for a in t.state().files.values()
        )

    fast, slow = stats_of(t_fast), stats_of(t_slow)
    assert fast == slow
    fast = [(n, json.loads(s)) for n, s in fast]
    # stats actually landed (skipping works off them)
    assert all(s["k"]["min"] is not None for _, s in fast)
    assert all(s["n"]["min"] is None for _, s in fast)  # all-NULL column

    # long strings: parquet-mr drops the column's min/max -> fall back to
    # the distributed agg (never truncated bounds), stats still complete
    big = spark.createDataFrame(
        [{"k": 1, "s": "x" * 5000}, {"k": 2, "s": "y" * 5000}],
        "k long, s string").coalesce(1)
    t_big = LakeTable.create(spark, tmp_path / "big", big)
    a = next(iter(t_big.state().files.values()))
    assert a["stats"]["s"]["min"].startswith("x")  # exact, via Spark agg
    assert len(a["stats"]["s"]["min"]) == 5000

    # NaN floats: writer drops min/max -> fallback keeps Spark's NaN-max
    nan = spark.createDataFrame(
        [{"k": 1, "f": 1.0}, {"k": 2, "f": float("nan")}],
        "k long, f double").coalesce(1)
    t_nan = LakeTable.create(spark, tmp_path / "nan", nan)
    a = next(iter(t_nan.state().files.values()))
    assert a["stats"]["k"]["min"] == 1  # commit completed with full stats


def test_ctas_read_roundtrip(spark, tmp_path, people):
    t = LakeTable.create(spark, tmp_path / "t", people)
    assert t.version == 0
    got = sorted(tuple(r) for r in t.read().collect())
    assert got == [(1, "ana", 30000.0), (2, "luis", 40000.0), (3, "eva", 50000.0)]
    assert t.detail()["num_records"] == 3


def test_dml_sequence_and_time_travel(spark, tmp_path, people):
    """The delta_lake_primer DML arc with per-version snapshot assertions."""
    t = LakeTable.create(spark, tmp_path / "t", people)
    t.insert_values([{"id": 4, "name": "joan", "salario": 60000.0}])  # v1 INSERT
    t.delete("id = 2")                                                # v2 DELETE
    t.update({"salario": "salario * 1.10"}, where="id = 1")           # v3 UPDATE
    src = spark.createDataFrame(
        [(1, "ana maria", 99000.0), (5, "noa", 70000.0)],
        "id int, name string, salario double",
    )
    t.merge(src, "t.id = s.id")                                       # v4 MERGE

    assert t.version == 4
    # current state: 1 updated by merge, 2 deleted, 3 untouched, 4 inserted, 5 merged-in
    cur = {r.id: (r.name, round(r.salario, 2)) for r in t.read().collect()}
    assert cur == {
        1: ("ana maria", 99000.0),
        3: ("eva", 50000.0),
        4: ("joan", 60000.0),
        5: ("noa", 70000.0),
    }
    # VERSION AS OF checks (02.delta_lake_primer.py:404-421)
    assert t.read(version=0).count() == 3
    assert t.read(version=1).count() == 4
    assert {r.id for r in t.read(version=2).collect()} == {1, 3, 4}
    v3 = {r.id: round(r.salario, 2) for r in t.read(version=3).collect()}
    assert v3[1] == 33000.0  # 30000 * 1.10
    # TIMESTAMP AS OF: travel to v1's commit time
    ts1 = t.history().where("version = 1").collect()[0].timestamp_ms
    assert t.read(timestamp_ms=ts1).count() == 4
    # history operations recorded (DESCRIBE HISTORY)
    ops = [r.operation for r in t.history().orderBy("version").collect()]
    assert ops == ["CREATE TABLE AS SELECT", "WRITE", "DELETE", "UPDATE", "MERGE"]


def test_merge_insert_only_and_delete(spark, tmp_path, people):
    t = LakeTable.create(spark, tmp_path / "t", people)
    src = spark.createDataFrame([(3, "x", 1.0), (9, "nine", 9.0)],
                                "id int, name string, salario double")
    # matched-delete + not-matched-insert
    t.merge(src, "t.id = s.id", when_matched_update=None,
            when_matched_delete=True, when_not_matched_insert="all")
    got = {r.id for r in t.read().collect()}
    assert got == {1, 2, 9}


def test_schema_enforcement_and_evolution(spark, tmp_path, people):
    t = LakeTable.create(spark, tmp_path / "t", people)
    widened = people.withColumn("depto", F.lit("eng"))
    with pytest.raises(SchemaMismatchError):
        t.append(widened)  # 02.delta_lake_primer.py:354-358 expected failure
    t.append(widened, merge_schema=True)  # :362 mergeSchema
    assert set(t.schema().names) == {"id", "name", "salario", "depto"}
    # old rows read as null in the new column
    assert t.read().where("depto IS NULL").count() == 3
    # type conflict is always rejected
    bad = spark.createDataFrame([(1, "x", "notadouble", "d")],
                                "id int, name string, salario string, depto string")
    with pytest.raises(SchemaMismatchError):
        t.append(bad, merge_schema=True)


def test_convert_from_parquet(spark, tmp_path, people):
    plain = tmp_path / "plain"
    people.write.parquet(str(plain))
    t = LakeTable.convert_from_parquet(spark, plain)
    assert t.read().count() == 3
    # data files were registered in place, not rewritten
    assert t.history().collect()[0].operation == "CONVERT"
    # now DML works on what was a plain parquet dir
    t.delete("id = 1")
    assert t.read().count() == 2


def test_convert_partitioned_requires_spec(spark, tmp_path, people):
    part = tmp_path / "part"
    people.withColumn("m", F.col("id") % 2).write.partitionBy("m").parquet(str(part))
    with pytest.raises(ValueError, match="partition_spec"):
        LakeTable.convert_from_parquet(spark, part)  # 01.parquet_primer.py:348-369
    t = LakeTable.convert_from_parquet(spark, part, partition_spec={"m": "int"})
    assert t.read().count() == 3
    assert "m" in t.schema().names


def test_vacuum(spark, tmp_path, people):
    t = LakeTable.create(spark, tmp_path / "t", people)
    t.delete("id = 1")  # v1 rewrites the file; v0's file becomes historical
    orphans_if_keep_current_only = t.vacuum(dry_run=True)
    assert orphans_if_keep_current_only  # v0 file is vacuum-able
    assert t.read(version=0).count() == 3  # still readable pre-vacuum
    t.vacuum()
    with pytest.raises(Exception):
        t.read(version=0).collect()  # time travel beyond horizon gone
    assert t.read().count() == 2  # current snapshot intact


def test_optimize_compacts_small_files(spark, tmp_path):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    t = LakeTable.create(spark, tmp_path / "t", df.repartition(8))
    assert t.detail()["num_files"] == 8
    res = t.optimize(target_records_per_file=1000)
    assert res["compacted_files"] == 8
    assert t.detail()["num_files"] == 1
    assert t.read().count() == 100


def test_stats_based_file_skipping(spark, tmp_path):
    df = spark.range(1000).withColumn("bucket", (F.col("id") / 100).cast("int"))
    t = LakeTable.create(spark, tmp_path / "t", df, partition_by=["bucket"], num_files=5)
    st = t.state()
    # clustered write → several files, each with narrow bucket range
    pruned = [
        add for add in st.files.values()
        if not __import__("lakehouses_spark.tables.table", fromlist=["_file_may_match"])
        ._file_may_match(add, [("bucket", "=", 3)])
    ]
    assert pruned, "expected stats to prune at least one file"
    assert t.read(filters=[("bucket", "=", 3)]).count() == 100


def test_concurrent_appends_auto_resolve(spark, tmp_path, people):
    """Blind appends retry through optimistic conflicts: N racing writers
    all land, one version each, no lost updates."""
    from concurrent.futures import ThreadPoolExecutor

    t = LakeTable.create(spark, tmp_path / "t", people.limit(0))
    def write(i: int) -> None:
        df = spark.createDataFrame([(100 + i, f"w{i}", float(i))],
                                   "id int, name string, salario double")
        LakeTable(spark, tmp_path / "t").append(df)

    with ThreadPoolExecutor(max_workers=6) as ex:
        list(ex.map(write, range(6)))
    assert t.read().count() == 6
    assert t.version == 6  # six distinct commits, no clobbering


def test_optimize_zorder_multi_dim_skipping(spark, tmp_path):
    """Z-order rewrite gives file skipping on BOTH clustered columns."""
    from lakehouses_spark.tables.table import _file_may_match

    df = (
        spark.range(4000)
        .selectExpr("id", "CAST(id % 64 AS INT) AS x", "CAST(CAST(id / 64 AS INT) AS INT) AS y")
    )
    t = LakeTable.create(spark, tmp_path / "t", df)
    t.optimize_zorder(["x", "y"], num_files=16)
    st = t.state()
    assert len(st.files) >= 8

    def skipped(filters) -> int:
        return sum(0 if _file_may_match(a, filters) else 1 for a in st.files.values())

    # both dimensions must prune a majority of files
    assert skipped([("x", "=", 3)]) > len(st.files) // 2
    assert skipped([("y", "=", 3)]) > len(st.files) // 2
    # and results stay correct through the pruned read path
    assert t.read(filters=[("x", "=", 3)]).count() == df.where("x = 3").count()


def test_protocol_version_guard(spark, tmp_path, people):
    """A table demanding a newer reader protocol fails fast on read."""
    from lakehouses_spark.tables.log import ProtocolError, try_commit

    t = LakeTable.create(spark, tmp_path / "t", people)
    try_commit(t.path, 1, {"operation": "UPGRADE",
                           "protocol": {"min_reader": 99}})
    with pytest.raises(ProtocolError, match="reader protocol 99"):
        t.read()


def test_recluster_partition_evolution(spark, tmp_path):
    from lakehouses_spark.tables.table import _file_may_match

    df = spark.range(1000).selectExpr(
        "id", "CAST(id % 10 AS INT) AS a", "CAST(id % 7 AS INT) AS b"
    )
    t = LakeTable.create(spark, tmp_path / "t", df, partition_by=["a"], num_files=5)
    res = t.recluster(["b"], num_files=5)
    assert res["rewritten_files"] >= 1
    assert t.state().partition_by == ["b"]
    # stats now cluster on b → pruning works on the new key
    st = t.state()
    pruned = sum(0 if _file_may_match(add, [("b", "=", 3)]) else 1
                 for add in st.files.values())
    assert pruned > 0
    assert t.read().count() == 1000


def test_concurrent_commit_conflict(spark, tmp_path, people):
    t = LakeTable.create(spark, tmp_path / "t", people)
    # a competing writer claims version 1 first
    try_commit(t.path, 1, {"operation": "WRITE"})
    with pytest.raises(ConcurrentWriteError):
        try_commit(t.path, 1, {"operation": "WRITE"})


def test_restore_to_version(spark, tmp_path, people):
    """RESTORE: roll back as a new auditable commit; forward history kept."""
    t = LakeTable.create(spark, tmp_path / "t", people)          # v0: 3 rows
    t.delete("id = 1")                                           # v1: 2 rows
    t.insert_values([{"id": 9, "name": "x", "salario": 1.0}])    # v2: 3 rows
    res = t.restore(0)
    assert res == {"restored_to": 0, "new_version": 3}
    assert {r.id for r in t.read().collect()} == {1, 2, 3}       # v0 content
    # the rollback itself is in history and reversible
    ops = [r.operation for r in t.history().orderBy("version").collect()]
    assert ops[-1] == "RESTORE"
    assert t.read(version=2).count() == 3 and {r.id for r in t.read(version=2).collect()} == {2, 3, 9}
    t.restore(2)  # roll forward again
    assert {r.id for r in t.read().collect()} == {2, 3, 9}


def test_log_cleanup_and_fsck(spark, tmp_path, people):
    t = LakeTable.create(spark, tmp_path / "t", people)
    for i in range(14):  # cross the checkpoint interval
        t.insert_values([{"id": 100 + i, "name": f"p{i}", "salario": 1.0}])
    removed = t.cleanup_log(keep_versions=4)
    assert removed and max(removed) < 11
    # current state fully intact after log truncation
    assert t.read().count() == 3 + 14
    assert t.version == 14
    # fsck: healthy table
    rep = t.fsck(deep=True)
    assert rep["ok"] and not rep["missing_files"] and not rep["count_mismatches"]
    # fsck detects a manually-deleted data file
    victim = next(iter(t.state().files))
    (t.path / victim).unlink()
    rep = t.fsck()
    assert not rep["ok"] and rep["missing_files"] == [victim]


def test_checkpoint_replay(spark, tmp_path, people):
    t = LakeTable.create(spark, tmp_path / "t", people)
    for i in range(12):
        t.insert_values([{"id": 100 + i, "name": f"p{i}", "salario": 1.0}])
    ckpts = list((t.path / "_tx_log").glob("checkpoint-*.json"))
    assert ckpts, "checkpoint should exist after 10+ commits"
    assert t.read().count() == 3 + 12
    assert t.read(version=5).count() == 3 + 5  # pre-checkpoint time travel intact


def test_drop_external_table_keeps_data(spark, tmp_path, people):
    """ADVICE r2: DROP TABLE on an external table (CREATE ... LOCATION) must
    remove only the catalog pointer — the user's data directory survives,
    matching Delta/Spark external-table semantics."""
    cat = LakeCatalog(spark, tmp_path / "wh")
    cat.create_database("bronze")
    ext = tmp_path / "external" / "people_data"
    cat.create_table("bronze.ext_people", people, location=ext)
    assert cat.tables("bronze") == ["ext_people"]
    cat.drop_table("bronze.ext_people")
    assert cat.tables("bronze") == []
    # external data untouched and still a readable lake table
    assert (ext / "_tx_log").is_dir()
    assert LakeTable(spark, ext).read().count() == 3
    # managed tables are still physically deleted
    cat.create_table("bronze.managed", people)
    slot = tmp_path / "wh" / "bronze" / "managed"
    assert slot.is_dir()
    cat.drop_table("bronze.managed")
    assert not slot.exists()


def test_catalog_ddl_and_sql(spark, tmp_path, people):
    cat = LakeCatalog(spark, tmp_path / "wh")
    cat.create_database("bronze")
    assert "bronze" in cat.databases()
    cat.create_table("bronze.people", people)
    assert cat.tables("bronze") == ["people"]
    view = cat.register("bronze.people")
    assert spark.sql(f"SELECT count(*) AS n FROM {view}").collect()[0].n == 3
    # time-travel view after DML
    cat.table("bronze.people").delete("id = 1")
    v0 = cat.register("bronze.people", view_name="people_v0", version=0)
    assert spark.sql(f"SELECT count(*) AS n FROM {v0}").collect()[0].n == 3
    cat.drop_table("bronze.people")
    assert cat.tables("bronze") == []
    cat.create_table("bronze.again", people)
    with pytest.raises(ValueError, match="not empty"):
        cat.drop_database("bronze")
    cat.drop_database("bronze", cascade=True)
    assert "bronze" not in cat.databases()


def test_snapshots_metadata_table(spark, tmp_path, people):
    """D11 .snapshots: per-commit deltas + cumulative totals, and the SQL
    surface resolves <table>.snapshots like Iceberg's metadata tables."""
    from lakehouses_spark.tables import LakeSQL

    cat = LakeCatalog(spark, tmp_path / "wh")
    cat.create_table("default.emp", people)
    t = cat.table("default.emp")
    t.insert_values([{"id": 9, "name": "x", "salario": 1.0}])
    t.delete("id = 1")
    snaps = {r.version: r for r in t.snapshots().collect()}
    assert [snaps[v].operation for v in sorted(snaps)] \
        == ["CREATE TABLE AS SELECT", "WRITE", "DELETE"]
    assert snaps[0].total_records == 3
    assert snaps[1].total_records == 4 and snaps[1].added_records == 1
    assert snaps[2].total_records == 3 and snaps[2].removed_files >= 1
    lake = LakeSQL(cat)
    via_sql = lake.sql(
        "SELECT version, operation, total_records FROM default.emp.snapshots "
        "ORDER BY version"
    ).collect()
    assert [(r.version, r.total_records) for r in via_sql] == [(0, 3), (1, 4), (2, 3)]
    assert lake.sql("SELECT count(*) AS n FROM default.emp.files").collect()[0].n >= 1


def test_collect_affected_guard_trips(spark, tmp_path, people):
    """VERDICT r4 #5: the matched-file collect streams via toLocalIterator
    and fails loudly — BEFORE driver memory does — if the distinct file set
    ever exceeds the transaction log's live-file count (a log/scan
    mismatch, impossible for healthy metadata)."""
    t = LakeTable.create(spark, tmp_path / "t", people)
    hits = spark.createDataFrame(
        [(f"file:///x/part-{i}.parquet",) for i in range(5)], "__fp string"
    )
    with pytest.raises(RuntimeError, match="live-file count"):
        t._collect_affected(hits, 3)
    # and under the true bound it returns all paths
    assert len(t._collect_affected(hits, 5)) == 5


@pytest.mark.slow  # the 5k-file sizing IS the pin (~70 s)
def test_merge_many_files_rewrites_only_matched(spark, tmp_path):
    """VERDICT r4 #5 companion: MERGE against a table recustered into ~5k
    files rewrites ONLY the files holding matched keys (stats/semi-join
    pruning), with the bounded streaming collect handling the 5k-file
    metadata walk."""
    n_files = 5000
    df = spark.range(5200).select(
        F.col("id").cast("int").alias("id"), (F.col("id") * 2.0).alias("v")
    )
    t = LakeTable.create(spark, tmp_path / "many", df)
    stats = t.recluster(["id"], num_files=n_files)
    assert stats["new_files"] >= n_files * 0.9  # range-clustered small files
    keys = list(range(0, 5200, 104))  # 50 keys spread across the range
    src = spark.createDataFrame([(k, -1.0) for k in keys], "id int, v double")
    res = t.merge(src, "t.id = s.id", when_not_matched_insert=None)
    # ~1 row per file: the rewrite set is the matched files, not the table
    assert 0 < res["rewritten_files"] <= len(keys) * 2
    got = {r.id: r.v for r in t.read().where(F.col("id").isin(keys)).collect()}
    assert got == {k: -1.0 for k in keys}
    assert t.read().count() == 5200
