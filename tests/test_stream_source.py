"""S16: streaming FROM a LakeTable via the `laketable` Python Data Source —
log-tail offsets, per-file executor partitions, ignoreChanges gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouses_spark.tables import LakeTable
from lakehouses_spark.tables.stream_source import LakeTableDataSource


@pytest.fixture
def table(spark, tmp_path):
    spark.dataSource.register(LakeTableDataSource)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    return LakeTable.create(spark, tmp_path / "t", df)


def _drain(spark, t, tmp_path, name, **opts):
    """Drain to a parquet sink (memory sink can't resume from checkpoint)."""
    out = tmp_path / f"out_{name}"
    reader = spark.readStream.format("laketable").option("path", str(t.path))
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


def test_batch_read_through_source(spark, table):
    got = spark.read.format("laketable").option("path", str(table.path)).load()
    assert sorted(tuple(r) for r in got.collect()) == [(1, "a"), (2, "b")]


def test_stream_tails_the_log(spark, table, tmp_path):
    # initial snapshot
    out = _drain(spark, table, tmp_path, "tail1")
    assert out.count() == 2
    # two more commits land → the resumed drain picks up ONLY the new files
    table.insert_values([{"id": 3, "v": "c"}])
    table.insert_values([{"id": 4, "v": "d"}])
    out = _drain(spark, table, tmp_path, "tail1")  # same checkpoint resumes
    assert sorted(r.id for r in out.collect()) == [1, 2, 3, 4]


def test_stream_fails_on_rewrite_unless_ignore_changes(spark, table, tmp_path):
    _drain(spark, table, tmp_path, "tail2")
    table.delete("id = 1")  # copy-on-write rewrite breaks append-only
    with pytest.raises(Exception, match="ignoreChanges"):
        _drain(spark, table, tmp_path, "tail2")
    # with the option set, a fresh stream reads appended/rewritten files
    out = _drain(spark, table, tmp_path, "tail4", ignoreChanges="true")
    assert out.count() >= 1


def test_initial_snapshot_tolerates_dml_history(spark, table, tmp_path):
    """r10 parity with the deltatable/icebergtable twins: a FRESH stream
    (no startingVersion) opens on the CURRENT snapshot, so COW DML in
    history neither fails nor replays stale pre-DML files."""
    table.delete("id = 1")                       # COW rewrite in history
    table.insert_values([{"id": 3, "v": "c"}])
    out = _drain(spark, table, tmp_path, "snap")
    assert sorted(r.id for r in out.collect()) == [2, 3]
    # the tail after the snapshot is incremental, same checkpoint
    table.insert_values([{"id": 4, "v": "d"}])
    out = _drain(spark, table, tmp_path, "snap")
    assert sorted(r.id for r in out.collect()) == [2, 3, 4]


def test_starting_version_replays_adds(spark, table, tmp_path):
    """startingVersion=N keeps the per-commit replay spelling."""
    table.insert_values([{"id": 3, "v": "c"}])
    out = _drain(spark, table, tmp_path, "sv", startingVersion="1")
    assert sorted(r.id for r in out.collect()) == [3]
    out = _drain(spark, table, tmp_path, "sv0", startingVersion="0")
    assert sorted(r.id for r in out.collect()) == [1, 2, 3]


def test_initial_snapshot_gates_on_live_tombstones(spark, table, tmp_path):
    """Active merge-on-read tombstones would resurrect deleted rows in a
    whole-file read — fail fast unless ignoreChanges (the DV gate the
    external twins apply)."""
    table.delete("id = 1", lazy=True)            # MOR tombstone stays live
    with pytest.raises(Exception, match="ignoreChanges"):
        _drain(spark, table, tmp_path, "tomb")
    out = _drain(spark, table, tmp_path, "tomb2", ignoreChanges="true")
    assert sorted(r.id for r in out.collect()) == [1, 2]  # incl. deleted


def test_streaming_agg_over_table_source(spark, table, tmp_path):
    """The reference's live pattern: stream → groupBy → complete sink while
    inserts land (02.delta_lake_primer.py:133-151)."""
    table.insert_values([{"id": 5, "v": "a"}])
    stream = spark.readStream.format("laketable").option("path", str(table.path)).load()
    q = (
        stream.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("agg_src")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_agg"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.v: r.n for r in spark.sql("SELECT * FROM agg_src").collect()}
    assert got == {"a": 2, "b": 1}


def test_streaming_change_feed_drains_table_changes(spark, tmp_path):
    """Streaming CDF (r9 — Delta's readStream readChangeFeed=true): the
    drained feed equals LakeTable.table_changes over the same version
    range — cdc files consumed, appends derived as inserts, commit
    metadata stamped Arrow-side; a resumed drain picks up ONLY new
    commits' changes; unrecorded DML fails the stream."""
    from lakehouses_spark.tables.table import CDF_PROPERTY

    spark.dataSource.register(LakeTableDataSource)
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], float(i)) for i in range(1, 11)],
        "id int, v string, price double")
    t = LakeTable.create(spark, tmp_path / "cdf_t", df)      # v0
    t.set_properties({CDF_PROPERTY: "true"})                 # v1
    t.update({"price": "price * 2"}, where="id <= 2")        # v2
    t.delete("id >= 9")                                      # v3

    def drain(name):
        out = tmp_path / f"out_{name}"
        q = (
            spark.readStream.format("laketable")
            .option("path", str(t.path))
            .option("readChangeFeed", "true")
            .load()
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(out))

    def key(df_):
        return sorted(
            (r["_commit_version"], r["_change_type"], r["id"], r["price"])
            for r in df_.collect()
        )

    got = drain("cdf1")
    assert set(got.columns) == {"id", "v", "price", "_change_type",
                                "_commit_version", "_commit_timestamp"}
    assert key(got) == key(t.table_changes(0, 3))
    assert got.where(F.col("_commit_timestamp").isNull()).count() == 0

    # new commits only on resume
    t.merge(spark.createDataFrame([(100, "z", 5.0)],
                                  "id int, v string, price double"),
            on="t.id = s.id")                                # v4
    got2 = drain("cdf1")  # same checkpoint resumes
    assert key(got2) == key(t.table_changes(0, 4))

    # unrecorded DML → stream fails fast
    t2 = LakeTable.create(
        spark, tmp_path / "cdf_off",
        spark.createDataFrame([(1, "a", 1.0)], "id int, v string, price double"))
    t2.delete("id = 1")  # CDF off
    with pytest.raises(Exception, match="change data not recorded"):
        out = tmp_path / "out_off"
        q = (
            spark.readStream.format("laketable")
            .option("path", str(t2.path))
            .option("readChangeFeed", "true")
            .load()
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt_off"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
