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
