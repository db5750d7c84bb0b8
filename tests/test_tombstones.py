"""Merge-on-read deletes (predicate tombstones): O(1) delete commits,
version-aware shadowing (rewrites/re-inserts are never hidden),
materialization, time travel."""

from __future__ import annotations

import pytest

from lakehouses_spark.tables import LakeTable


@pytest.fixture
def t(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, float(i * 10)) for i in range(1, 7)], "id int, v double"
    )
    return LakeTable.create(spark, tmp_path / "t", df)


def test_lazy_delete_is_metadata_only(spark, t):
    files_before = set(t.state().files)
    res = t.delete("id <= 2", lazy=True)
    assert res == {"rewritten_files": 0, "tombstones": 1}
    assert set(t.state().files) == files_before  # no rewrite
    assert sorted(r.id for r in t.read().collect()) == [3, 4, 5, 6]
    # stacked tombstones compose
    t.delete("id = 6", lazy=True)
    assert sorted(r.id for r in t.read().collect()) == [3, 4, 5]
    # time travel: v0 still sees everything
    assert t.read(version=0).count() == 6


def test_reinsert_after_lazy_delete_is_visible(spark, t):
    t.delete("id = 1", lazy=True)
    assert t.read().where("id = 1").count() == 0
    # re-inserting a row matching the tombstone predicate must NOT be hidden
    # (tombstones only shadow files older than themselves)
    t.insert_values([{"id": 1, "v": 999.0}])
    got = t.read().where("id = 1").collect()
    assert len(got) == 1 and got[0].v == 999.0


def test_cow_dml_after_lazy_delete_does_not_resurrect(spark, t):
    t.delete("id <= 2", lazy=True)
    # an update whose predicate overlaps deleted rows: rewrite reads the
    # tombstone-filtered snapshot, so deleted rows stay gone
    t.update({"v": "v + 1"}, where="id <= 3")
    ids = sorted(r.id for r in t.read().collect())
    assert ids == [3, 4, 5, 6]
    assert t.read().where("id = 3").collect()[0].v == 31.0


def test_materialize_tombstones(spark, t):
    t.delete("id <= 2", lazy=True)
    res = t.materialize_tombstones()
    assert res["rewritten_files"] >= 1
    assert not t.state().tombstones
    assert sorted(r.id for r in t.read().collect()) == [3, 4, 5, 6]
    # idempotent when clean
    assert t.materialize_tombstones() == {"rewritten_files": 0}


def test_tombstones_survive_checkpoint(spark, t):
    t.delete("id = 1", lazy=True)
    for i in range(11):  # cross the checkpoint interval
        t.insert_values([{"id": 100 + i, "v": 1.0}])
    assert (t.path / "_tx_log").glob("checkpoint-*")
    assert t.read().where("id = 1").count() == 0  # tombstone still applies
    assert t.read().count() == 5 + 11
