"""Log-integrity regressions: timestamp replay through checkpoints after log
truncation, gap detection, torn-checkpoint fallback, RESTORE × tombstones,
and MERGE UPDATE SET * verbatim-NULL / multiple-match semantics."""

from __future__ import annotations

import json

import pytest

from lakehouses_spark.tables import LakeTable
from lakehouses_spark.tables.table import MergeMultipleMatchesError
from lakehouses_spark.tables import log as txlog


@pytest.fixture
def people(spark):
    return spark.createDataFrame(
        [(1, "ana", 30000.0), (2, "luis", 40000.0), (3, "eva", 50000.0)],
        "id int, name string, salario double",
    )


def _grown(spark, tmp_path, people, n=14):
    """Table with >CHECKPOINT_INTERVAL commits so a checkpoint exists."""
    t = LakeTable.create(spark, tmp_path / "t", people)
    for i in range(n):
        t.insert_values([{"id": 100 + i, "name": f"p{i}", "salario": 1.0}])
    return t


def test_timestamp_read_after_log_cleanup(spark, tmp_path, people):
    """TIMESTAMP AS OF at a current timestamp must stay correct after
    cleanup_log truncates commits below the checkpoint (ADVICE r1 high)."""
    t = _grown(spark, tmp_path, people)
    now_ms = t.history().agg({"timestamp_ms": "max"}).collect()[0][0]
    expect = t.read().count()
    removed = t.cleanup_log(keep_versions=4)
    assert removed  # commits were actually truncated
    assert t.read(timestamp_ms=now_ms).count() == expect
    # a kept historical version still replays through the checkpoint
    assert t.read(version=12).count() == 3 + 12
    # timestamps older than the horizon are honestly refused, not wrong
    with pytest.raises(ValueError, match="truncated|no commit"):
        t.read(timestamp_ms=1)


def test_snapshots_totals_survive_log_cleanup(spark, tmp_path, people):
    """ADVICE r2: after cleanup_log truncates commits below the checkpoint,
    snapshots() must seed its cumulative walk from the checkpoint — kept
    versions' total_files/total_records must still count files added before
    the truncation horizon."""
    t = _grown(spark, tmp_path, people)
    before = {
        r.version: (r.total_files, r.total_records, r.total_bytes)
        for r in t.snapshots().collect()
    }
    assert t.cleanup_log(keep_versions=4)
    after = {
        r.version: (r.total_files, r.total_records, r.total_bytes)
        for r in t.snapshots().collect()
    }
    assert after  # kept versions still listed
    for v, totals in after.items():
        assert totals == before[v], f"v{v} totals drifted after cleanup"
    # the newest version's totals agree with the live snapshot
    top = max(after)
    assert after[top][1] == t.read().count()


def test_replay_raises_on_missing_commit_gap(spark, tmp_path, people):
    """A commit file deleted out-of-band must fail replay loudly, never
    silently reconstruct a partial table."""
    t = LakeTable.create(spark, tmp_path / "t", people)
    for i in range(3):
        t.insert_values([{"id": 10 + i, "name": "x", "salario": 1.0}])
    (txlog.log_dir(t.path) / f"{2:010d}.json").unlink()
    with pytest.raises(RuntimeError, match="missing"):
        t.read().count()


def test_torn_checkpoint_falls_back(spark, tmp_path, people):
    """A truncated/corrupt checkpoint must not brick reads — fall back to the
    previous checkpoint or full log replay (ADVICE r1 low)."""
    t = _grown(spark, tmp_path, people, n=12)
    ckpts = sorted(txlog.log_dir(t.path).glob("checkpoint-*.json"))
    assert ckpts
    ckpts[-1].write_text('{"version": 10, "files"')  # torn mid-write
    assert t.read().count() == 3 + 12
    # and cleanup_log ignores the unreadable checkpoint (no eligible horizon)
    assert t.cleanup_log(keep_versions=1) == []


def test_restore_preserves_tombstones(spark, tmp_path, people):
    """Restoring to a version with active lazy-delete tombstones must not
    resurrect the deleted rows (ADVICE r1 medium)."""
    t = LakeTable.create(spark, tmp_path / "t", people)        # v0
    t.delete("id = 1", lazy=True)                              # v1: tombstone
    assert {r.id for r in t.read().collect()} == {2, 3}
    t.insert_values([{"id": 9, "name": "x", "salario": 1.0}])  # v2
    t.restore(1)                                               # back to v1
    assert {r.id for r in t.read().collect()} == {2, 3}, \
        "lazy-deleted row must stay deleted after RESTORE"
    # restoring to v0 (before the delete) clears the tombstone again
    t.restore(0)
    assert {r.id for r in t.read().collect()} == {1, 2, 3}


def test_restore_tombstones_still_version_scoped(spark, tmp_path, people):
    """After RESTORE, a re-insert newer than the restored tombstone is still
    visible (add_version preserved through the restore commit)."""
    t = LakeTable.create(spark, tmp_path / "t", people)        # v0
    t.delete("id = 1", lazy=True)                              # v1
    t.insert_values([{"id": 1, "name": "nueva", "salario": 7.0}])  # v2
    assert [r.name for r in t.read().where("id = 1").collect()] == ["nueva"]
    t.insert_values([{"id": 50, "name": "z", "salario": 1.0}])  # v3
    t.restore(2)
    got = t.read().where("id = 1").collect()
    assert [r.name for r in got] == ["nueva"], \
        "re-inserted row must survive RESTORE; original stays tombstoned"
    assert t.read().count() == 3  # ids {1(nueva), 2, 3}


def test_merge_update_all_null_overwrites(spark, tmp_path, people):
    """UPDATE SET * takes source values verbatim: a NULL in the source
    overwrites a non-NULL target value (ADVICE r1 medium)."""
    t = LakeTable.create(spark, tmp_path / "t", people)
    src = spark.createDataFrame(
        [(1, None, 99.0)], "id int, name string, salario double"
    )
    t.merge(src, on="t.id = s.id")
    row = t.read().where("id = 1").collect()[0]
    assert row.name is None and row.salario == 99.0
    assert t.read().count() == 3


def test_merge_multiple_source_matches_raises(spark, tmp_path, people):
    t = LakeTable.create(spark, tmp_path / "t", people)
    src = spark.createDataFrame(
        [(1, "a", 1.0), (1, "b", 2.0)], "id int, name string, salario double"
    )
    with pytest.raises(MergeMultipleMatchesError):
        t.merge(src, on="t.id = s.id")
    # delete-only merges tolerate multiple matches (deterministic result)
    t.merge(src, on="t.id = s.id", when_matched_update=None,
            when_not_matched_insert=None, when_matched_delete=True)
    assert {r.id for r in t.read().collect()} == {2, 3}


def test_cleanup_log_horizon_is_a_checkpoint(spark, tmp_path, people):
    """Every version kept by cleanup_log must still be replayable."""
    t = _grown(spark, tmp_path, people, n=25)  # checkpoints at 10, 20
    removed = t.cleanup_log(keep_versions=10)  # keep_floor=16 → horizon=10
    assert removed == list(range(0, 10))
    for v in range(10, 26):
        assert t.read(version=v).count() == 3 + v  # all kept versions replay
