"""Streaming materialized view: source-table appends flow through the
windowed aggregation into the gold MERGE target; re-running maintains rather
than duplicates; gold equals the batch aggregate at every step."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouses_spark.io import load_table
from lakehouses_spark.streaming.materialized import start_rollup_view
from lakehouses_spark.streaming.windows import tumbling_window_agg
from lakehouses_spark.tables import LakeTable

SF = "/root/testdata/sf0.001"


def _norm(df):
    return sorted(
        (str(r.window_start), r.event_type, r.n_events, r.total_value)
        for r in df.collect()
    )


@pytest.fixture
def bronze(spark, tmp_path):
    events = load_table(spark, SF, "events")
    first_day = events.where(F.dayofmonth("ts") == 1)
    return LakeTable.create(spark, tmp_path / "bronze", first_day), events


def test_rollup_view_maintains_gold(spark, tmp_path, bronze):
    table, events = bronze
    gold_path = tmp_path / "gold"
    ckpt = tmp_path / "ckpt"

    q = start_rollup_view(spark, table.path, gold_path, ckpt)
    q.awaitTermination()
    gold = LakeTable(spark, gold_path)
    want = tumbling_window_agg(table.read())
    assert _norm(gold.read()) == _norm(want)

    # late/new data lands in bronze → resumed view updates only those windows
    table.append(events.where(F.dayofmonth("ts") == 2))
    q = start_rollup_view(spark, table.path, gold_path, ckpt)
    q.awaitTermination()
    want2 = tumbling_window_agg(table.read())
    assert _norm(gold.read()) == _norm(want2)
    # the view MERGEd new windows rather than rewriting the world
    ops = [r.operation for r in gold.history().collect()]
    assert ops.count("MERGE") >= 2

    # idle re-run: no new commits beyond the checkpoint replay guard
    v = gold.version
    q = start_rollup_view(spark, table.path, gold_path, ckpt)
    q.awaitTermination()
    assert gold.version == v  # nothing new to process → no commits


def test_rollup_view_replay_after_checkpoint_loss_is_idempotent(
    spark, tmp_path, bronze
):
    """Exactly-once under the worst replay: the stream checkpoint is lost
    entirely, so a restarted view reprocesses the source from offset zero
    and re-presents batch 0 — the (app_id, batch_id) transaction guard must
    skip the already-applied MERGE rather than double-apply it."""
    import shutil

    table, _ = bronze
    gold_path = tmp_path / "gold"
    ckpt = tmp_path / "ckpt"

    q = start_rollup_view(spark, table.path, gold_path, ckpt)
    q.awaitTermination()
    gold = LakeTable(spark, gold_path)
    v = gold.version
    before = _norm(gold.read())

    shutil.rmtree(ckpt)  # simulate losing the streaming checkpoint
    q = start_rollup_view(spark, table.path, gold_path, ckpt)
    q.awaitTermination()
    assert gold.version == v, "replayed batch must not commit again"
    assert _norm(gold.read()) == before


def test_apply_changes_replay_after_checkpoint_loss_is_idempotent(
    spark, tmp_path
):
    """Streaming APPLY CHANGES (streaming/cdc.py): same worst-case replay
    as the rollup view — checkpoint wiped, source replayed from offset
    zero — the (app_id, batch_id) guard must skip the already-applied
    delete/upsert merges, leaving both version chain and state identical."""
    import shutil

    from pyspark.sql import Window

    from lakehouses_spark.streaming.cdc import start_apply_changes

    events = load_table(spark, SF, "events").select(
        "user_id", "event_id", "ts", "value", "event_type"
    )
    feed = LakeTable.create(spark, tmp_path / "feed", events)
    state_path = tmp_path / "state"
    ckpt = tmp_path / "ckpt"

    q = start_apply_changes(spark, feed.path, state_path, ckpt)
    q.awaitTermination()
    state = LakeTable(spark, state_path)
    v = state.version
    before = sorted((r.user_id, r.value) for r in state.read().collect())
    assert before, "state table should have settled keys"
    # delete semantics: users whose last change is an error are absent
    last = events.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(
                F.col("ts").desc(), F.col("event_id").desc()
            )
        ),
    ).where("rn = 1")
    deleted = {r.user_id for r in last.where("event_type = 'error'").collect()}
    assert deleted and not ({u for u, _ in before} & deleted)

    shutil.rmtree(ckpt)  # lose the streaming checkpoint entirely
    q = start_apply_changes(spark, feed.path, state_path, ckpt)
    q.awaitTermination()
    assert state.version == v, "replayed batch must not commit again"
    assert sorted((r.user_id, r.value) for r in state.read().collect()) == before
