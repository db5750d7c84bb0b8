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
