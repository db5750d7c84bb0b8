"""Operator-library tests: the cogrouped-pandas as-of join must agree with
the JVM union+window implementation, plus the merge_asof-only features
(tolerance, forward direction)."""

from __future__ import annotations

from lakehouses_spark.io import load_table
from lakehouses_spark.operators import asof_join_pandas, top_k_per_group

SF = "/root/testdata/sf0.001"

from pyspark.sql import functions as F


def test_asof_pandas_matches_jvm_window_impl(spark):
    from lakehouses_spark.queries.timeseries import ts_asof_join

    e = load_table(spark, SF, "events")
    purchases = e.where("event_type = 'purchase'").select("user_id", "ts", "event_id")
    clicks = e.where("event_type = 'click'").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    got = {
        (r.event_id): r.click_id
        for r in asof_join_pandas(purchases, clicks, on="ts", by="user_id").collect()
    }
    want = {
        r.event_id: r.prior_click_id for r in ts_asof_join(spark, SF).collect()
    }
    assert got == want


def test_asof_tolerance_and_forward(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b")], "k int, t long, v string"
    ).withColumn("t", F.timestamp_seconds("t"))
    right = spark.createDataFrame(
        [(1, 95, 9.5), (1, 250, 25.0)], "k int, t long, r double"
    ).withColumn("t", F.timestamp_seconds("t"))
    # backward with 3s tolerance: t=100 matches 95? gap 5s > 3s → null
    tol = {
        r.v: r.r for r in asof_join_pandas(
            left, right, on="t", by="k", tolerance="3 seconds"
        ).collect()
    }
    assert tol == {"a": None, "b": None}
    # forward: each left row takes the next right value at/after it
    fwd = {
        r.v: r.r for r in asof_join_pandas(
            left, right, on="t", by="k", direction="forward"
        ).collect()
    }
    assert fwd == {"a": 25.0, "b": 25.0}


def test_asof_key_missing_on_right(spark):
    left = spark.createDataFrame([(7, 100, "x")], "k int, t long, v string") \
        .withColumn("t", F.timestamp_seconds("t"))
    right = spark.createDataFrame([(8, 90, 1.0)], "k int, t long, r double") \
        .withColumn("t", F.timestamp_seconds("t"))
    rows = asof_join_pandas(left, right, on="t", by="k").collect()
    assert len(rows) == 1 and rows[0].r is None  # left row kept, null fill


def test_zscore_pandas_matches_window_form(spark):
    """GROUPED_MAP applyInPandas standardization == JVM window expression."""
    from lakehouses_spark.operators import zscore_pandas
    from lakehouses_spark.registry import load_all_queries

    SF01 = "/root/testdata/sf0.001"
    want = {
        r.event_id: r.zscore
        for r in load_all_queries()["window_zscore"].fn(spark, SF01).collect()
    }
    e = load_table(spark, SF01, "events").select("event_id", "user_id", "value")
    got = {
        r.event_id: round(r.zscore, 4) if r.zscore is not None else None
        for r in zscore_pandas(e, by="user_id").collect()
    }
    assert got == want


def test_lake_partitions_metadata_table(spark, tmp_path):
    from lakehouses_spark.tables import LakeTable

    df = spark.range(100).selectExpr("id", "CAST(id % 4 AS INT) AS bucket")
    t = LakeTable.create(spark, tmp_path / "t", df, partition_by=["bucket"])
    rows = {r.bucket: r.num_records for r in t.partitions().collect()}
    assert rows == {0: 25, 1: 25, 2: 25, 3: 25}


def test_top_k_per_group_operator(spark):
    orders = load_table(spark, SF, "orders")
    top = top_k_per_group(orders, ["o_orderpriority"], "o_totalprice", k=3)
    counts = top.groupBy("o_orderpriority").count().collect()
    assert all(r["count"] == 3 for r in counts)


def test_interval_overlap_bucket_boundary_dedup(spark):
    """ts_interval_overlap_join's candidate join matches a boundary-spanning
    pair once per shared bucket; the distinct must collapse them to ONE
    result row, and bucketing must not miss pairs that overlap only across
    an hour boundary."""
    from lakehouses_spark.queries import timeseries as ts_mod
    from pyspark.sql import functions as F

    # purchase 10:45–11:15 (buckets 10,11); click 10:50–11:00 (10,11 too):
    # matched in TWO buckets -> one output row. Second click 11:10–11:20
    # overlaps only the purchase's second bucket. Third click 09:00–09:10
    # doesn't overlap at all.
    rows = [
        (1, "purchase", "2024-01-01 10:45:00"),
        (2, "click", "2024-01-01 10:50:00"),
        (3, "click", "2024-01-01 11:10:00"),
        (4, "click", "2024-01-01 09:00:00"),
    ]
    e = spark.createDataFrame(rows, "event_id long, event_type string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))

    import unittest.mock as mock

    with mock.patch.object(ts_mod, "load_table", lambda _s, _d, _n: e):
        out = ts_mod.ts_interval_overlap_join(spark, "ignored")
        got = {(r.p_event_id, r.c_event_id): r.overlap_ms for r in out.collect()}
    assert set(got) == {(1, 2), (1, 3)}
    # overlap durations: click2 fully inside (10 min); click3 overlaps
    # 11:10 → 11:15 (5 min)
    assert got[(1, 2)] == 10 * 60 * 1000
    assert got[(1, 3)] == 5 * 60 * 1000
