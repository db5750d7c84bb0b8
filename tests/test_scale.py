"""Scale-utility tests: bucketed joins skip their shuffle, salted joins
preserve semantics, stateful streaming counters match batch totals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouses_spark.io import load_table
from lakehouses_spark.scale import explain_shuffles, salted_join, write_bucketed

SF = "/root/testdata/sf0.001"


def test_bucketed_join_skips_exchange(spark):
    """Two tables bucketed on the join key ⇒ the sort-merge join reads both
    sides exchange-free (the pre-shuffled co-location contract)."""
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", num_buckets=8)
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
                   "b_lineitem", "o_orderkey", num_buckets=8)
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    joined = bo.hint("merge").join(bl, "o_orderkey")
    assert explain_shuffles(joined) == 0, "bucketed equi-join must not shuffle"
    # and it still computes the right thing
    expected = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert joined.count() == expected
    # non-bucketed baseline: same join with plain tables shuffles both sides
    plain = orders.hint("merge").join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    )
    assert explain_shuffles(plain) >= 2
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_matches_plain_join(spark):
    events = load_table(spark, SF, "events").select(
        F.col("user_id").alias("k"), "value"
    )
    dim = (
        load_table(spark, SF, "customer")
        .select(F.col("c_custkey").alias("k"), "c_mktsegment")
        .where(F.col("k") < 150)
    )
    plain = events.join(dim, "k").groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s")
    )
    salted = salted_join(events, dim, "k", num_salts=4).groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    right = spark.createDataFrame([(1, "X")], "k int, w string")
    got = sorted(map(tuple, salted_join(left, right, "k", num_salts=3, how="left")
                 .select("k", "v", "w").collect()))
    assert got == [(1, "a", "X"), (2, "b", None), (3, "c", None)]


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState counters over an availableNow drain equal the
    batch per-key aggregates."""
    from lakehouses_spark.streaming.stateful import running_totals

    src = tmp_path / "events"
    batch = load_table(spark, SF, "events")
    batch.write.parquet(str(src))
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    q = (
        running_totals(stream)
        .writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emitted row per key == batch aggregate
    got = {
        r.key: (r.n, r.total)
        for r in spark.sql("SELECT * FROM totals").collect()
    }
    want = {
        r.user_id: (r.n, r.total)
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert got == want
