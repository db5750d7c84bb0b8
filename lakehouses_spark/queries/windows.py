"""Window functions (SURVEY §2.5 W1-W3 + rank/ntile breadth).

Absent from the reference but required for parity breadth (top-k per group,
as-of, dedup-keep-latest). All built-in `Window` specs — a single shuffle on
the partition key, then per-partition sort; no custom state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouses_spark.io import load_table
from lakehouses_spark.registry import query


@query(
    "window_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, rnk FROM (
      SELECT o_orderpriority, o_orderkey,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) WHERE rnk <= 5
    ORDER BY o_orderpriority, rnk
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: row_number top-k per group — the scalable 'top 5 orders per
    priority class'. One shuffle on the group key; with AQE, skewed groups
    split across tasks."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("o_orderpriority", "o_orderkey", "rnk")
        .orderBy("o_orderpriority", "rnk")
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total
    FROM events
    ORDER BY user_id, event_id
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: running sum over an explicit ROWS frame."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.round(F.sum("value").over(w), 2).alias("running_total"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
             AS delta
    FROM events
    ORDER BY user_id, event_id
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: lag delta — per-user change between consecutive events."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT p_partkey, p_type,
           rank()       OVER (PARTITION BY p_type ORDER BY p_size DESC, p_partkey) AS rnk,
           dense_rank() OVER (PARTITION BY p_type ORDER BY p_size DESC)            AS drnk
    FROM part
    ORDER BY p_type, rnk
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank with deterministic tie handling on an int key."""
    by_size = Window.partitionBy("p_type").orderBy(F.col("p_size").desc(), F.col("p_partkey"))
    by_size_ties = Window.partitionBy("p_type").orderBy(F.col("p_size").desc())
    return (
        load_table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            "p_type",
            F.rank().over(by_size).alias("rnk"),
            F.dense_rank().over(by_size_ties).alias("drnk"),
        )
        .orderBy("p_type", "rnk")
    )


@query(
    "window_lead_ntile",
    oracle="""
    SELECT o_orderkey,
           lead(o_orderkey) OVER (ORDER BY o_orderkey) AS next_key,
           ntile(4)         OVER (ORDER BY o_orderkey) AS quartile
    FROM orders
    WHERE o_orderkey % 50 = 0
    ORDER BY o_orderkey
    """,
)
def window_lead_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead + ntile on a filtered key set (global window kept small — an
    unpartitioned window is a single-task sort and only acceptable on
    bounded data; at scale, partition it)."""
    w = Window.orderBy("o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 50 == 0)
        .select(
            "o_orderkey",
            F.lead("o_orderkey").over(w).alias("next_key"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "window_dedup_keep_latest",
    oracle="""
    SELECT user_id, event_type, event_id AS latest_event_id FROM (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def window_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-keep-latest — the standard CDC/compaction pattern (one row per
    (user, event_type), newest wins). Same shape backs MERGE source dedup."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("latest_event_id"))
        .orderBy("user_id", "event_type")
    )


@query(
    "window_cume_dist",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(o_totalprice, 2) AS total,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WHERE o_orderstatus = 'F'
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
    ORDER BY o_orderpriority, total, o_orderkey
    """,
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank + cume_dist per priority
    class — the empirical-CDF position every percentile-based quality gate
    derives. Tie groups share a value in both engines, so the result is
    deterministic without a per-row tiebreak; one shuffle on the partition
    key serves both functions."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("total"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("o_orderpriority", "total", "o_orderkey")
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER w, 2) AS sum_1h,
           count(*) OVER w AS n_1h,
           round(max(value) OVER w, 2) AS max_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per-event trailing-1-hour aggregates
    (the per-ROW sliding aggregate — F.window's bucketed slide emits one
    row per bucket, this emits one per event). `rangeBetween` over the
    epoch ordering makes the frame a VALUE interval, so same-timestamp
    peers land in the same frame in both engines — a ROWS frame could
    order ties differently and diverge. One shuffle on user_id serves all
    three aggregates."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("double"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(w), 2).alias("sum_1h"),
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.round(F.max("value").over(w), 2).alias("max_1h"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_nth_value",
    oracle="""
    SELECT o_orderpriority,
           round(nth_value(o_totalprice, 3) OVER w, 2) AS third_cheapest,
           round(first_value(o_totalprice) OVER w, 2)  AS cheapest,
           round(last_value(o_totalprice)  OVER w, 2)  AS priciest
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    QUALIFY row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice, o_orderkey) = 1
    ORDER BY o_orderpriority
    """,
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window values: nth_value / first_value / last_value over a
    FULL-partition frame (default frames stop at CURRENT ROW — last_value
    would degenerate to the row itself), one row kept per partition. The
    (price, orderkey) ordering pins ties in both engines."""
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    rn = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            F.round(F.nth_value("o_totalprice", 3).over(w), 2).alias("third_cheapest"),
            F.round(F.first("o_totalprice").over(w), 2).alias("cheapest"),
            F.round(F.last("o_totalprice").over(w), 2).alias("priciest"),
            F.row_number().over(rn).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
        .orderBy("o_orderpriority")
    )


@query(
    "window_distinct_rolling",
    oracle="""
    SELECT user_id, event_id,
           CAST(count(DISTINCT event_type) OVER w AS INTEGER) AS n_types_10,
           CAST(count(*) OVER w AS BIGINT) AS n_window
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def window_distinct_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling DISTINCT count — behavioral-diversity feature (how many
    distinct event types in the user's trailing 10 actions). Spark forbids
    count(DISTINCT) over a window, so the scalable spelling is
    size(array_distinct(collect_list)) over the same frame — bounded state
    (≤10 elements per row) because the frame is bounded; the DuckDB oracle
    uses its native windowed DISTINCT aggregate, making this a
    cross-paradigm check of the same quantity."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.size(F.array_distinct(F.collect_list("event_type").over(w)))
        .cast("int")
        .alias("n_types_10"),
        F.count(F.lit(1)).over(w).alias("n_window"),
    ).orderBy("user_id", "event_id")


@query(
    "window_rolling_median",
    oracle="""
    SELECT user_id, event_id,
           round(quantile_cont(value, 0.5) OVER w, 4) AS roll_median,
           round(quantile_cont(value, 0.9) OVER w, 4) AS roll_p90
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median + p90 over the trailing 10 events per user —
    the robust-statistics rolling feature (median smoothing resists the
    outliers a rolling mean chases). Spark's `percentile` aggregate runs
    as a window function over the same bounded frame DuckDB's windowed
    `quantile_cont` uses — identical interpolation semantics, pinned at 4
    decimals. Bounded frame ⇒ bounded per-row state; one shuffle on
    user_id serves both percentiles."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.expr("percentile(value, 0.5)").over(w), 4).alias("roll_median"),
        F.round(F.expr("percentile(value, 0.9)").over(w), 4).alias("roll_p90"),
    ).orderBy("user_id", "event_id")


@query(
    "window_streaks",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             value > avg(value) OVER (PARTITION BY user_id) AS hot
      FROM events
    ), numbered AS (
      SELECT user_id, hot,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             - row_number() OVER (PARTITION BY user_id, hot ORDER BY ts, event_id)
               AS island
      FROM flagged
    ), runs AS (
      SELECT user_id, island, count(*) AS run_len
      FROM numbered WHERE hot GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(max(run_len) AS BIGINT) AS longest_hot_streak,
           CAST(count(*) AS BIGINT)     AS n_streaks
    FROM runs
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def window_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest above-average streak per user (gaps-and-islands on a derived
    boolean): flag events above the user's own mean, then the classic
    difference-of-row_numbers island id groups consecutive hot events —
    the streak/run-length analysis behind engagement scoring and
    burst detection. Distinct from ts_sessionize (time-gap islands): the
    island key here is a VALUE predicate, not a temporal gap.

    100 TB shape: all four windows (mean, two row_numbers) and both
    aggregations partition on user_id — one hash exchange serves the
    entire plan; per-row state is O(1)."""
    e = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id")
    w_all = by_user.orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("value") > F.avg("value").over(by_user)).alias("hot"),
    )
    w_hot = Window.partitionBy("user_id", "hot").orderBy("ts", "event_id")
    numbered = flagged.select(
        "user_id",
        "hot",
        (F.row_number().over(w_all) - F.row_number().over(w_hot)).alias("island"),
    )
    runs = (
        numbered.where("hot")
        .groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return (
        runs.groupBy("user_id")
        .agg(
            F.max("run_len").cast("long").alias("longest_hot_streak"),
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
        )
        .orderBy("user_id")
    )
