"""Time-series operators over the `events` table (SURVEY §2.3 J5/J6, §2.9 T8
batch analogs): tumbling windows, as-of join, range join, sessionization.

These are the operators the reference lacks but a 100 TB event pipeline
needs. Each is expressed as a composition of built-in DataFrame ops (window
functions + range predicates), never `applyInPandas` — the JVM handles all of
it, and every plan shuffles at most once on the natural key (user_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouses_spark.io import explode_nonempty, load_table
from lakehouses_spark.registry import query


@query(
    "ts_tumbling_window",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
           event_type,
           count(*)             AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    ORDER BY window_start, event_type
    """,
)
def ts_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 batch analog: tumbling 1-hour aggregation via F.window (the same
    expression powers the streaming path with a watermark; see
    lakehouses_spark/streaming/windows.py)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "ts_sliding_window",
    oracle="""
    WITH starts AS (
      SELECT make_timestamp(CAST((floor(epoch(ts) / 1800) - n) * 1800 * 1000000 AS BIGINT))
               AS window_start,
             value
      FROM events, (VALUES (0), (1)) t(n)
    )
    SELECT CAST(window_start AS VARCHAR) AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM starts
    GROUP BY 1 ORDER BY 1
    """,
)
def ts_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: sliding window (1h window, 30m slide) — each event lands in 2
    overlapping windows. Spark's F.window handles the expansion natively."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").cast("string").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


@query(
    "ts_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id,
           c.event_id AS prior_click_id,
           round(c.value, 2) AS prior_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
      -- deterministic tie rule (see ts_asof_tolerance): highest event_id
      -- wins among clicks sharing (user_id, ts). row_number collapse, not
      -- max/arg_max: the WINNING ROW supplies both id and value — DuckDB's
      -- arg_max skips NULL values, which would pair max(event_id) with an
      -- older row's value when the winner's value is NULL.
      SELECT user_id, ts, event_id, value
      FROM events WHERE event_type = 'click'
      QUALIFY row_number() OVER (
        PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ) c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: as-of join — each purchase matched to the user's most recent
    prior click. Implemented as the scalable union+window merge (one shuffle
    on user_id, sequential scan per partition) rather than an O(n·m)
    inequality join: tag both streams, union, then last-non-null over an
    event-time-ordered window."""
    return asof_merge(load_table(spark, sf_dir, "events"))


def asof_merge(e: DataFrame) -> DataFrame:
    """Frame-level core of ts_asof_join (input: event_id, user_id, ts,
    value, event_type) — exposed so the tie-break property test
    (test_property.py) can drive the exact production expressions on
    synthetic tied-timestamp frames."""
    purchases = e.where(F.col("event_type") == "purchase")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event_id"),
        F.col("value").alias("c_value"),
    )
    # union with stream tag; clicks sort before purchases at identical ts
    # (ASOF `>=` semantics: a click at exactly purchase-ts matches).
    tagged = purchases.select(
        "user_id",
        F.col("ts").alias("evt_ts"),
        F.lit(1).alias("is_purchase"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("c_event_id"),
        F.lit(None).cast("double").alias("c_value"),
    ).unionByName(
        clicks.select(
            "user_id",
            F.col("c_ts").alias("evt_ts"),
            F.lit(0).alias("is_purchase"),
            F.lit(None).cast("long").alias("event_id"),
            "c_event_id",
            "c_value",
        )
    )
    w = (
        # c_event_id final key => total order; tied-ts clicks resolve to the
        # highest event_id, matching the oracle's max/arg_max collapse.
        Window.partitionBy("user_id")
        .orderBy("evt_ts", "is_purchase", "c_event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # One struct-valued last, not two independent lasts: id and value must
    # come from the SAME winning click row. With independent
    # last(c_value, ignorenulls=True), a winning click whose value is NULL
    # would reach back to an OLDER click's value while the id came from the
    # winner — the oracle (which collapses ties and takes the matched row's
    # value) returns NULL there. The struct is NULL exactly on purchase
    # rows, so ignorenulls skips purchases but honors a NULL value inside
    # a click's struct.
    click_struct = F.when(
        F.col("is_purchase") == 0, F.struct("c_event_id", "c_value")
    )
    return (
        tagged.withColumn("prior_click", F.last(click_struct, ignorenulls=True).over(w))
        .where(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("prior_click.c_event_id").alias("prior_click_id"),
            F.round(F.col("prior_click.c_value"), 2).alias("prior_click_value"),
        )
        .orderBy("event_id")
    )


@query(
    "ts_range_join",
    oracle="""
    SELECT o_orderkey, count(*) AS n_shipped_in_window
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate <  o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderkey
    ORDER BY o_orderkey
    """,
)
def ts_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: equi + range predicate join — lineitems shipped within 60 days of
    their order. The equi key (orderkey) carries the shuffle; the range
    predicate evaluates post-match, so this stays a hash join, not a
    cartesian."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
    )
    return (
        o.join(li, cond)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_shipped_in_window"))
        .orderBy("o_orderkey")
    )


OVERLAP_P_MIN = 30  # purchase attention interval [ts, ts+30min]
OVERLAP_C_MIN = 10  # click attention interval [ts, ts+10min]
OVERLAP_BUCKET_S = 3600  # time-bucket width for the co-location join


@query(
    "ts_interval_overlap_join",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS p_event_id, ts AS p_start,
             ts + INTERVAL {OVERLAP_P_MIN} MINUTE AS p_end
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id AS c_event_id, ts AS c_start,
             ts + INTERVAL {OVERLAP_C_MIN} MINUTE AS c_end
      FROM events WHERE event_type = 'click'
    )
    SELECT p_event_id, c_event_id,
           epoch_ms(least(p_end, c_end)) - epoch_ms(greatest(p_start, c_start))
             AS overlap_ms
    FROM p JOIN c ON p_start <= c_end AND c_start <= p_end
    ORDER BY p_event_id, c_event_id
    """,
)
def ts_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL interval-overlap join (no equi key): every purchase attention
    interval [ts, ts+30m] paired with every click interval [ts, ts+10m]
    that overlaps it in absolute time — concurrency analysis, the join
    shape behind "what was happening while X ran". Unlike ts_range_join
    there is no natural join key, so the naive Spark plan is a
    nested-loop/cartesian over ALL interval pairs — the classic
    interval-join scale-killer.

    100 TB shape: TIME BUCKETING turns it into an equi join. Each interval
    explodes into the {OVERLAP_BUCKET_S}-second buckets it touches (≤ 2
    here: interval length ≪ bucket width, so the blow-up factor is
    1 + len/bucket); the join keys on bucket (hash join, shuffle on bucket
    ids); a pair overlapping across a bucket boundary matches in both
    buckets, so distinct dedupes; the exact overlap predicate then
    re-verifies on full-precision timestamps — bucketing only bounds the
    candidate set, never the semantics. Per-bucket work is density², the
    true output complexity of overlap joins; bucket width is the knob that
    trades blow-up factor against per-bucket density. The epoch-floor
    bucket ids are exact under second truncation (floor∘floor identity)."""
    e = load_table(spark, sf_dir, "events")

    def intervals(kind: str, minutes: int, prefix: str) -> DataFrame:
        return e.where(F.col("event_type") == kind).select(
            F.col("event_id").alias(f"{prefix}_event_id"),
            F.col("ts").alias(f"{prefix}_start"),
            (F.col("ts") + F.expr(f"INTERVAL {minutes} MINUTE")).alias(
                f"{prefix}_end"
            ),
        )

    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        lo = F.floor(F.col(f"{prefix}_start").cast("long") / OVERLAP_BUCKET_S)
        hi = F.floor(F.col(f"{prefix}_end").cast("long") / OVERLAP_BUCKET_S)
        # explode_nonempty (r12): plain explode re-builds the sequence array
        # in the inferred size>0 filter; lo <= hi so it is never empty.
        return explode_nonempty(df, F.sequence(lo, hi), "bucket", *df.columns)

    p = bucketed(intervals("purchase", OVERLAP_P_MIN, "p"), "p")
    c = bucketed(intervals("click", OVERLAP_C_MIN, "c"), "c")
    overlap = (F.col("p_start") <= F.col("c_end")) & (
        F.col("c_start") <= F.col("p_end")
    )
    return (
        p.join(c, "bucket")
        .where(overlap)
        .select(
            "p_event_id",
            "c_event_id",
            (
                F.unix_millis(F.least("p_end", "c_end"))
                - F.unix_millis(F.greatest("p_start", "c_start"))
            ).alias("overlap_ms"),
        )
        .distinct()  # boundary-spanning pairs matched in 2 buckets
        .orderBy("p_event_id", "c_event_id")
    )


@query(
    "ts_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800.0
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(max(session_id) AS BIGINT)  AS n_sessions,
           count(*)                         AS n_events,
           round(sum(value), 2)             AS total_value
    FROM sessions
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gaps-and-islands, 30-min inactivity gap) — the batch
    analog of F.session_window. lag → new-session flag → running sum as
    session id; one shuffle on user_id serves all three windows."""
    e = load_table(spark, sf_dir, "events")
    by_time = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(by_time).isNull()
            | (
                F.col("ts").cast("double") - F.lag("ts").over(by_time).cast("double")
                > 1800.0
            ),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(running))
    return (
        sessions.groupBy("user_id")
        .agg(
            F.max("session_id").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


@query(
    "ts_funnel",
    oracle="""
    WITH stage1 AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
    ), stage2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN stage1 s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.t1
      GROUP BY e.user_id
    ), stage3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN stage2 s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM stage1) AS n_viewed,
           (SELECT count(*) FROM stage2) AS n_clicked_after_view,
           (SELECT count(*) FROM stage3) AS n_purchased_after_click
    """,
)
def ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: view → click → purchase, each stage strictly after
    the user's first entry into the previous stage. Three aggregations
    joined on user_id — the standard scalable funnel (no per-user state,
    no window over the whole stream)."""
    e = load_table(spark, sf_dir, "events")

    def first_after(event_type: str, prev: DataFrame | None, prev_col: str, out: str) -> DataFrame:
        base = e.where(F.col("event_type") == event_type)
        if prev is not None:
            base = base.join(prev, "user_id").where(F.col("ts") > F.col(prev_col))
        return base.groupBy("user_id").agg(F.min("ts").alias(out))

    s1 = first_after("view", None, "", "t1")
    s2 = first_after("click", s1, "t1", "t2")
    s3 = first_after("purchase", s2, "t2", "t3")
    return (
        s1.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
    )


@query(
    "ts_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS DATE)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
           CAST(day_offset AS INTEGER) AS day_offset,
           count(*) AS n_active
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def ts_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohorts: users grouped by first-seen day, activity counted
    per day-offset (the classic triangle). Two shuffles on user_id, then a
    small (cohort, offset) aggregate."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("cohort_day")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", "ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    return (
        activity.where(F.col("day_offset") <= 7)
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.col("day_offset").cast("int").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "ts_daily_rollup",
    oracle="""
    SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
           count(*)                                   AS n_events,
           count(DISTINCT user_id)                    AS n_users,
           round(avg(value), 4)                       AS avg_value,
           round(max(value), 2)                       AS max_value
    FROM events
    WHERE event_type IN ('purchase', 'click')
    GROUP BY 1 ORDER BY 1
    """,
)
def ts_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style daily rollup: time-bucket + multi-agg. At scale this
    is the continuous-aggregate pattern — partition the table by day, and
    the rollup prunes to changed partitions."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    return (
        e.groupBy(F.date_trunc("day", "ts").cast("date").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .orderBy("day")
    )


@query(
    "ts_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             round(avg(value), 4) AS avg_value
      FROM events GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ), grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                         CAST(d1 AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM spans
    )
    SELECT g.user_id, CAST(g.day AS VARCHAR) AS day,
           d.avg_value IS NOT NULL AS observed,
           last_value(d.avg_value IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.day) AS filled_value
    FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    ORDER BY g.user_id, g.day
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable gap-fill + LOCF interpolation (the time_bucket_gapfill /
    locf shape): per-user daily averages densified onto each user's own
    [first-day, last-day] grid, missing days carried forward from the last
    observation.

    Scale shape: the dense grid is generated per-key with `sequence` —
    rows expand by (span ÷ bucket) per key, never a global cross join of
    users × calendar. One shuffle on user_id serves the bucket aggregation;
    the grid join and LOCF window reuse that partitioning. The first grid
    day per user is observed by construction, so the fill is never NULL."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.avg("value"), 4).alias("avg_value"))
    grid = explode_nonempty(
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1")),
        F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY")), "day", "user_id",
    )  # explode_nonempty (r12): no duplicated sequence build; d0 <= d1
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.col("day").cast("string").alias("day"),
            F.col("avg_value").isNotNull().alias("observed"),
            F.last("avg_value", ignorenulls=True).over(w).alias("filled_value"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "ts_ohlc",
    oracle="""
    SELECT event_type, CAST(date_trunc('hour', ts) AS VARCHAR) AS bucket,
           round(first(value ORDER BY ts, event_id), 2) AS open,
           round(max(value), 2) AS high,
           round(min(value), 2) AS low,
           round(last(value ORDER BY ts, event_id), 2) AS close,
           count(*) AS n_events
    FROM events GROUP BY event_type, date_trunc('hour', ts)
    ORDER BY event_type, bucket
    """,
)
def ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (the financial-bars / hypertable candlestick
    rollup): per (event_type, hour) open/high/low/close. open/close are
    ordered aggregates — expressed as `min_by`/`max_by` over a (ts,
    event_id) struct key, which partial-aggregates map-side like any hash
    agg (no window, no sort of the full table). event_id breaks same-ts
    ties deterministically."""
    e = load_table(spark, sf_dir, "events")
    order_key = F.struct("ts", "event_id")
    return (
        e.groupBy(
            "event_type", F.date_trunc("hour", "ts").cast("string").alias("bucket")
        )
        .agg(
            F.round(F.min_by("value", order_key), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", order_key), 2).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type", "bucket")
    )


@query(
    "ts_anomaly_mad",
    oracle="""
    WITH stats AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY 1
    ), dev AS (
      SELECT e.event_type, e.event_id, e.value, s.med, abs(e.value - s.med) AS adev
      FROM events e JOIN stats s USING (event_type)
    ), mads AS (
      SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type, d.event_id, round(d.value, 2) AS value,
           round((d.value - d.med) / (1.4826 * m.mad), 4) AS robust_z
    FROM dev d JOIN mads m USING (event_type)
    WHERE abs(d.value - d.med) > 3.5 * 1.4826 * m.mad
    ORDER BY d.event_type, d.event_id
    """,
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: flag events whose value deviates from the
    per-type median by more than 3.5 robust standard deviations
    (MAD × 1.4826 — the classic robust z-score; mean/stddev would let the
    outliers poison their own threshold).

    Two aggregation passes (median, then median-of-deviations) joined back
    via BROADCAST — the per-type stats table is tiny, so the corpus is
    scanned twice but shuffled zero times beyond the two small aggs. Both
    engines compute exact interpolated medians; comparisons use the
    unrounded values, rounding applies only to the projected columns."""
    e = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("adev") > 3.5 * 1.4826 * F.col("mad"))
        .select(
            "event_type",
            "event_id",
            F.round("value", 2).alias("value"),
            F.round((F.col("value") - F.col("med")) / (1.4826 * F.col("mad")), 4).alias(
                "robust_z"
            ),
        )
        .orderBy("event_type", "event_id")
    )


EWMA_ALPHA = 0.2
EWMA_WINDOW = 20  # truncation horizon: (1-α)^20 ≈ 0.012 of a full-history EWMA

_EWMA_NUM = " + ".join(
    f"coalesce(lag(value, {k}) OVER w * power({1 - EWMA_ALPHA}, {k}), 0)"
    for k in range(EWMA_WINDOW)
)
_EWMA_DEN = " + ".join(
    f"(CASE WHEN lag(value, {k}) OVER w IS NOT NULL"
    f" THEN power({1 - EWMA_ALPHA}, {k}) ELSE 0 END)"
    for k in range(EWMA_WINDOW)
)


@query(
    "ts_ewma",
    oracle=f"""
    SELECT user_id, event_id, round(value, 2) AS value,
           floor(({_EWMA_NUM}) / ({_EWMA_DEN}) * 1000000 + 0.500001) / 1000000
             AS ewma
    FROM events
    WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user (smoothing α=0.2),
    truncated to the trailing EWMA_WINDOW observations — the bounded-state
    formulation: weights below (1-α)^20 contribute <1.2% and truncation is
    what makes the operator a fixed-size window instead of unbounded
    history.

    Spark side: ONE ordered window collects the trailing values, then
    position-weighted numerator/denominator are pure higher-order functions
    (transform + aggregate) — JVM-side, no Python, no second shuffle. The
    oracle spells the same truncated EWMA as 20 unrolled lag() terms.

    NULL handling: both engines drop NULL values up front (collect_list
    silently skips NULLs, which would shift positional decay weights vs
    the oracle's lag/coalesce form — filtering makes the two row streams
    identical by construction). Rounding uses the nudged floor
    (x*1e6 + 0.5 + 1e-6) in both engines: the 20 weighted terms are summed
    in opposite orders, and a plain round() can flip on exact half-ulp
    boundaries (same class as ts_rolling_stats)."""
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    return (
        ewma_over(e)
        .select(
            "user_id",
            "event_id",
            F.round("value", 2).alias("value"),
            "ewma",
        )
        .orderBy("user_id", "event_id")
    )


def ewma_over(e: DataFrame, rounded: bool = True) -> DataFrame:
    """Frame-level EWMA core of ts_ewma (input: user_id, event_id, ts,
    value — pre-filtered of NULL values): appends the truncated-window
    `ewma` column. `rounded=False` skips the nudged-floor projection so the
    property test (test_property.py) can compare the RAW weighted sum
    against DuckDB's unrolled-lag formulation at full precision."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_WINDOW - 1), Window.currentRow)
    )
    vals = F.collect_list("value").over(w)  # oldest → newest within window
    decayed = F.transform(
        vals, lambda x, i: x * F.pow(F.lit(1 - EWMA_ALPHA), F.size(vals) - 1 - i)
    )
    weights = F.transform(
        vals, lambda _, i: F.pow(F.lit(1 - EWMA_ALPHA), F.size(vals) - 1 - i)
    )
    total = F.aggregate(decayed, F.lit(0.0), lambda a, x: a + x)
    denom = F.aggregate(weights, F.lit(0.0), lambda a, x: a + x)
    raw = total / denom
    ewma = F.floor(raw * 1e6 + 0.500001) / 1e6 if rounded else raw
    return e.select("user_id", "event_id", "ts", "value").withColumn("ewma", ewma)


@query(
    "ts_rolling_stats",
    oracle="""
    SELECT user_id, event_id,
           floor(avg(value) OVER w * 10000 + 0.500001) / 10000 AS roll_mean,
           floor(CASE WHEN count(*) OVER w > 1
                      THEN stddev_samp(value) OVER w END * 10000 + 0.500001)
             / 10000 AS roll_std,
           round(min(value)  OVER w, 2) AS roll_min,
           round(max(value)  OVER w, 2) AS roll_max,
           count(*) OVER w AS n_window
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def ts_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling statistics over a trailing 10-row window per user — the
    feature-engineering staple (rolling mean/std/min/max + window
    occupancy). One shuffle on user_id serves all five window functions
    (same partitioning + frame). roll_std is guarded to NULL for
    single-row windows in both engines so the n=1 stddev_samp edge can't
    diverge. roll_mean/roll_std round via floor(x*1e4 + 0.5 + 1e-6) in
    BOTH engines: two-decimal inputs over small windows make the true
    mean/stddev land on exact .00005 boundaries (e.g. an 8-row mean of
    29.99125), where ulp-level summation-order differences flip a plain
    round() either way — the cut point is nudged off the boundary."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w)
    return (
        e.select(
            "user_id",
            "event_id",
            (F.floor(F.avg("value").over(w) * 10000 + 0.500001) / 10000).alias("roll_mean"),
            (
                F.floor(
                    F.when(n > 1, F.stddev_samp("value").over(w)) * 10000
                    + 0.500001
                )
                / 10000
            ).alias("roll_std"),
            F.round(F.min("value").over(w), 2).alias("roll_min"),
            F.round(F.max("value").over(w), 2).alias("roll_max"),
            n.alias("n_window"),
        )
        .orderBy("user_id", "event_id")
    )


INTERP_BUCKET_S = 21_600  # 6-hour resample grid


@query(
    "ts_interpolate_linear",
    oracle=f"""
    WITH obs AS (
      SELECT user_id, ts, value,
             row_number() OVER (PARTITION BY user_id,
                                floor(epoch(ts) / {INTERP_BUCKET_S})
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), bucketed AS (
      SELECT user_id,
             make_timestamp(CAST(floor(epoch(ts) / {INTERP_BUCKET_S})
                                 * {INTERP_BUCKET_S} * 1000000 AS BIGINT)) AS bucket,
             epoch(ts) AS t_obs, value
      FROM obs WHERE rn = 1
    ), spans AS (
      SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM bucketed GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 6 HOUR)) AS bucket
      FROM spans
    ), joined AS (
      SELECT g.user_id, g.bucket, b.t_obs, b.value, epoch(g.bucket) AS t_grid
      FROM grid g LEFT JOIN bucketed b
        ON g.user_id = b.user_id AND g.bucket = b.bucket
    ), bounded AS (
      SELECT user_id, bucket, t_grid,
             last_value(t_obs  IGNORE NULLS) OVER wb AS t_prev,
             last_value(value  IGNORE NULLS) OVER wb AS v_prev,
             first_value(t_obs IGNORE NULLS) OVER wf AS t_next,
             first_value(value IGNORE NULLS) OVER wf AS v_next
      FROM joined
      WINDOW wb AS (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, CAST(bucket AS VARCHAR) AS bucket,
           round(CASE WHEN t_next = t_prev THEN v_prev
                      ELSE v_prev + (v_next - v_prev) * (t_grid - t_prev)
                                    / (t_next - t_prev) END, 6) AS v_interp
    FROM bounded
    ORDER BY user_id, bucket
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample-with-linear-interpolation (the hypertable `interpolate()`
    companion to ts_gap_fill's LOCF): one observation per 6-hour bucket
    (first event, deterministic), densified onto each user's own grid;
    missing buckets get the time-weighted line between the surrounding
    observations. Two windows over ONE user_id partitioning (backward
    last-non-null, forward first-non-null) — no self-join against the
    observation table, which is how interpolation stays a linear scan at
    scale. Grid endpoints are observed by construction, so v_interp is
    never NULL."""
    e = load_table(spark, sf_dir, "events")
    epoch = F.col("ts").cast("double")
    bucket = F.timestamp_seconds(
        (F.floor(epoch / INTERP_BUCKET_S) * INTERP_BUCKET_S).cast("long")
    )
    by_bucket = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    bucketed = (
        e.select("user_id", "event_id", "ts", "value", bucket.alias("bucket"))
        .withColumn("rn", F.row_number().over(by_bucket))
        .where(F.col("rn") == 1)
        .select("user_id", "bucket", epoch.alias("t_obs"), "value")
    )
    grid = explode_nonempty(
        bucketed.groupBy("user_id")
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1")),
        F.sequence("b0", "b1", F.expr("INTERVAL 6 HOURS")), "bucket", "user_id",
    )  # explode_nonempty (r12): no duplicated sequence build; b0 <= b1
    wb = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    joined = grid.join(bucketed, ["user_id", "bucket"], "left").select(
        "user_id",
        "bucket",
        F.col("bucket").cast("double").alias("t_grid"),
        "t_obs",
        "value",
    )
    bounded = joined.select(
        "user_id",
        "bucket",
        "t_grid",
        F.last("t_obs", ignorenulls=True).over(wb).alias("t_prev"),
        F.last("value", ignorenulls=True).over(wb).alias("v_prev"),
        F.first("t_obs", ignorenulls=True).over(wf).alias("t_next"),
        F.first("value", ignorenulls=True).over(wf).alias("v_next"),
    )
    interp = F.when(
        F.col("t_next") == F.col("t_prev"), F.col("v_prev")
    ).otherwise(
        F.col("v_prev")
        + (F.col("v_next") - F.col("v_prev"))
        * (F.col("t_grid") - F.col("t_prev"))
        / (F.col("t_next") - F.col("t_prev"))
    )
    return (
        bounded.select(
            "user_id",
            F.col("bucket").cast("string").alias("bucket"),
            F.round(interp, 6).alias("v_interp"),
        )
        .orderBy("user_id", "bucket")
    )


@query(
    "ts_seasonal_decompose",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket, round(sum(value), 4) AS v
      FROM events GROUP BY 1
    ), trended AS (
      SELECT bucket, v,
             avg(v) OVER (ORDER BY bucket
                          ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING) AS trend,
             count(*) OVER (ORDER BY bucket
                            ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING) AS n_win
      FROM hourly
    ), detrended AS (
      SELECT bucket, v, trend, v - trend AS detrend,
             CAST(extract(hour FROM bucket) AS INTEGER) AS hod
      FROM trended WHERE n_win = 24
    ), seasonal AS (
      SELECT hod, avg(detrend) AS s FROM detrended GROUP BY 1
    )
    SELECT d.hod,
           floor(s.s * 10000 + 0.500001) / 10000 AS seasonal_component,
           floor(avg(d.v) * 10000 + 0.500001) / 10000 AS mean_level,
           floor(avg(abs(d.v - d.trend - s.s)) * 10000 + 0.500001) / 10000
             AS mean_abs_residual,
           count(*) AS n_obs
    FROM detrended d JOIN seasonal s USING (hod)
    GROUP BY d.hod, s.s ORDER BY d.hod
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal-trend decomposition (STL-lite) of the hourly
    total-value series: trend = centered 24-hour moving average (full
    windows only), seasonal = mean detrended value per hour-of-day,
    residual = what's left. Output is the 24-row seasonal profile with
    residual magnitude — the daily-rhythm fingerprint.

    Scale note: the centered MA runs on the DOWNSAMPLED hourly series,
    whose length is bounded by the time span (not data volume), so the
    single-partition global window is over O(hours) rows no matter how
    many raw events feed it — the raw-data pass is the one shuffle-free
    hourly aggregation. Rounding uses the nudged floor form (see
    ts_rolling_stats) on every derived mean."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.round(F.sum("value"), 4).alias("v")
    )
    w = Window.orderBy("bucket").rowsBetween(-12, 11)
    trended = hourly.select(
        "bucket",
        "v",
        F.avg("v").over(w).alias("trend"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    )
    detrended = (
        trended.where(F.col("n_win") == 24)
        .select(
            "bucket",
            "v",
            "trend",
            (F.col("v") - F.col("trend")).alias("detrend"),
            F.hour("bucket").alias("hod"),
        )
    )
    seasonal = detrended.groupBy("hod").agg(F.avg("detrend").alias("s"))

    def r4(c):
        return F.floor(c * 10000 + 0.500001) / 10000

    return (
        detrended.join(F.broadcast(seasonal), "hod")
        .groupBy("hod", "s")
        .agg(
            r4(F.avg("v")).alias("mean_level"),
            r4(F.avg(F.abs(F.col("v") - F.col("trend") - F.col("s")))).alias(
                "mean_abs_residual"
            ),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .select(
            "hod",
            r4(F.col("s")).alias("seasonal_component"),
            "mean_level",
            "mean_abs_residual",
            "n_obs",
        )
        .orderBy("hod")
    )


ASOF_TOLERANCE_S = 3600  # match window: most recent click within 1 hour


@query(
    "ts_asof_tolerance",
    oracle=f"""
    SELECT p.event_id, p.user_id,
           CASE WHEN c.ts >= p.ts - INTERVAL {ASOF_TOLERANCE_S} SECOND
                THEN c.event_id END AS prior_click_id,
           CASE WHEN c.ts >= p.ts - INTERVAL {ASOF_TOLERANCE_S} SECOND
                THEN round(c.value, 2) END AS prior_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
      -- tie rule: among clicks sharing (user_id, ts) the HIGHEST event_id
      -- wins, collapsed BEFORE the ASOF join so the winner is deterministic
      -- by construction (DuckDB's ASOF is otherwise tie-arbitrary; the
      -- Spark side orders its window by c_event_id to match). row_number,
      -- not max/arg_max: arg_max skips NULL values and would mix rows.
      SELECT user_id, ts, event_id, value
      FROM events WHERE event_type = 'click'
      QUALIFY row_number() OVER (
        PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ) c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def ts_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 variant: as-of join WITH TOLERANCE (pandas merge_asof's
    `tolerance=` / kdb wj semantics) — each purchase matches the user's
    most recent prior click only if it happened within the last hour;
    staler matches are nulled, not substituted (the next-older click is by
    definition even staler, so tolerance is a post-filter on the as-of
    winner, never a different winner).

    Same scalable union+window merge as ts_asof_join — ONE shuffle on
    user_id, no inequality join — carrying the matched click's timestamp
    so the tolerance test is a pure projection afterwards."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase")
    clicks = e.where(F.col("event_type") == "click")
    tagged = purchases.select(
        "user_id",
        F.col("ts").alias("evt_ts"),
        F.lit(1).alias("is_purchase"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("c_event_id"),
        F.lit(None).cast("double").alias("c_value"),
        F.lit(None).cast("timestamp").alias("c_ts"),
    ).unionByName(
        clicks.select(
            "user_id",
            F.col("ts").alias("evt_ts"),
            F.lit(0).alias("is_purchase"),
            F.lit(None).cast("long").alias("event_id"),
            F.col("event_id").alias("c_event_id"),
            F.col("value").alias("c_value"),
            F.col("ts").alias("c_ts"),
        )
    )
    w = (
        # c_event_id as the final key makes the order TOTAL: two clicks with
        # identical (user_id, ts) resolve to the highest event_id (last in
        # frame) instead of a partition-order-dependent winner; the oracle
        # collapses ties with max(event_id)/arg_max the same way.
        Window.partitionBy("user_id")
        .orderBy("evt_ts", "is_purchase", "c_event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = F.col("matched_ts") >= F.col("evt_ts") - F.expr(
        f"INTERVAL {ASOF_TOLERANCE_S} SECOND"
    )
    # Struct-valued last (same reasoning as asof_merge): matched id, value
    # and ts must all come from the SAME winning click row, so a winner with
    # a NULL value yields NULL — not an older click's value.
    click_struct = F.when(
        F.col("is_purchase") == 0, F.struct("c_event_id", "c_value", "c_ts")
    )
    return (
        tagged.withColumn("matched", F.last(click_struct, ignorenulls=True).over(w))
        .withColumn("matched_ts", F.col("matched.c_ts"))
        .where(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            F.when(within, F.col("matched.c_event_id")).alias("prior_click_id"),
            F.when(within, F.round(F.col("matched.c_value"), 2)).alias("prior_click_value"),
        )
        .orderBy("event_id")
    )


@query(
    "ts_asof_nearest",
    oracle=f"""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
    ), cand AS (
      SELECT p.event_id AS p_id,
             c.event_id AS c_id, c.value AS c_value,
             abs(epoch_us(p.ts) - epoch_us(c.ts)) AS dist,
             CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END AS is_next
      FROM p JOIN c ON p.user_id = c.user_id
       AND c.ts >= p.ts - INTERVAL {ASOF_TOLERANCE_S} SECOND
       AND c.ts <= p.ts + INTERVAL {ASOF_TOLERANCE_S} SECOND
    ), best AS (
      SELECT p_id, c_id, c_value,
             row_number() OVER (PARTITION BY p_id
                                ORDER BY dist, is_next, c_id DESC) AS rn
      FROM cand
    )
    SELECT p.event_id, p.user_id,
           b.c_id AS nearest_click_id,
           round(b.c_value, 2) AS nearest_click_value
    FROM p LEFT JOIN best b ON b.p_id = p.event_id AND b.rn = 1
    ORDER BY p.event_id
    """,
)
def ts_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 variant completing the merge_asof direction family (pandas has
    backward / forward / nearest; ts_asof_join is backward, this is
    NEAREST): each purchase matches the click closest in ABSOLUTE time
    within ±{ASOF_TOLERANCE_S}s, ties broken prior-side-first then highest
    event_id — all integer-microsecond arithmetic in both engines so tie
    behavior is exact, never FP-dependent.

    100 TB shape: still ONE shuffle on user_id — the tagged union gets TWO
    sorted window passes over the same partitioning (a backward last() and
    a forward last() over the time-reversed order), then the winner is a
    pure projection. The oracle's theta-join + rank formulation is the
    O(n·m) plan this implementation exists to avoid."""
    return asof_nearest_merge(load_table(spark, sf_dir, "events"))


def asof_nearest_merge(e: DataFrame) -> DataFrame:
    """Frame-level core of ts_asof_nearest (input: event_id, user_id, ts,
    value, event_type) — exposed so the tie-break property test can drive
    the exact production expressions on synthetic tied-timestamp frames
    (same pattern as asof_merge)."""
    purchases = e.where(F.col("event_type") == "purchase")
    clicks = e.where(F.col("event_type") == "click")
    tagged = purchases.select(
        "user_id",
        F.col("ts").alias("evt_ts"),
        F.lit(1).alias("is_purchase"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("c_event_id"),
        F.lit(None).cast("double").alias("c_value"),
        F.lit(None).cast("timestamp").alias("c_ts"),
    ).unionByName(
        clicks.select(
            "user_id",
            F.col("ts").alias("evt_ts"),
            F.lit(0).alias("is_purchase"),
            F.lit(None).cast("long").alias("event_id"),
            F.col("event_id").alias("c_event_id"),
            F.col("value").alias("c_value"),
            F.col("ts").alias("c_ts"),
        )
    )
    # backward pass: same total order as ts_asof_join/tolerance (same-ts
    # clicks sort before the purchase => distance-0 matches visible; the
    # highest event_id lands last in frame => wins among same-ts ties)
    wb = (
        Window.partitionBy("user_id")
        .orderBy("evt_ts", "is_purchase", "c_event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward pass: time REVERSED — the last click scanned before the
    # purchase is the one with the smallest ts >= purchase ts; within a
    # tied ts, c_event_id ASC puts the highest id last in frame (same tie
    # rule as the backward pass)
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("evt_ts").desc(), "is_purchase", "c_event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_struct = F.when(
        F.col("is_purchase") == 0, F.struct("c_event_id", "c_value", "c_ts")
    )
    tol_us = ASOF_TOLERANCE_S * 1_000_000
    em = F.unix_micros(F.col("evt_ts"))
    dp = em - F.unix_micros(F.col("prior.c_ts"))
    dn = F.unix_micros(F.col("nxt.c_ts")) - em
    prior_ok = F.col("prior").isNotNull() & (dp <= tol_us)
    next_ok = F.col("nxt").isNotNull() & (dn <= tol_us)
    # prior wins equidistant ties (dp <= dn), matching the oracle's
    # (dist, is_next) ordering
    chosen = F.when(
        prior_ok & (~next_ok | (dp <= dn)), F.col("prior")
    ).when(next_ok, F.col("nxt"))
    return (
        tagged.withColumn("prior", F.last(click_struct, ignorenulls=True).over(wb))
        .withColumn("nxt", F.last(click_struct, ignorenulls=True).over(wf))
        .where(F.col("is_purchase") == 1)
        .withColumn("chosen", chosen)
        .select(
            "event_id",
            "user_id",
            F.col("chosen.c_event_id").alias("nearest_click_id"),
            F.round(F.col("chosen.c_value"), 2).alias("nearest_click_value"),
        )
        .orderBy("event_id")
    )


XCORR_MAX_LAG = 3  # hours


@query(
    "ts_cross_correlation",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             sum(value) AS v
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2
    ), lags AS (
      SELECT unnest(generate_series(0, {XCORR_MAX_LAG})) AS lag_h
    )
    SELECT CAST(lag_h AS INTEGER) AS lag_h,
           CAST(count(*) AS BIGINT) AS n_hours,
           round(corr(a.v, b.v), 4) AS xcorr
    FROM hourly a
    CROSS JOIN lags
    JOIN hourly b
      ON b.event_type = 'purchase'
     AND b.h = a.h + to_hours(CAST(lag_h AS INTEGER))
    WHERE a.event_type = 'click'
    GROUP BY lag_h
    ORDER BY lag_h
    """,
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between two event streams: corr of the
    hourly click-value series against the purchase-value series shifted by
    0..3 hours — the attribution diagnostic that answers "how long after
    click activity does purchase activity follow?" (the argmax lag is the
    conversion latency estimate).

    100 TB shape: the raw stream collapses to an HOURLY series first (one
    keyed aggregation — the series table is hours × types, tiny relative
    to events), so the lag join and corr run on the aggregate, never on
    raw events. The lag expansion is a 4-row sequence explode; the join
    keys on (hour+lag) equality — a hash join on the small series table.
    corr is a one-pass moment aggregate (map-side partial)."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.sum("value").alias("v"))
        .localCheckpoint()
    )
    clicks = (
        hourly.where(F.col("event_type") == "click")
        .select("h", F.col("v").alias("click_v"))
        .withColumn(
            "lag_h", F.explode(F.sequence(F.lit(0), F.lit(XCORR_MAX_LAG)))
        )
    )
    purchases = hourly.where(F.col("event_type") == "purchase").select(
        F.col("h").alias("ph"), F.col("v").alias("purchase_v")
    )
    joined = clicks.join(
        purchases,
        purchases.ph
        == F.col("h") + F.col("lag_h") * F.expr("INTERVAL 1 HOUR"),
    )
    return (
        joined.groupBy(F.col("lag_h").cast("int").alias("lag_h"))
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.round(F.corr("click_v", "purchase_v"), 4).alias("xcorr"),
        )
        .orderBy("lag_h")
    )
