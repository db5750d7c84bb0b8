#!/usr/bin/env python
"""Event-stream analytics pipeline — the time-series operator family
composed end-to-end on the events testdata (the hypertable workflow a
monitoring/metrics platform runs):

    raw events
      → hourly OHLC bars per event type (ordered-aggregate downsample)
      → per-user daily gap-fill with LOCF + 6-hour linear interpolation
      → trailing-window rolling statistics + truncated EWMA smoothing
      → MAD-based robust anomaly flags
      → sessionization + conversion funnel
      → continuous-aggregate daily rollup persisted to a LakeTable,
        incrementally maintainable by partition

    python examples/timeseries_analytics.py [workdir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouses_spark import LakeTable, get_spark, load_table
from lakehouses_spark.registry import load_all_queries

SF = "/root/testdata/sf0.01"


def main() -> None:
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    spark = get_spark(app_name="timeseries-analytics", driver_memory="6g")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all_queries()

    events = load_table(spark, SF, "events")
    print(f"raw events: {events.count()}")

    # 1. OHLC downsample: per (event_type, hour) candlesticks
    ohlc = registry["ts_ohlc"].fn(spark, SF)
    print(f"ohlc bars: {ohlc.count()}")

    # 2. densify: daily LOCF gap-fill and 6-hour linear interpolation —
    #    the two resample semantics (step function vs time-weighted line)
    filled = registry["ts_gap_fill"].fn(spark, SF)
    gaps = filled.where(~F.col("observed")).count()
    print(f"gap-filled grid: {filled.count()} rows ({gaps} imputed by LOCF)")
    interp = registry["ts_interpolate_linear"].fn(spark, SF)
    print(f"interpolated 6h grid: {interp.count()} rows")

    # 3. smoothing: rolling stats + truncated EWMA per user
    rolling = registry["ts_rolling_stats"].fn(spark, SF)
    ewma = registry["ts_ewma"].fn(spark, SF)
    joined = rolling.join(ewma.select("user_id", "event_id", "ewma"),
                          ["user_id", "event_id"])
    print(f"smoothed series rows: {joined.count()}")

    # 4. robust anomaly detection (median/MAD — outliers can't poison
    #    their own threshold)
    anomalies = registry["ts_anomaly_mad"].fn(spark, SF)
    print(f"anomalous events (|robust z| > 3.5): {anomalies.count()}")

    # 5. behavioral layer: sessions and the view→click→purchase funnel
    sessions = registry["ts_sessionize"].fn(spark, SF)
    funnel = registry["ts_funnel"].fn(spark, SF).collect()[0]
    print(
        f"sessionized users: {sessions.count()}; funnel "
        f"{funnel.n_viewed} viewed → {funnel.n_clicked_after_view} clicked "
        f"→ {funnel.n_purchased_after_click} purchased"
    )

    # 6. continuous aggregate: daily rollup into a day-partitioned
    #    LakeTable — at scale the rollup re-computes only changed day
    #    partitions (the incremental-maintenance pattern the streaming
    #    materialized view automates)
    rollup = registry["ts_daily_rollup"].fn(spark, SF)
    n_rollup = rollup.count()
    gold = LakeTable.create(
        spark, root / "gold_daily_rollup", rollup, partition_by=["day"]
    )
    n_gold = gold.read().count()
    print(
        f"gold rollup: {n_gold} day rows, "
        f"{gold.files().count()} files at {root / 'gold_daily_rollup'}"
    )
    assert n_gold == n_rollup
    print("timeseries pipeline OK")
    spark.stop()


if __name__ == "__main__":
    main()
