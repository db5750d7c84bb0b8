"""Watermarked event-time operators (T8 — absent in the reference, required
for events-table parity; SURVEY §2.9).

All built-in Structured Streaming state management: `withWatermark` bounds
state, `F.window`/`F.session_window` do the bucketing, and
`dropDuplicatesWithinWatermark` gives bounded-state dedup. State size is
O(open windows × groups) regardless of stream length — the property that
makes these safe on unbounded 100 TB/day streams.

Each function takes a *streaming or batch* DataFrame with an event-time
column — the same expression compiles to both (stream/batch unification,
T5), which is how tests pin correctness: availableNow drain vs batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "10 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """T4/T8: watermarked tumbling-window aggregation."""
    stream = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return (
        stream.groupBy(F.window(ts_col, duration).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            "total_value",
        )
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
    value_col: str = "value",
) -> DataFrame:
    """T8: sliding (hopping) window — each event lands in duration/slide
    overlapping windows."""
    stream = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return (
        stream.groupBy(F.window(ts_col, duration, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    group_cols: tuple[str, ...] = ("user_id",),
    value_col: str = "value",
) -> DataFrame:
    """T8: session windows (dynamic gap-based) — the streaming-native
    equivalent of the batch gaps-and-islands `ts_sessionize` query."""
    stream = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return (
        stream.groupBy(F.session_window(ts_col, gap).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *group_cols,
            "n_events",
            "total_value",
        )
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T8: bounded-state exact dedup on late-arriving duplicates."""
    if not df.isStreaming:
        return df.dropDuplicates(list(keys))
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))


def streaming_groupby(df: DataFrame, key: str, value_col: str = "value") -> DataFrame:
    """T4: the reference's complete-mode streaming aggregation
    (02.delta_lake_primer.py:133-137 `sum(count) … GROUP BY addr_state` over
    a stream)."""
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum(value_col), 2).alias("total")
    )
