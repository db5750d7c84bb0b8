"""Streaming analytics operators (SURVEY §2.9 T4-T8)."""

from lakehouses_spark.streaming.windows import (  # noqa: F401
    dedup_within_watermark,
    session_window_agg,
    sliding_window_agg,
    streaming_groupby,
    tumbling_window_agg,
)
