"""Streaming materialized view: continuously maintain a gold rollup from a
bronze LakeTable (the hypertable continuous-aggregate pattern, composed from
the engine's own pieces):

    laketable stream source (log-tail offsets)
      → watermarked tumbling aggregation (bounded state)
      → foreachBatch MERGE upsert into a gold LakeTable (late windows
        update their row in place; new windows insert)

Exactly-once: the source offset range is pinned by the checkpoint; the MERGE
is wrapped in an idempotency guard keyed on (view id, batch id) — a replayed
micro-batch is skipped before any file IO, so the upsert can't double-apply.

At scale every stage is bounded: source partitions per added file, stream
state O(open windows), MERGE rewrites only the files containing updated
window rows.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from lakehouses_spark.streaming.windows import tumbling_window_agg
from lakehouses_spark.tables import LakeTable
from lakehouses_spark.tables import log as txlog
from lakehouses_spark.tables.stream_source import LakeTableDataSource


def start_rollup_view(
    spark: SparkSession,
    source_table: str | Path,
    gold_path: str | Path,
    checkpoint: str | Path,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "10 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Start (or resume) the view. Returns the StreamingQuery."""
    spark.dataSource.register(LakeTableDataSource)
    gold_path = Path(gold_path)
    app_id = f"rollup_view:{gold_path.name}"
    keys = ["window_start", "window_end", *group_cols]

    # schema supplied from the transaction log (driver-side read): skips
    # the planner-worker schema() round trip per stream start (r13)
    stream = (
        spark.readStream.format("laketable")
        .schema(LakeTable(spark, source_table).schema())
        .option("path", str(source_table))
        .load()
    )
    agg = tumbling_window_agg(
        stream, ts_col=ts_col, duration=duration, watermark=watermark,
        group_cols=group_cols, value_col=value_col,
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if not txlog.list_versions(gold_path):
            LakeTable.create(spark, gold_path, batch_df.limit(0),
                             partition_by=["window_start"])
        gold = LakeTable(spark, gold_path)
        if batch_id <= gold.last_txn_version(app_id):
            # Replayed micro-batch: the MERGE already applied. Still CONSUME
            # the batch — Spark validates that foreachBatch processed every
            # partition (stateful operators commit their state stores through
            # the tasks), so an early return without consumption fails the
            # query with STATE_STORE_COMMIT_VALIDATION_FAILED. count() runs
            # the (already tiny, aggregated) batch and discards it.
            batch_df.count()
            return
        cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        batch_df.persist()
        try:
            # the (app_id, batch_id) stamp rides the MERGE commit (r13):
            # a retry of THIS batch is still skipped by the guard above,
            # and the per-micro-batch bookkeeping commit disappears
            # source_unique_on_key: batch_df is a groupBy over exactly the
            # merge keys, so the multiple-match check job can never fire
            gold.merge(batch_df, cond, txn_app=app_id, txn_version=batch_id,
                       source_unique_on_key=True)
        finally:
            batch_df.unpersist()

    return (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", str(checkpoint))
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
