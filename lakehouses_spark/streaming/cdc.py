"""Streaming APPLY CHANGES INTO — the DLT/Delta CDC pattern as a
continuously-maintained current-state table, composed from the engine's own
pieces (the streaming sibling of the batch `lake_cdc_apply` query):

    laketable stream source (change feed, log-tail offsets)
      → per-micro-batch LAST-change collapse per key (one window over the
        batch — batch-sized, never table-sized)
      → delete/upsert MERGE routing into the state LakeTable (keys whose
        terminal op matches ``delete_when`` tombstone; the rest upsert)
      → (app_id, batch_id) idempotency guard → exactly-once across
        restarts and replayed micro-batches

Sequencing contract: micro-batches arrive in FEED ORDER (the laketable
source replays commits in log order), so within-batch collapse plus
latest-batch-wins merging equals global last-writer-wins — the same
assumption DLT's APPLY CHANGES makes of its source. An out-of-order feed
would need a sequence-guarded merge (only overwrite when s.seq ≥ t.seq);
that variant trades one extra predicate in the join condition, not a
different plan shape.

At 100 TB every stage is bounded: source partitions per added file, the
collapse window runs on the micro-batch only, and each MERGE rewrites just
the files containing touched keys (stats-pruned, bounded collect).
Reference analog: the continuous upsert step of the medallion silver layer
(notebooks/04.delta_lake/02.delta_lake_primer.py:312-320 MERGE, driven by
the incremental ingestion loop of 02.ingestas_ficheros/03.ingesta_
incremental_v2 [json].py:211-235).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from lakehouses_spark.tables import LakeTable
from lakehouses_spark.tables import log as txlog
from lakehouses_spark.tables.stream_source import LakeTableDataSource


def start_apply_changes(
    spark: SparkSession,
    source_table: str | Path,
    state_path: str | Path,
    checkpoint: str | Path,
    keys: tuple[str, ...] = ("user_id",),
    seq_cols: tuple[str, ...] = ("ts", "event_id"),
    delete_when: str = "event_type = 'error'",
    carry_cols: tuple[str, ...] = ("value", "ts"),
    trigger: dict | None = None,
) -> StreamingQuery:
    """Start (or resume) the APPLY CHANGES stream. Returns the query."""
    spark.dataSource.register(LakeTableDataSource)
    state_path = Path(state_path)
    app_id = f"apply_changes:{state_path.name}"
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in seq_cols])

    stream = (
        spark.readStream.format("laketable")
        .option("path", str(source_table))
        .load()
    )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if not txlog.list_versions(state_path):
            LakeTable.create(
                spark, state_path, batch_df.select(*keys, *carry_cols).limit(0)
            )
        t = LakeTable(spark, state_path)
        if batch_id <= t.last_txn_version(app_id):
            # replayed micro-batch: already applied — consume and skip (see
            # materialized.py::upsert for why the batch must still run)
            batch_df.count()
            return
        terminal = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
            .localCheckpoint()  # one collapse job; both merges reuse it
        )
        deletes = terminal.where(delete_when).select(*keys)
        upserts = terminal.where(f"NOT ({delete_when})").select(
            *keys, *carry_cols
        )
        t.merge(
            deletes,
            on,
            when_matched_update=None,
            when_not_matched_insert=None,
            when_matched_delete=True,
        )
        t.merge(upserts, on)
        # stamp the batch id so a retry of THIS batch is skipped
        t._commit(
            t.version + 1,
            operation="STREAMING UPDATE",
            operation_parameters={"txn_app": app_id, "txn_version": batch_id},
        )

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(checkpoint))
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
