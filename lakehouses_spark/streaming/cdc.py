"""Streaming APPLY CHANGES INTO — the DLT/Delta CDC pattern as a
continuously-maintained current-state table, composed from the engine's own
pieces (the streaming sibling of the batch `lake_cdc_apply` query):

    laketable stream source (change feed, log-tail offsets)
      → per-micro-batch LAST-change collapse per key (one window over the
        batch — batch-sized, never table-sized)
      → ONE conditional MERGE into the state LakeTable (r13): keys whose
        terminal op matches ``delete_when`` tombstone via the
        WHEN MATCHED AND <del> THEN DELETE clause, the rest update-or-insert
        — one affected-file scan / write / commit per batch
      → (app_id, batch_id) idempotency guard, riding the MERGE commit
        itself → exactly-once across restarts and replayed micro-batches

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
from pyspark.sql.types import StructType

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

    # supply the source schema from the transaction log (driver-side file
    # read) so Spark skips the planner-worker schema() round trip the
    # Python data source otherwise pays per stream start (r13)
    stream = (
        spark.readStream.format("laketable")
        .schema(LakeTable(spark, source_table).schema())
        .option("path", str(source_table))
        .load()
    )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if not txlog.list_versions(state_path):
            # build the empty state table from a driver-side frame (r13):
            # limit(0) over batch_df would still plan+run a job through the
            # Python stream source just to write zero rows
            by_name = {f.name: f for f in batch_df.schema.fields}
            fields = [by_name[c] for c in (*keys, *carry_cols)]
            LakeTable.create(
                spark, state_path,
                spark.createDataFrame([], StructType(fields)),
            )
        t = LakeTable(spark, state_path)
        if batch_id <= t.last_txn_version(app_id):
            # replayed micro-batch: already applied — consume and skip (see
            # materialized.py::upsert for why the batch must still run)
            batch_df.count()
            return
        # ONE conditional MERGE per micro-batch (r13): the terminal row set
        # carries a precomputed delete flag; keys whose terminal op matches
        # ``delete_when`` delete, the rest update-or-insert. One affected-
        # file scan + one write + one commit, where the delete-merge +
        # upsert-merge + bookkeeping-commit triple paid three of each —
        # and the (app_id, batch_id) stamp rides the MERGE commit, so the
        # exactly-once replay guard is unchanged.
        terminal = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn("__del", F.expr(delete_when))
            .select(*keys, *carry_cols, "__del")
            .localCheckpoint()  # one collapse job; the merge legs reuse it
        )
        t.merge(
            terminal,
            on,
            when_matched_update="all",
            when_not_matched_insert="all",
            when_matched_delete="s.__del",
            when_not_matched_insert_condition="NOT __del",
            txn_app=app_id,
            txn_version=batch_id,
            # uniqueness is structural: terminal is the row_number()=1
            # collapse keyed on exactly the merge keys
            source_unique_on_key=True,
        )

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(checkpoint))
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
