"""Config-driven ingestion engine (SURVEY §3.3, §7.1 item 4).

Port of the reference's engine spec (notebooks/04.ingestas_motor/
01.ingestas_motor.py:72-242): a config dict describes one (datasource,
dataset) pipeline; `read_stream` builds the source DataFrame with metadata
columns, `write_stream` runs it into a bronze LakeTable through foreachBatch
with landing→raw archival, `run` drains with availableNow (T1) or keeps a
processingTime trigger alive (T2), `await_all` joins parallel queries (T7).

Config shape (same fields as the reference's `configuracion` dicts):

    {
      "datasource": "retail",
      "dataset": "sales_orders",
      "source": {
        "format": "json" | "csv" | "parquet" | "binaryFile" | "kafka",
        "options": {...},                # passed through to the reader
        "schema_hints": {"col": "type"}, # cloudFiles.schemaHints analog
        # kafka only:
        "topic": "...", "topic_pattern": "...", "value_format": "json",
        "json_schema": "a INT, b STRING", "servers": "host:port",
      },
      "sink": {"partition_by": ["_topic"]},
    }

Exactly-once: the Spark checkpoint pins which source files/offsets each
micro-batch contains; the bronze write is idempotent on (pipeline id,
batch id) via LakeTable.append_idempotent; archival skips already-moved
files. A crash at any point replays into the same end state.

Scale notes: the only driver-side materialization is the per-batch distinct
source-file list (bounded by files-per-trigger, never row count — the one
reference pattern SURVEY §2.12 flags, made bounded here by construction).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from lakehouses_spark import fs
from lakehouses_spark.ingest.autoloader import IncrementalFileSource
from lakehouses_spark.tables.table import LakeTable
from lakehouses_spark.tables import log as txlog

METADATA_COLS = ("_ingested_at", "_ingested_filename", "_datasource", "_dataset")


class IngestionEngine:
    """One engine per lakehouse root:

    <root>/landing/<datasource>/<dataset>/...   immutable extracts
    <root>/raw/<datasource>/<dataset>/...       archived extracts
    <root>/bronze/<datasource>_<dataset>/       LakeTable (append-only)
    <root>/_checkpoints/, <root>/_schemas/      stream + schema state
    """

    def __init__(self, spark: SparkSession, root: str | Path):
        self.spark = spark
        self.root = Path(root)

    # --- path conventions ---------------------------------------------- #
    def landing_dir(self, cfg: dict) -> Path:
        return self.root / "landing" / cfg["datasource"] / cfg["dataset"]

    def raw_dir(self, cfg: dict) -> Path:
        return self.root / "raw" / cfg["datasource"] / cfg["dataset"]

    def bronze_path(self, cfg: dict) -> Path:
        return self.root / "bronze" / f"{cfg['datasource']}_{cfg['dataset']}"

    def _checkpoint(self, cfg: dict) -> Path:
        return self.root / "_checkpoints" / cfg["datasource"] / cfg["dataset"]

    def _schema_loc(self, cfg: dict) -> Path:
        return self.root / "_schemas" / cfg["datasource"] / cfg["dataset"]

    def file_source(self, cfg: dict) -> IncrementalFileSource:
        src = cfg.get("source", {})
        return IncrementalFileSource(
            self.spark,
            self.landing_dir(cfg),
            fmt=src.get("format", "json"),
            schema_location=self._schema_loc(cfg),
            schema_hints=src.get("schema_hints"),
            options={"recursiveFileLookup": "true", **src.get("options", {})},
        )

    # --- source construction (S10-S14) ---------------------------------- #
    def read_stream(self, cfg: dict) -> DataFrame:
        src = cfg.get("source", {})
        fmt = src.get("format", "json")
        if fmt == "kafka":
            df = self._read_kafka(src)
            fname = F.lit(None).cast("string")
        else:
            df = self.file_source(cfg).stream()
            fname = F.col("_metadata.file_path")
        # P10 metadata enrichment + P9 metadata-first column order
        # (02…/02.ingesta_incremental [json].py:95-96, 03…v2:109-119)
        df = (
            df.withColumn("_ingested_at", F.current_timestamp())
            .withColumn("_ingested_filename", fname)
            .withColumn("_datasource", F.lit(cfg["datasource"]))
            .withColumn("_dataset", F.lit(cfg["dataset"]))
        )
        data_cols = [c for c in df.columns if c not in METADATA_COLS]
        return df.select(*METADATA_COLS, *data_cols)

    def _read_kafka(self, src: dict) -> DataFrame:
        """S12/S13: Kafka singleplex/multiplex.

        `src["simulate_path"]` swaps the wire protocol for a file-backed
        broker (kafka_sim.FileTopicBroker) with the IDENTICAL 7-column
        record schema and subscribe/subscribePattern semantics — everything
        downstream (rename, decode, multiplex partitioning, checkpointed
        exactly-once) is the same code either way. Without it, the real
        spark-sql-kafka reader is built (requires the runtime jar, absent in
        this environment — start() raises a clear error)."""
        if src.get("simulate_path"):
            from lakehouses_spark.ingest.kafka_sim import KAFKA_SCHEMA

            df = (
                self.spark.readStream.schema(KAFKA_SCHEMA)
                .parquet(str(src["simulate_path"]))
            )
            # subscribe / subscribePattern semantics on the simulated log
            if src.get("topic_pattern"):
                df = df.where(F.col("topic").rlike(src["topic_pattern"]))
            else:
                df = df.where(F.col("topic") == src["topic"])
        else:
            reader = (
                self.spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", src.get("servers", "localhost:9092"))
                .option("startingOffsets", src.get("starting_offsets", "earliest"))
            )
            if src.get("topic_pattern"):
                reader = reader.option("subscribePattern", src["topic_pattern"])  # multiplex
            else:
                reader = reader.option("subscribe", src["topic"])  # singleplex
            for k, v in src.get("options", {}).items():
                reader = reader.option(k, v)
            df = reader.load()
        return kafka_bronze_transform(df, src)

    # --- sink + lifecycle (S17/S18, T1-T3, T7) --------------------------- #
    def write_stream(
        self,
        cfg: dict,
        df: DataFrame,
        trigger: dict[str, Any] | None = None,
        archive: bool = True,
    ) -> StreamingQuery:
        """foreachBatch bronze writer: idempotent LakeTable append + source
        archival (02…/03.ingesta_incremental_v2 [json].py:211-235)."""
        bronze = self.bronze_path(cfg)
        landing = self.landing_dir(cfg)
        raw = self.raw_dir(cfg)
        app_id = f"{cfg['datasource']}.{cfg['dataset']}"
        partition_by = (cfg.get("sink") or {}).get("partition_by")
        spark = self.spark
        trigger = trigger or {"availableNow": True}
        mft = (cfg.get("source", {}).get("options") or {}).get("maxFilesPerTrigger")
        # The cap is only meaningful under triggers that HONOR
        # maxFilesPerTrigger (availableNow / processingTime). Trigger.Once
        # ignores it — one batch legitimately drains everything pending —
        # so enforcing there would raise after the (idempotent) append and
        # wedge the stream: every restart replays the batch, skips the
        # append, and re-raises in archive.
        honors_mft = "once" not in {k.lower() for k in trigger}
        archive_cap = int(mft) if mft is not None and honors_mft else None

        def process_batch(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.persist()
            try:
                if not txlog.list_versions(bronze):
                    LakeTable.create(
                        spark, bronze,
                        batch_df.limit(0), partition_by=partition_by,
                    )
                table = LakeTable(spark, bronze)
                table.append_idempotent(
                    batch_df, app_id=app_id, txn_version=batch_id, merge_schema=True
                )
                if archive:
                    _archive_batch_files(batch_df, landing, raw, archive_cap)
            finally:
                batch_df.unpersist()

        writer = (
            df.writeStream.foreachBatch(process_batch)
            .option("checkpointLocation", str(self._checkpoint(cfg)))
            .queryName(app_id)
        )
        writer = writer.trigger(**trigger)
        return writer.start()

    def run(self, cfg: dict, archive: bool = True, maintain: bool = False,
            publish: bool = False) -> None:
        """T1: drain everything pending and stop (the reference's scheduled
        incremental ingestion semantics, 02…/02…[json].py:109-123).
        maintain=True compacts accumulated micro-batch files afterwards;
        publish=True (or sink.publish in the config) refreshes the bronze
        table's session-catalog view after the drain."""
        q = self.write_stream(cfg, self.read_stream(cfg), archive=archive)
        q.awaitTermination()
        if maintain:
            self.maintain(cfg)
        if publish or (cfg.get("sink") or {}).get("publish"):
            self.publish(cfg)

    def maintain(
        self,
        cfg: dict,
        target_records_per_file: int = 1_000_000,
        min_files_to_compact: int = 8,
        vacuum_retain_versions: int | None = None,
    ) -> dict:
        """Bronze table upkeep: every availableNow drain appends one file set
        per micro-batch, so continuous ingestion accumulates small files (the
        problem the reference demonstrates at 02.delta_lake_primer.py:46-49).
        Compacts when fragmentation crosses the threshold; optionally vacuums
        history beyond `vacuum_retain_versions`."""
        table = self.bronze_table(cfg)
        result: dict = {"compacted_files": 0, "vacuumed_files": 0}
        if len(table.state().files) >= min_files_to_compact:
            result["compacted_files"] = table.optimize(
                target_records_per_file
            )["compacted_files"]
        if vacuum_retain_versions is not None:
            result["vacuumed_files"] = len(
                table.vacuum(retain_versions=vacuum_retain_versions)
            )
        return result

    @staticmethod
    def await_all(queries: list[StreamingQuery]) -> None:
        """T7: join N parallel pipelines (04…/01.ingestas_motor.py:232-242)."""
        for q in queries:
            q.awaitTermination()

    def run_all(self, cfgs: list[dict], archive: bool = True) -> None:
        """The reference's main loop: start every configured pipeline as an
        independent streaming query on the shared session, then join them
        (04…/01.ingestas_motor.py:232-242). Queries run concurrently —
        one slow source doesn't serialize the others."""
        self.await_all(
            [self.write_stream(c, self.read_stream(c), archive=archive) for c in cfgs]
        )

    def bronze_table(self, cfg: dict) -> LakeTable:
        return LakeTable(self.spark, self.bronze_path(cfg))

    def publish(self, cfg: dict, database: str = "bronze") -> str:
        """Expose the pipeline's bronze table in the session catalog as
        `<database>.<datasource>_<dataset>` — the reference's contract that
        ingested tables resolve by 3-level name in plain spark.sql
        (02…/03.ingesta_incremental_v2 [json].py:202,221-228:
        bronze.retail_sales_orders). With a persistent metastore
        (session.get_spark(hive_metastore_dir=…)) the name survives into
        fresh sessions. Call after a drain (the view pins the snapshot at
        publish time)."""
        from lakehouses_spark.tables.catalog import snapshot_sql

        t = self.bronze_table(cfg)
        name = f"{database}.{cfg['datasource']}_{cfg['dataset']}"
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{database}`")
        self.spark.sql(
            f"CREATE OR REPLACE VIEW `{database}`."
            f"`{cfg['datasource']}_{cfg['dataset']}` AS {snapshot_sql(t, t.state())}"
        )
        return name


def kafka_bronze_transform(df: DataFrame, src: dict) -> DataFrame:
    """The reference's Kafka→bronze column contract, shared by the real
    connector and the file-backed simulator:

    - P2 bulk `_`-prefix rename of all 7 Kafka columns
      (03…/02.ingesta_incremental_singleplex [json].py:98-100)
    - optional JSON value decode: cast binary value → from_json with the
      declared DDL schema → struct expand → drop (03…/02…[json].py:117-131)
    """
    df = df.select(*[F.col(c).alias(f"_{c}") for c in df.columns])
    if src.get("value_format") == "json" and src.get("json_schema"):
        df = (
            df.withColumn(
                "value", F.from_json(F.col("_value").cast("string"), src["json_schema"])
            )
            .select("*", "value.*")
            .drop("value")
        )
    elif src.get("value_format") == "avro" and src.get("avro_schema"):
        # S14: Confluent-framed Avro — strip the 5-byte header, decode (JVM
        # spark-avro when present, pure-Python codec otherwise), expand
        # (03…/05.ingesta_incremental_singleplex [avro].py:134-152)
        from lakehouses_spark.functions.avro import from_avro_confluent

        df = (
            df.withColumn(
                "value", from_avro_confluent(F.col("_value"), src["avro_schema"])
            )
            .select("*", "value.*")
            .drop("value")
        )
    return df


def _archive_batch_files(
    batch_df: DataFrame, landing: Path, raw: Path, max_files: int | None = None
) -> None:
    """Move this micro-batch's source files landing→raw (S18).

    The distinct-filename list is bounded by maxFilesPerTrigger, not row
    count — and when the caller knows that cap (``max_files``), it is
    ENFORCED here: a batch whose distinct-file set exceeds it raises
    instead of silently growing the driver-side list, so a future
    trigger-config change can't unbound the collect (VERDICT r4 #6). The
    list streams via toLocalIterator either way. Idempotent: a file
    already archived by a previous attempt of this batch is silently
    skipped."""
    names = []
    for r in (
        batch_df.select(F.col("_ingested_filename").alias("f"))
        .distinct()
        .toLocalIterator()
    ):
        if not r.f:
            continue
        names.append(r.f)
        if max_files is not None and len(names) > max_files:
            raise RuntimeError(
                f"micro-batch contains more than maxFilesPerTrigger="
                f"{max_files} distinct source files — trigger/batch "
                "configuration mismatch; refusing to archive"
            )
    for uri in names:
        src = Path(uri.removeprefix("file://").removeprefix("file:"))
        if not src.exists():
            continue  # retried batch: already moved
        fs.mv(src, raw / src.relative_to(landing))
