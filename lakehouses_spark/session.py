"""SparkSession factory — every other module depends on this.

Mirrors the reference's session expectations (Databricks runtime with AQE,
Hive-style catalog, Delta extensions — ``notebooks/01.formatos_ficheros/
03.iceberg_primer.py:57-63`` shows the catalog/extension config pattern) but
targets plain OSS Spark:

- AQE on (runtime re-plan, skew-join handling, partition coalescing)
- shuffle partitions sized for the local harness (overridable; on a real
  cluster you'd size this to ~2-3x total cores or rely on AQE coalescing)
- UTC session timezone so timestamp semantics match the DuckDB oracle
- Arrow enabled for every Python<->JVM boundary crossing

Delta/Iceberg runtime jars are not available in this environment, so the
lakehouse layer (``lakehouses_spark.tables``) is a pure-Spark transaction-log
implementation and needs no extra session config.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "lakehouses-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    warehouse_dir: str | None = None,
    hive_metastore_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (the bench harness contract),
    else all local cores.

    ``hive_metastore_dir`` switches the session catalog to a PERSISTENT
    Derby-backed Hive metastore rooted at that directory (the reference's
    hive_metastore contract, 02…/03.ingesta_incremental_v2 [json].py:221-228):
    catalog views published via ``LakeCatalog.publish`` then resolve by
    3-level name in plain ``spark.sql`` from any later session pointed at the
    same directory. Caveats: ``spark.sql.catalogImplementation`` is a static
    conf — this must be the FIRST session built in the process — and Derby
    allows one live session per metastore directory.
    """
    # Python workers (pandas UDF / mapInPandas) unpickle engine functions by
    # module reference — make the package importable in workers regardless of
    # the caller's cwd. Must happen before the JVM forks the first worker.
    repo_root = str(Path(__file__).resolve().parent.parent)
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{repo_root}{os.pathsep}{pp}" if pp else repo_root

    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # --- planner / runtime optimization ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # --- determinism / oracle parity ---
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # --- Python boundary: always Arrow, never pickle-per-row ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- local-harness hygiene ---
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.streaming.schemaInference", "true")
        # events.parquet stores TIMESTAMP(NANOS) which Spark has no native
        # type for — read as long, converted in io.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    if hive_metastore_dir:
        ms = Path(hive_metastore_dir)
        ms.mkdir(parents=True, exist_ok=True)
        builder = (
            builder.config("spark.sql.catalogImplementation", "hive")
            .config("spark.sql.warehouse.dir", warehouse_dir or str(ms / "warehouse"))
            .config(
                "spark.hadoop.javax.jdo.option.ConnectionURL",
                f"jdbc:derby:;databaseName={ms / 'metastore_db'};create=true",
            )
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
