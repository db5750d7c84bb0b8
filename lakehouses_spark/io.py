"""Table loading over the driver-generated parquet testdata.

The reference reads landing-zone files and registers bronze/silver/gold tables
in the metastore (``notebooks/02.ingestas_ficheros/03.ingesta_incremental_v2
[json].py:221-228``); here the equivalent batch surface is a parquet scan per
table (SURVEY §2.1 S1) plus temp-view registration for the SQL entry point
(S4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


_SHIPPED_TO: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Pandas-UDF/mapInPandas queries unpickle engine functions by module
    reference inside Python workers. For sessions WE create, session.py puts
    the repo on PYTHONPATH before the JVM forks workers — but the driver
    harness hands us ITS session, whose workers know nothing about this
    package. addPyFile ships a zip of the package to every executor once
    per application."""
    from pathlib import Path

    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED_TO:
        return
    _SHIPPED_TO.add(app_id)
    import tempfile
    import zipfile

    pkg_dir = Path(__file__).resolve().parent
    ztmp = tempfile.NamedTemporaryFile(suffix=".zip", delete=False)
    with zipfile.ZipFile(ztmp.name, "w") as z:
        for p in pkg_dir.rglob("*.py"):
            z.write(p, arcname=str(Path("lakehouses_spark") / p.relative_to(pkg_dir)))
    spark.sparkContext.addPyFile(ztmp.name)


def ensure_session_confs(spark: SparkSession) -> None:
    """Make any externally-created SparkSession (e.g. the driver harness's)
    behave like ours for query purposes. Both confs are runtime-settable:

    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which Spark can
      only scan as long (converted below) — without this every events query
      dies with PARQUET_TYPE_ILLEGAL
    - UTC session timezone: timestamp→string rendering must match the
      timezone-naive DuckDB oracles
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _ship_package(spark)


# (applicationId, sf_dir, table) -> DataFrame. The testdata is read-only
# and a DataFrame is an immutable lazy plan, so re-deriving it per query
# only re-pays file listing + footer schema inference (~100 ms) — across a
# 200-query sweep that's real time. Keyed by applicationId so a cached
# plan can never outlive its session.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1: columnar parquet scan. Filters/projections placed on top of this
    are pushed into the scan by Catalyst (PushedFilters / ReadSchema)."""
    ensure_session_confs(spark)
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the file. Depending on scan-conf timing
        # Spark surfaces it either as long (legacy nanosAsLong) or as
        # timestamp_ntz (native nanos→micros truncation). Normalize both to
        # a session-tz timestamp with the same micro truncation DuckDB
        # applies. Integer-divide the long form (never float-divide: nanos
        # exceed 2^53).
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


def explode_nonempty(df: DataFrame, arr, alias: str, *keep) -> DataFrame:
    """``df.select(*keep, F.explode(arr).alias(alias))`` minus the duplicated
    evaluation of ``arr`` (r12, guide §4.4's duplicate-eval hazard with
    built-ins): for a plain ``explode`` over a COMPUTED array, Catalyst's
    ``InferFiltersFromGenerate`` adds ``size(arr) > 0`` and pushes it below
    the projection, substituting the alias — so the full array expression
    (e.g. the 32-hash MinHash signature, a per-doc n-gram transform) is
    evaluated TWICE per row, once in the Filter and once in the Project
    (measured: the minhash banding stage dropped ~25% when the filter went).

    ``explode_outer`` is exempt from the rule. For an array that is never
    empty the two differ only in the NULL row an outer explode emits for an
    empty/null array; the ``isNotNull`` filter on the GENERATED column
    removes exactly those rows, so the composition equals plain ``explode``
    whenever the array's ELEMENTS are non-null (every call site explodes
    arrays of hashes / concat_ws strings / struct pairs, which are never
    null — a null element would be dropped here where explode would keep it,
    so don't use this on arrays with nullable elements)."""
    from pyspark.sql import functions as _F

    return df.select(*keep, _F.explode_outer(arr).alias(alias)).where(
        _F.col(alias).isNotNull()
    )


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition before CPU-heavy per-row work.

    The testdata tables arrive as single parquet files → single input
    partition; any expensive map (shingling, hashing, vector math) would run
    on one core. At real scale the scan itself is parallel and this becomes a
    no-op decision, but the operator code shouldn't silently serialize."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
