#!/usr/bin/env python
"""End-to-end medallion pipeline demo — the reference's full arc
(landing → bronze → silver → gold) on the driver testdata, standalone.

    python examples/medallion_pipeline.py [workdir]

1. landing  — three dated JSON extracts land via `land_file`
2. bronze   — the ingestion engine drains them (availableNow) into an
              append-only LakeTable with metadata columns + archival
3. silver   — cleaning expressions (snake_case, typed timestamps, quality
              gate) into a clustered LakeTable
4. gold     — daily rollup + top-k report, plus MERGE-upsert into a serving
              table and a time-travel audit
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouses_spark.ingest import IngestionEngine, land_file
from lakehouses_spark.medallion import assert_no_rescued_rows, snake_case_columns
from lakehouses_spark.session import get_spark
from lakehouses_spark.tables import LakeCatalog


def main() -> None:
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    print(f"workdir: {root}")
    spark = get_spark(app_name="medallion-demo", driver_memory="4g")
    spark.sparkContext.setLogLevel("ERROR")

    # load_table normalizes events.ts (TIMESTAMP(NANOS)) whichever way the
    # scan surfaces it (bigint or timestamp_ntz)
    from lakehouses_spark.io import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")

    # 1. landing: three extracts, as a daily scheduler would drop them
    for day in (1, 2, 3):
        chunk = events.where(F.dayofmonth("ts") == day) \
            .withColumn("ts", F.col("ts").cast("string"))
        land_file(chunk, root / "landing", "app", "events", fmt="json")
    print("landed:", len(list((root / "landing").rglob("*.json"))), "extracts")

    # 2. bronze: incremental drain + archival
    eng = IngestionEngine(spark, root)
    cfg = {"datasource": "app", "dataset": "events", "source": {"format": "json"}}
    eng.run(cfg)
    bronze = eng.bronze_table(cfg)
    print("bronze:", bronze.read().count(), "rows @ v", bronze.version,
          "| archived:", len(list((root / 'raw').rglob('*.json'))))

    # 3. silver: typed, gated, clustered by event day
    cat = LakeCatalog(spark, root / "warehouse")
    cat.create_database("silver")
    silver_df = (
        assert_no_rescued_rows(snake_case_columns(bronze.read()))
        .withColumn("ts", F.to_timestamp("ts"))
        .withColumn("event_day", F.date_trunc("day", "ts").cast("date"))
        .select("event_id", "ts", "event_day", "user_id", "event_type", "value")
    )
    cat.create_table("silver.events", silver_df, partition_by=["event_day"], mode="overwrite")
    print("silver:", cat.table("silver.events").read().count(), "rows, clustered by event_day")

    # 4. gold: daily rollup + MERGE-maintained serving table + time travel
    cat.create_database("gold")
    rollup = (
        cat.table("silver.events").read()
        .groupBy("event_day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    gold = cat.create_table("gold.daily_rollup", rollup, mode="overwrite")
    # a corrected late batch arrives → MERGE upsert
    correction = rollup.limit(2).withColumn("total", F.col("total") + 1000.0)
    gold.merge(correction, "t.event_day = s.event_day AND t.event_type = s.event_type")
    print("gold:", gold.read().count(), "rollup rows @ v", gold.version)
    print("audit (time travel v0 vs current):",
          gold.read(version=0).agg(F.round(F.sum("total"), 2)).collect()[0][0],
          "→", gold.read().agg(F.round(F.sum("total"), 2)).collect()[0][0])
    top = gold.read().orderBy(F.col("total").desc()).limit(3).collect()
    print("top-3 gold rows:", [(str(r.event_day), r.event_type, r.total) for r in top])
    spark.stop()


if __name__ == "__main__":
    main()
