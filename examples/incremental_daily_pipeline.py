#!/usr/bin/env python
"""Daily incremental pipeline — the round-5 production-shaped operators
composed as the nightly job a 100 TB crawl/lakehouse deployment actually
runs. Everything here is batch-vs-PERSISTED-state: the corpus is never
re-scanned in full, the tables carry state forward day to day.

    day N-1 state                       day N batch
    ─────────────                       ───────────
    MinHash signature index (LakeTable) ⟵ banded probe ⟶ per-doc verdicts
    current-state table (LakeTable)     ⟵ CDC APPLY CHANGES (delete/upsert)
    interval activity log               ⟵ bucketed overlap join (keyless)
    embedding index                     ⟵ filtered top-k (hybrid search)

    python examples/incremental_daily_pipeline.py

Each stage is the registered driver query (oracle-checked at sf0.01); this
script just sequences them the way a scheduler would and prints the
evidence a pipeline report needs: verdict mix, state-table version chain,
overlap volume, retrieval sanity.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouses_spark import get_spark
from lakehouses_spark.registry import load_all_queries

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(app_name="incremental-daily")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all_queries()

    # 1. near-dup gate: incoming batch vs the persisted signature index.
    #    In production the index is MERGE-maintained after each accepted
    #    batch; the query builds it from the corpus once, then only the
    #    batch side computes signatures.
    verdicts = reg["dedup_incremental_minhash"].fn(spark, SF)
    mix = verdicts.groupBy("status").count().orderBy("status").collect()
    print("near-dup gate:", {r.status: r["count"] for r in mix})

    # 2. CDC current-state: the day's change feed applied to the state
    #    table — per-key last-change collapse, deletes tombstoned, upserts
    #    merged; 8 MERGE commits through the transaction log.
    state = reg["lake_cdc_apply"].fn(spark, SF)
    print("cdc state rows:", state.count())

    # 3. concurrency audit: which click intervals overlapped purchase
    #    intervals in absolute time — the keyless interval join made
    #    linear-ish by time bucketing.
    overlaps = reg["ts_interval_overlap_join"].fn(spark, SF)
    print(
        "interval overlaps:",
        overlaps.count(),
        "avg overlap s:",
        round(overlaps.agg(F.avg("overlap_ms")).first()[0] / 1000, 1),
    )

    # 4. retrieval sanity: hybrid (filtered) top-k over the embedding index
    #    — the query a serving tier answers, label predicate pushed to scan.
    hits = reg["sim_filtered_knn"].fn(spark, SF)
    hits.show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
