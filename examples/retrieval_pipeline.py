#!/usr/bin/env python
"""Embedding retrieval pipeline — the similarity-search operator family
composed end-to-end on the embeddings testdata (the serving-side workflow a
RAG / semantic-search platform runs):

    embedding corpus
      → near-dup audit: exact blocked all-pairs vs ANN (LSH / IVF / IVF-PQ)
        recall cross-check on the twin-injected corpus
      → single-query brute-force top-k (the always-correct baseline)
      → batched kNN serving (broadcast query set, one corpus scan)
      → ColBERT-style MaxSim late-interaction re-rank over multi-vector bags
      → per-label centroid table (the IVF coarse quantizer's training
        artifact, useful as a label sketch on its own)
      → incremental ingest: a daily vector batch probes the persisted
        IVF index for near-dups (no retraining, no corpus re-scan)

    python examples/retrieval_pipeline.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouses_spark import get_spark, load_table
from lakehouses_spark.registry import load_all_queries

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(app_name="retrieval-pipeline", driver_memory="6g")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all_queries()

    emb = load_table(spark, SF, "embeddings")
    print(f"corpus vectors: {emb.count()}")

    # 1. near-dup audit: the exact path and every ANN path must agree on
    #    the twin-injected corpus (the drivers' own recall contract)
    exact = registry["sim_pairs_blocked"].fn(spark, SF)
    n_exact = exact.count()
    for ann in ("sim_ann_lsh", "sim_ann_ivf", "sim_ann_ivfpq"):
        pairs = registry[ann].fn(spark, SF)
        print(f"{ann}: {pairs.count()} near-dup pairs (exact tier: {n_exact})")

    # 2. single-query brute force — the correctness baseline every ANN
    #    variant is measured against
    topk = registry["sim_knn_cosine"].fn(spark, SF)
    print("top-3 for query vec 0:")
    topk.limit(3).show(truncate=False)

    # 3. batched serving: many queries, ONE corpus scan
    batch = registry["sim_knn_batch"].fn(spark, SF)
    n_queries = batch.select("query_id").distinct().count()
    print(f"batched kNN: {batch.count()} result rows for {n_queries} queries")

    # 4. late-interaction re-rank: multi-vector MaxSim over 4-token bags
    maxsim = registry["sim_maxsim_multivector"].fn(spark, SF)
    print("MaxSim top matches per multi-vector query:")
    maxsim.where(F.col("rk") == 1).show(truncate=False)

    # 5. per-label centroids — the coarse-quantizer training artifact
    cents = registry["sim_centroids"].fn(spark, SF)
    print(f"centroid table rows (label × dim): {cents.count()}")

    # 6. incremental ingest: a daily batch probes the PERSISTED IVF index
    #    for near-dup corpus vectors — no quantizer retraining, no full scan
    incr = registry["sim_ann_incremental"].fn(spark, SF)
    verdicts = {r["status"]: r["n"] for r in
                incr.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}
    print(f"incremental ANN verdicts: {verdicts}")

    spark.stop()
    print("retrieval pipeline complete")


if __name__ == "__main__":
    main()
