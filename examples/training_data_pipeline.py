#!/usr/bin/env python
"""Training-data curation pipeline — the §2.12 north-star operators composed
end-to-end on the documents/embeddings testdata:

    raw documents
      → text statistics + quality scoring (JVM-side expressions)
      → benchmark decontamination (n-gram overlap drop-list)
      → exact dedup (content digest)
      → near-dup clustering (MinHash-LSH candidates → connected components)
      → curated LakeTable with provenance + CHECK constraint
      → temperature-weighted mixture rebalance over the curated set
      → sequence packing into fixed token-budget bins
      → embedding near-dup audit (ANN over unit vectors)

    python examples/training_data_pipeline.py [workdir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouses_spark import LakeTable, get_spark, load_table
from lakehouses_spark.queries.dedup import connected_components, dedup_minhash_lsh
from lakehouses_spark.queries.similarity import ann_lsh_pairs
from lakehouses_spark.registry import load_all_queries

SF = "/root/testdata/sf0.01"


def main() -> None:
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    spark = get_spark(app_name="training-data-pipeline", driver_memory="6g")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all_queries()

    docs = load_table(spark, SF, "documents")
    print(f"raw documents: {docs.count()}")

    # 1. quality scoring (registry operator, JVM-side)
    quality = registry["text_quality_score"].fn(spark, SF)
    keep_quality = quality.where(F.col("quality_score") >= 0.55).select("doc_id")
    print(f"pass quality gate: {keep_quality.count()}")

    # 1b. benchmark decontamination: docs sharing an n-gram with the
    #     held-out split are dropped from the training side
    contaminated = registry["text_decontaminate"].fn(spark, SF).select("doc_id")
    print(f"decontamination drop-list: {contaminated.count()} docs")

    # 2. exact dedup: one canonical doc per content digest
    exact = registry["dedup_exact"].fn(spark, SF)
    canon = exact.select(F.col("canonical_id").alias("doc_id"))

    # 3. near-dup clusters: MinHash-LSH candidates → connected components →
    #    keep only each cluster's canonical member
    pairs = dedup_minhash_lsh(spark, SF)
    clusters = connected_components(pairs)
    drop_near_dups = clusters.where(F.col("doc_id") != F.col("cluster_id")) \
        .select("doc_id")
    print(f"near-dup clusters: {clusters.select('cluster_id').distinct().count()}"
          f" | docs dropped as non-canonical: {drop_near_dups.count()}")

    # 3b. substring audit: verbatim k-token runs shared across documents
    #     that whole-doc dedup would miss (template/boilerplate copying) —
    #     report scale, don't drop (a pipeline would trim the spans)
    from lakehouses_spark.queries.dedup import common_substring_pairs

    runs = common_substring_pairs(docs)
    worst = runs.orderBy(F.desc("max_run_tokens")).first()
    print(f"substring audit: {runs.count()} doc pairs share a verbatim run "
          f"(longest: {0 if worst is None else worst.max_run_tokens} tokens)")

    # 4. curated set = quality ∩ exact-canonical − near-dup-non-canonical
    curated_ids = (
        keep_quality.join(canon, "doc_id", "inner")
        .join(drop_near_dups, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
    )
    curated = docs.join(curated_ids, "doc_id").withColumn(
        "_curated_at", F.current_timestamp()
    )

    t = LakeTable.create(spark, root / "curated_documents", curated,
                         partition_by=["lang"], mode="overwrite")
    t.add_constraint("nonempty_text", "length(text) > 0")
    print(f"curated LakeTable: {t.read().count()} docs @ v{t.version} "
          f"({t.detail()['num_files']} files, clustered by lang)")
    per_lang = {r.lang: r.n for r in t.read().groupBy("lang")
                .agg(F.count(F.lit(1)).alias("n")).collect()}
    print(f"per-language: {dict(sorted(per_lang.items()))}")

    # 5. mixture rebalance: temperature-weighted per-language quotas over
    #    the CURATED set (upsample tail languages, downsample the head)
    cur = t.read()
    counts = cur.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    wsum = counts.agg(F.sum(F.sqrt("n")).alias("w_total"))
    quotas = counts.crossJoin(F.broadcast(wsum)).select(
        "lang",
        F.floor(150 * F.sqrt("n") / F.col("w_total")).cast("int").alias("quota"),
    )
    from pyspark.sql import Window

    rank_w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    mixture = (
        cur.select("doc_id", "lang", "text",
                   F.row_number().over(rank_w).alias("rk"))
        .join(F.broadcast(quotas), "lang")
        .where(F.col("rk") <= F.col("quota"))
    )
    print(f"mixture after temperature rebalance: {mixture.count()} docs "
          f"({ {r.lang: r.quota for r in quotas.collect()} })")

    # 6. sequence packing: concat-and-chunk the mixture into 512-token bins
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    pack_w = (
        Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bins = (
        mixture.select("lang", "doc_id", n_tokens.alias("n_tokens"),
                       (F.sum(n_tokens).over(pack_w) - n_tokens).alias("off"))
        .groupBy("lang", F.floor(F.col("off") / 512).alias("bin_id"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").alias("total_tokens"))
    )
    nb = bins.count()
    print(f"packed into {nb} 512-token bins; mean fill "
          f"{bins.agg(F.round(F.avg('total_tokens'), 1).alias('m')).collect()[0].m}")

    # 6b. context-window chunking of the mixture (the retrieval/packing
    #     alternative: overlapping fixed-width chunks with provenance)
    from lakehouses_spark.queries.curation import chunk_docs

    chunks = chunk_docs(mixture.select("doc_id", "text"))
    print(f"chunked mixture: {chunks.count()} overlapping 32-token chunks "
          f"from {mixture.count()} docs")

    # 7. embedding audit: any near-identical vectors sneaking through?
    emb = load_table(spark, SF, "embeddings")
    near = ann_lsh_pairs(emb, threshold=0.95).count()
    print(f"embedding near-dup audit (cos>=0.95): {near} pairs "
          f"({'clean' if near == 0 else 'REVIEW'})")

    # 8. deterministic train/val/test split over the mixture — seeded hash
    #    buckets, so re-running the pipeline (or re-ingesting a shard) never
    #    migrates a document across splits (no RNG, no layout dependence)
    from lakehouses_spark.queries.curation import SPLIT_SEED, hash_split_col

    split = hash_split_col(F.col("doc_id"))
    split_counts = {
        r.split: r.n
        for r in mixture.select(split.alias("split"))
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(f"hash-split (seed {SPLIT_SEED!r}): {dict(sorted(split_counts.items()))}")
    spark.stop()


if __name__ == "__main__":
    main()
