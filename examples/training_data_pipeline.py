#!/usr/bin/env python
"""Training-data curation pipeline — the §2.12 north-star operators composed
end-to-end on the documents/embeddings testdata:

    raw documents
      → text statistics + quality scoring (JVM-side expressions)
      → exact dedup (content digest)
      → near-dup clustering (MinHash-LSH candidates → connected components)
      → curated LakeTable with provenance + CHECK constraint
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

    # 4. curated set = quality ∩ exact-canonical − near-dup-non-canonical
    curated_ids = (
        keep_quality.join(canon, "doc_id", "inner")
        .join(drop_near_dups, "doc_id", "left_anti")
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

    # 5. embedding audit: any near-identical vectors sneaking through?
    emb = load_table(spark, SF, "embeddings")
    near = ann_lsh_pairs(emb, threshold=0.95).count()
    print(f"embedding near-dup audit (cos>=0.95): {near} pairs "
          f"({'clean' if near == 0 else 'REVIEW'})")
    spark.stop()


if __name__ == "__main__":
    main()
