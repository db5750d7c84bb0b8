#!/usr/bin/env python
"""External-client round trip — the round-10 WRITE plane end-to-end.

The story: engine A (this library) produces a table and exports it as a
plain Delta table and a plain Iceberg v2 table; engine B (a "foreign
client" holding nothing but the exported metadata — no LakeTable, no
jars) reads it, MUTATES it with copy-on-write DML, reads its own change
feed, rolls it back, and runs maintenance — entirely through
`DeltaLogReader` / `IcebergMetadataReader`.

    python examples/external_client.py [workdir]

Every capability shown here is also a registered driver query or pytest
pin (`lake_external_delta_dml`, `lake_external_iceberg_dml`,
test_delta_export / test_iceberg_export); this script just sequences
them the way a real two-engine deployment would.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouses_spark.io import load_table
from lakehouses_spark.session import get_spark
from lakehouses_spark.tables import LakeTable
from lakehouses_spark.tables.delta_log import DeltaLogReader, read_delta
from lakehouses_spark.tables.iceberg_meta import (
    IcebergMetadataReader,
    read_iceberg,
)

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    work = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        tempfile.mkdtemp(prefix="external-client-"))
    work.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="external-client", driver_memory="4g")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- engine A: produce + export ---------------------------------- #
    base = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
    # range-clustered into 4 files so the COW DML and the manifest-bounds
    # pruning below are visibly PARTIAL (touch some files, skip others)
    t = LakeTable.create(spark, work / "lake", base,
                         partition_by=["o_orderkey"], num_files=4)
    t.set_properties({"delta.enableChangeDataFeed": "true"})
    ddest = t.export_delta_log(work / "orders_delta")
    idest = t.export_iceberg_metadata(work / "orders_iceberg")
    n0 = base.count()
    print(f"exported {n0} rows as Delta ({ddest}) and Iceberg ({idest})")

    # ---- engine B, Delta side: read, mutate, CDF, restore, maintain -- #
    r = DeltaLogReader(spark, ddest)
    v0 = r.snapshot().version
    res = r.delete("o_orderstatus = 'F' AND o_totalprice < 50000")
    print(f"[delta] DELETE rewrote {res['rewritten_files']}/"
          f"{res['candidate_files']} files -> v{res['version']}")
    res = r.update({"o_totalprice": "o_totalprice * 1.1"},
                   where="o_orderpriority = '1-URGENT'")
    print(f"[delta] UPDATE rewrote {res['rewritten_files']} files "
          f"-> v{res['version']}")
    src = base.limit(3).withColumn("o_totalprice", F.lit(0.0))
    res = r.merge(src, "t.o_orderkey = s.o_orderkey")
    print(f"[delta] MERGE rewrote {res['rewritten_files']} files, "
          f"inserted {res['inserted_rows']} rows -> v{res['version']}")
    feed = r.table_changes(v0 + 1, r.snapshot().version)
    mix = {x["_change_type"]: x["n"] for x in
           feed.groupBy("_change_type").agg(F.count(F.lit(1)).alias("n"))
           .collect()}
    print(f"[delta] change feed over the foreign DML: {mix}")
    n_now = read_delta(spark, ddest).count()
    r.restore(v0)
    assert read_delta(spark, ddest).count() == n0 != n_now
    print(f"[delta] RESTORE v{v0}: {n_now} -> {n0} rows (metadata-only)")
    res = r.optimize()
    vac = r.vacuum(retention_hours=0)
    print(f"[delta] OPTIMIZE -> {res['output_files']} files; "
          f"VACUUM reclaimed {vac['deleted']} "
          f"(tombstone-timestamp retention)")

    # ---- engine B, Iceberg side: read, prune, mutate, inspect -------- #
    ir = IcebergMetadataReader(spark, idest)
    pre = ir.meta["current-snapshot-id"]
    n_all = len(ir.plan_files())
    n_hit = len(ir.plan_files(filters=[("o_orderkey", "<=", 100)]))
    print(f"[iceberg] manifest-bounds pruning: {n_hit}/{n_all} files "
          "planned for o_orderkey <= 100")
    res = ir.delete("o_orderstatus = 'F' AND o_totalprice < 50000")
    print(f"[iceberg] DELETE rewrote {res['rewritten_files']} files -> "
          f"snapshot {res['snapshot_id']} (operation=delete)")
    ir2 = IcebergMetadataReader(spark, idest)
    res = ir2.update({"o_totalprice": "o_totalprice * 1.1"},
                     where="o_orderpriority = '1-URGENT'")
    print(f"[iceberg] UPDATE rewrote {res['rewritten_files']} files -> "
          f"snapshot {res['snapshot_id']} (operation=overwrite)")
    ir3 = IcebergMetadataReader(spark, idest)
    assert ir3.to_df(snapshot_id=pre).count() == n0  # time travel intact
    parts = ir3.partitions().collect()
    print(f"[iceberg] .partitions: {len(parts)} tuple(s), "
          f"{parts[0].record_count} records in "
          f"{parts[0].file_count} files")
    exp = ir3.expire_snapshots(keep_last=1)
    print(f"[iceberg] expire_snapshots reclaimed "
          f"{exp['deleted_data_files']} data files")

    got = sorted(
        x.o_orderkey for x in read_iceberg(spark, idest).limit(5).collect())
    print(f"[iceberg] final read OK (sample keys {got})")

    # ---- round 11: engine B creates its OWN tables from scratch ------ #
    # No LakeTable anywhere: partitioned CTAS + append + MERGE + rollback
    # through the native writers, plus the SQL spelling over paths.
    from lakehouses_spark.tables import LakeCatalog, LakeSQL
    from lakehouses_spark.tables.delta_log import write_delta_table
    from lakehouses_spark.tables.iceberg_meta import write_iceberg_table

    fresh = base.limit(2000)
    wd = write_delta_table(spark, fresh, work / "fresh_delta",
                           partition_by=["o_orderstatus"])
    wi = write_iceberg_table(spark, fresh, work / "fresh_iceberg",
                             partition_by=["o_orderstatus"])
    print(f"[fresh] CTAS: delta {len(wd.snapshot().files)} files "
          f"(hive-partitioned), iceberg {len(wi.live_files())} files "
          "(identity spec, typed manifest tuples)")
    app = fresh.limit(5).withColumn("o_orderstatus", F.lit("Z"))
    wd.append(app)
    wi.append(app)
    wi2 = IcebergMetadataReader(spark, work / "fresh_iceberg")
    pre_m = wi2.meta["current-snapshot-id"]
    wi2.merge(app.withColumn("o_totalprice", F.lit(1.0)),
              "t.o_orderkey = s.o_orderkey AND t.o_orderstatus = 'Z'")
    wi3 = IcebergMetadataReader(spark, work / "fresh_iceberg")
    wi3.rollback_to_snapshot(pre_m)  # metadata-only undo of the MERGE
    print("[fresh] append -> MERGE -> rollback_to_snapshot on the "
          "fresh Iceberg table (zero data bytes moved by the rollback)")
    # the same lifecycle as SQL over path targets
    lake = LakeSQL(LakeCatalog(spark, work / "wh"))
    n_z = lake.sql(
        f"SELECT count(*) AS n FROM delta.`{work / 'fresh_delta'}` "
        "WHERE o_orderstatus = 'Z'").collect()[0].n
    lake.sql(f"DELETE FROM delta.`{work / 'fresh_delta'}` "
             "WHERE o_orderstatus = 'Z'")
    lake.sql(f"OPTIMIZE delta.`{work / 'fresh_delta'}`")
    print(f"[fresh] SQL over the path: counted {n_z} 'Z' rows, deleted "
          "them, compacted — no catalog entry involved")

    # ---- round 12: transforms, schema evolution, merge-on-read ------- #
    # The reference's own Iceberg spec is PARTITIONED BY (YEAR(col));
    # sparse DML at scale wants merge-on-read; real upsert pipelines
    # add columns. All three, still with no jar and no LakeTable:
    tdest = work / "fresh_year_iceberg"
    dated = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice").limit(3000)
    wt = write_iceberg_table(
        spark, dated, tdest, partition_by=["YEAR(o_orderdate)"],
        properties={"write.delete.mode": "merge-on-read"})
    spec = wt.meta["partition-specs"][0]["fields"][0]
    print(f"[r12] CTAS under the {spec['transform']} transform "
          f"({spec['name']}); tuples are spec-exact epoch ordinals")
    res = wt.delete("o_orderdate >= DATE'1997-01-01'")  # property: MOR
    print(f"[r12] merge-on-read DELETE: {res['deleted_rows']} rows "
          f"tombstoned in {res['delete_files']} position-delete "
          f"file(s), {res['rewritten_files']} data files rewritten")
    wt2 = IcebergMetadataReader(spark, tdest)
    res = wt2.update({"o_totalprice": "o_totalprice * 2"},
                     where="o_orderkey % 100 = 0", mode="merge-on-read")
    print(f"[r12] merge-on-read UPDATE: {res['updated_rows']} old "
          f"versions tombstoned, {res['added_files']} image file(s) "
          "appended — same snapshot")
    evo = dated.limit(50).withColumn("o_channel", F.lit("backfill"))
    wt3 = IcebergMetadataReader(spark, tdest)
    res = wt3.merge(evo, "t.o_orderkey = s.o_orderkey",
                    schema_evolution=True)
    wt4 = IcebergMetadataReader(spark, tdest)
    print(f"[r12] schema-evolving MERGE: +o_channel (schema-id "
          f"{wt4.meta['current-schema-id']}, old schema retained), "
          f"{res['inserted_rows']} inserted; untouched rows read NULL")
    wt4.rewrite_data_files(target_file_size_mb=64)
    print("[r12] compaction materialized the MOR tombstones away; "
          f"final count {read_iceberg(spark, tdest).count()}")

    # ---- r12 continuation: bucket/truncate + generated/identity ------ #
    # The spec's hash transforms (murmur3 verified against the spec's
    # published Appendix B vectors) — the most common high-cardinality
    # Iceberg layout — and Delta's generated/identity columns, both
    # previously refused:
    bdest = work / "fresh_bucket_iceberg"
    wb = write_iceberg_table(
        spark, dated, bdest,
        partition_by=["bucket(8, o_orderkey)"])
    res = wb.delete("o_orderkey = 1")  # scans ~1/8 of the files
    print(f"[r12+] bucket(8) CTAS + equality DELETE: candidate scan "
          f"pruned to the literal's bucket, {res['rewritten_files']} "
          "file(s) rewritten")
    gdest = work / "fresh_gen_delta"
    gsrc = dated.select(
        F.col("o_orderkey").alias("id"), "o_totalprice",
        (F.col("o_totalprice") * 2).alias("g"))
    write_delta_table(spark, gsrc, gdest)
    import json as _json
    c0 = gdest / "_delta_log" / f"{0:020d}.json"
    lines = []
    for line in c0.read_text().splitlines():
        a = _json.loads(line)
        if "protocol" in a:
            a["protocol"] = {"minReaderVersion": 1, "minWriterVersion": 7,
                             "writerFeatures": ["generatedColumns",
                                                "identityColumns"]}
        if "metaData" in a:
            sj = _json.loads(a["metaData"]["schemaString"])
            for f in sj["fields"]:
                if f["name"] == "id":
                    f["metadata"] = {
                        "delta.identity.start": 1,
                        "delta.identity.step": 1,
                        "delta.identity.highWaterMark": 3_000_000,
                        "delta.identity.allowExplicitInsert": False}
                if f["name"] == "g":
                    f["metadata"] = {
                        "delta.generationExpression": "o_totalprice * 2"}
            a["metaData"]["schemaString"] = _json.dumps(sj)
        lines.append(_json.dumps(a))
    c0.write_text("\n".join(lines) + "\n")
    gr = DeltaLogReader(spark, gdest)
    res = gr.append(dated.select("o_totalprice").limit(100))
    gr2 = DeltaLogReader(spark, gdest)
    mx = gr2.to_df().agg(F.max("id")).first()[0]
    print(f"[r12+] generated/identity append: 100 ids allocated past "
          f"the watermark (max id {mx}), g computed from its "
          "generation expression — both enforced on every write")
    # INSERT OVERWRITE: one atomic replaceWhere commit on each format
    res = DeltaLogReader(spark, gdest).overwrite(
        dated.select("o_totalprice").limit(10).withColumn(
            "o_totalprice", F.col("o_totalprice") * 0),
        replace_where="o_totalprice = 0.0")
    print(f"[r12+] replaceWhere overwrite: {res['removed_files']} "
          "file(s) replaced in one commit; rows outside the predicate "
          "refuse")
    # equality delete: delete-by-key with ZERO data read
    eqd = work / "fresh_eq_iceberg"
    wq = write_iceberg_table(
        spark, dated.select("o_orderkey", "o_totalprice"), eqd)
    res = wq.delete("o_orderkey IN (1, 2, 3)", mode="merge-on-read",
                    strategy="equality")
    print(f"[r12+] equality delete: {res['equality_rows']} key tuples, "
          f"{res['scanned_files']} files scanned — the Flink-upsert "
          "shape; compaction materializes it away")
    print("external-client round trip complete")
    spark.stop()


if __name__ == "__main__":
    main()
