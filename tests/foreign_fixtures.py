"""Shared HAND-BUILT foreign-table fixtures (VERDICT r11 #6): one
canonical hard-layout table per format — partitioned, optionally
column-mapped — reused by the metadata, stream, and DML test planes so a
new verb cannot accidentally skip the hard input class.

The layouts are deliberately what REAL external writers produce, not
what this repo's own exporter happens to emit:

- Delta: hive-partitioned directories; partition values live ONLY in
  add.partitionValues (never in the data files); under column mapping
  the files store physical names, partitionValues key by PHYSICAL name
  while metadata.partitionColumns hold the LOGICAL name (per spec).
- Iceberg: identity-partitioned with TRUTHFUL typed partition tuples
  (each data file holds exactly one partition value, manifests carry the
  matching r102 record) and the declared identity spec; data files keep
  every column (Iceberg's native layout, unlike Delta's hive stripping).
"""

from __future__ import annotations

import json

from lakehouses_spark.tables import LakeTable

# k 1..6, v = 10k, partitions A:{1,2,3} B:{4,5} C:{6}
PARTS = (("A", [1, 2, 3]), ("B", [4, 5]), ("C", [6]))


def mk_foreign_delta(spark, base, cdf=False, column_mapped=False):
    """Hand-built hive-partitioned foreign Delta table at ``base``.

    With ``column_mapped`` the table uses name mapping: logical columns
    (k, v, seg) map to physical (col-k, col-v, col-seg) — the combined
    partitioned + column-mapped input class."""
    import shutil as _sh

    phys = (lambda c: f"col-{c}") if column_mapped else (lambda c: c)
    (base / "_delta_log").mkdir(parents=True)
    adds = []
    for part, ks in PARTS:
        pdir = base / f"{phys('seg')}={part}"
        pdir.mkdir()
        ddl = f"`{phys('k')}` long, `{phys('v')}` double"
        spark.createDataFrame(
            [(k, float(k) * 10) for k in ks], ddl
        ).coalesce(1).write.mode("overwrite").parquet(str(pdir / "out"))
        pf = next((pdir / "out").rglob("part-*.parquet"))
        dest_f = pdir / f"part-{part}.parquet"
        pf.rename(dest_f)
        _sh.rmtree(pdir / "out")
        adds.append({"add": {
            "path": f"{phys('seg')}={part}/part-{part}.parquet",
            "partitionValues": {phys("seg"): part},  # PHYSICAL key
            "size": dest_f.stat().st_size,
            "modificationTime": 0, "dataChange": True}})

    def fld(name, typ, fid):
        md = {}
        if column_mapped:
            md = {"delta.columnMapping.id": fid,
                  "delta.columnMapping.physicalName": phys(name)}
        return {"name": name, "type": typ, "nullable": True,
                "metadata": md}

    schema = {"type": "struct", "fields": [
        fld("k", "long", 1), fld("v", "double", 2),
        fld("seg", "string", 3),
    ]}
    configuration = {}
    if cdf:
        configuration["delta.enableChangeDataFeed"] = "true"
    if column_mapped:
        configuration["delta.columnMapping.mode"] = "name"
        configuration["delta.columnMapping.maxColumnId"] = "3"
    protocol = (
        {"minReaderVersion": 2, "minWriterVersion": 5}
        if column_mapped else
        {"minReaderVersion": 1, "minWriterVersion": 2}
    )
    actions = [
        {"protocol": protocol},
        {"metaData": {
            "id": "pm" if column_mapped else "p",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": ["seg"],  # LOGICAL name, per spec
            "configuration": configuration,
            "createdTime": 0}},
        *adds,
    ]
    with open(base / "_delta_log" / f"{0:020d}.json", "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return base


def mk_foreign_iceberg(spark, tmp_path, name):
    """A truthful identity-partitioned foreign Iceberg table: every data
    file holds exactly one `status` value, manifests carry the matching
    typed partition record, and the metadata declares identity(status)."""
    import copy

    import pyarrow.parquet as pq

    from lakehouses_spark.functions.avro_py import read_ocf_bytes
    from lakehouses_spark.tables.iceberg_meta import (
        _MANIFEST_ENTRY_SCHEMA,
        write_ocf_bytes_with_meta,
    )

    rows_a = [{"k": i, "status": "A", "price": float(10 * i)}
              for i in range(1, 6)]
    rows_b = [{"k": i, "status": "B", "price": float(10 * i)}
              for i in range(6, 11)]
    t = LakeTable.create(
        spark, tmp_path / f"lake_{name}",
        spark.createDataFrame(
            rows_a, "k long, status string, price double").coalesce(1),
        num_files=1,
    )
    t.append(spark.createDataFrame(
        rows_b, "k long, status string, price double").coalesce(1))
    dest = t.export_iceberg_metadata(tmp_path / name)

    m = json.loads(sorted(
        (dest / "metadata").glob("v*.metadata.json"),
        key=lambda p: int(p.name.split(".")[0][1:]))[-1].read_text())
    ice = next(s for s in m["schemas"]
               if s["schema-id"] == m["current-schema-id"])
    status_id = next(f["id"] for f in ice["fields"]
                     if f["name"] == "status")

    part_schema = copy.deepcopy(_MANIFEST_ENTRY_SCHEMA)
    for f in part_schema["fields"]:
        if f["name"] == "data_file":
            for g in f["type"]["fields"]:
                if g["name"] == "partition":
                    g["type"]["fields"] = [{
                        "name": "status", "type": ["null", "string"],
                        "field-id": 1000,
                    }]
    stamped = 0
    for mf in sorted((dest / "metadata").glob("*.avro")):
        _, mrows = read_ocf_bytes(mf.read_bytes())
        if not mrows or "data_file" not in mrows[0]:
            continue
        for e in mrows:
            if e["data_file"].get("content", 0) == 0:
                fp = e["data_file"]["file_path"]
                tbl = pq.read_table(
                    fp[7:] if fp.startswith("file://") else fp)
                vals = set(tbl.column("status").to_pylist())
                assert len(vals) == 1, vals
                e["data_file"]["partition"] = {"status": vals.pop()}
                stamped += 1
        mf.write_bytes(write_ocf_bytes_with_meta(
            mrows, part_schema,
            {"partition-spec":
                 '[{"name": "status", "transform": "identity", '
                 '"source-id": %d, "field-id": 1000}]' % status_id,
             "partition-spec-id": "0",
             "format-version": "2", "content": "data"},
        ))
    assert stamped >= 2
    meta_file = sorted(
        (dest / "metadata").glob("v*.metadata.json"),
        key=lambda p: int(p.name.split(".")[0][1:]))[-1]
    m["partition-specs"] = [{"spec-id": 0, "fields": [
        {"name": "status", "transform": "identity",
         "source-id": status_id, "field-id": 1000}]}]
    m["default-spec-id"] = 0
    meta_file.write_text(json.dumps(m))
    return dest
