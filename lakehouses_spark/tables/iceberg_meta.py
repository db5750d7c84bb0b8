"""Iceberg-format metadata export / read for LakeTable (VERDICT r6 #2).

The reference creates `USING iceberg` tables and inspects their metadata
layer directly: `metadata/v*.metadata.json`, the `snap-*.avro` manifest
lists, the `*-m0.avro` manifests, and the `snapshots` / `manifests` /
`metadata_log_entries` metadata tables
(notebooks/01.formatos_ficheros/03.iceberg_primer.py:114-124, 411-456).
S7's runtime jar is absent, so — exactly like `delta_log.py` did for the
Delta protocol — this module closes the FORMAT gap against the PUBLIC
Apache Iceberg table spec (v2) with stdlib + the in-repo pure-Python Avro
OCF codec (`functions/avro_py.py`, the only hard dependency of Iceberg
metadata):

- ``export_iceberg_metadata(table, dest)``: materialize a LakeTable as a
  standalone Iceberg v2 table in the hadoop-catalog layout — data files
  hard-linked, one ``metadata/v<N>.metadata.json`` per LakeTable version
  (so external time travel sees the same history), one snapshot + manifest
  list + manifest per data-changing commit, ``version-hint.text`` pointing
  at the tip. Because LakeTable parquet (Spark-written) carries no parquet
  field ids, the export writes the spec's ``schema.name-mapping.default``
  property — the public mechanism for adopting exactly such files.
- ``IcebergMetadataReader`` / ``read_iceberg``: an independent reader —
  stdlib JSON for table metadata, the pure-Python OCF codec for manifest
  lists/manifests, then ONE Spark parquet scan over the live files.
  Supports time travel by snapshot id, and exposes ``snapshots()`` /
  ``manifests()`` / ``metadata_log_entries()`` / ``history()`` /
  ``files()`` metadata tables mirroring the ones the reference queries.
  Fails loudly on v2 row-level delete files (content != DATA).

Everything targets the public Apache Iceberg Table Spec
(iceberg.apache.org/spec/): metadata-file fields, manifest-list and
manifest-entry Avro schemas (field-id annotated), sequence numbers,
snapshot log, and the name-mapping property.

Scale: export moves file METADATA only (no data rewrite), and manifests are
REUSED across snapshots exactly like real Iceberg — each commit writes one
manifest for its added files and rewrites only the manifests a delete
touched, so per-snapshot metadata work is O(changed files), not
O(table files). Manifest entries carry per-field lower/upper bounds (the
spec's single-value binary serialization keyed by field id), and the
reader's ``plan_files(filters)`` does Iceberg's manifest-level min/max file
pruning driver-side — no parquet footer is opened for pruned files. The
reader plans from the manifest list (no directory listing) and reads all
surviving files in one scan.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from pathlib import Path
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouses_spark.functions.avro_py import read_ocf_bytes, write_ocf_bytes
from lakehouses_spark.tables import log as txlog
from lakehouses_spark.tables.delta_log import exact_footer_bounds, fs_path_col

FORMAT_VERSION = 2
_DATA_CONTENT = 0  # manifest-entry data_file.content: 0=DATA, 1/2=deletes
# above this many manifests in one snapshot, decode fans out to executors
DISTRIBUTED_MANIFEST_THRESHOLD = 32


class IcebergExportError(RuntimeError):
    """The table uses a LakeTable feature this exporter can't express."""


class IcebergFormatError(RuntimeError):
    """The Iceberg table requires reader capabilities this module lacks."""


# --------------------------------------------------------------------------- #
# type mapping (Iceberg spec "Schemas and Data Types" <-> Spark)
# --------------------------------------------------------------------------- #
_PRIM_TO_ICE = {
    "boolean": "boolean",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "binary",
    "date": "date",
    "timestamp": "timestamptz",   # Spark TimestampType is tz-aware
    "timestamp_ntz": "timestamp",
}
_ICE_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "uuid": T.StringType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    "timestamptz": T.TimestampType(),
    "timestamp": T.TimestampNTZType(),
}


def _spark_type_to_iceberg(dt: T.DataType, alloc) -> Any:
    """Spark DataType -> Iceberg type JSON; `alloc(path)` yields stable field
    ids (keyed by structural path so surviving columns keep their id across
    schema evolution)."""
    name = dt.typeName()
    if name == "decimal":
        return f"decimal({dt.precision}, {dt.scale})"
    if name in _PRIM_TO_ICE:
        return _PRIM_TO_ICE[name]
    if isinstance(dt, T.ArrayType):
        eid = alloc("element")
        return {
            "type": "list",
            "element-id": eid,
            "element": _spark_type_to_iceberg(dt.elementType, lambda p: alloc(f"element.{p}")),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.MapType):
        kid, vid = alloc("key"), alloc("value")
        return {
            "type": "map",
            "key-id": kid,
            "key": _spark_type_to_iceberg(dt.keyType, lambda p: alloc(f"key.{p}")),
            "value-id": vid,
            "value": _spark_type_to_iceberg(dt.valueType, lambda p: alloc(f"value.{p}")),
            "value-required": not dt.valueContainsNull,
        }
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            fid = alloc(f.name)
            fields.append(
                {
                    "id": fid,
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _spark_type_to_iceberg(
                        f.dataType, lambda p, _n=f.name: alloc(f"{_n}.{p}")
                    ),
                }
            )
        return {"type": "struct", "fields": fields}
    raise IcebergExportError(f"no Iceberg mapping for Spark type {dt}")


def _iceberg_type_to_spark(t: Any) -> T.DataType:
    if isinstance(t, str):
        if t in _ICE_TO_SPARK:
            return _ICE_TO_SPARK[t]
        if t.startswith("decimal"):
            p, s = t[t.index("(") + 1 : t.index(")")].split(",")
            return T.DecimalType(int(p), int(s))
        if t.startswith("fixed"):
            return T.BinaryType()
        raise IcebergFormatError(f"unknown Iceberg type {t!r}")
    kind = t["type"]
    if kind == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"], _iceberg_type_to_spark(f["type"]), not f["required"]
                )
                for f in t["fields"]
            ]
        )
    if kind == "list":
        return T.ArrayType(
            _iceberg_type_to_spark(t["element"]), not t["element-required"]
        )
    if kind == "map":
        return T.MapType(
            _iceberg_type_to_spark(t["key"]),
            _iceberg_type_to_spark(t["value"]),
            not t["value-required"],
        )
    raise IcebergFormatError(f"unknown Iceberg nested type {kind!r}")


# --------------------------------------------------------------------------- #
# manifest-list / manifest Avro schemas (Iceberg spec, field-id annotated)
# --------------------------------------------------------------------------- #
_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"], "field-id": 4},
        {
            "name": "data_file",
            "field-id": 2,
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {
                        "name": "partition",
                        "field-id": 102,
                        # spec-0 is unpartitioned: empty struct r102
                        "type": {"type": "record", "name": "r102", "fields": []},
                    },
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                    # per-field stats, keyed by field id (the spec's k/v
                    # array encoding — Avro maps require string keys);
                    # bounds are the spec's single-value binary serialization
                    {
                        "name": "lower_bounds",
                        "field-id": 125,
                        "type": ["null", {
                            "type": "array",
                            "items": {
                                "type": "record", "name": "k126_v127",
                                "fields": [
                                    {"name": "key", "type": "int", "field-id": 126},
                                    {"name": "value", "type": "bytes", "field-id": 127},
                                ],
                            },
                        }],
                    },
                    {
                        "name": "upper_bounds",
                        "field-id": 128,
                        "type": ["null", {
                            "type": "array",
                            "items": {
                                "type": "record", "name": "k129_v130",
                                "fields": [
                                    {"name": "key", "type": "int", "field-id": 129},
                                    {"name": "value", "type": "bytes", "field-id": 130},
                                ],
                            },
                        }],
                    },
                    # field ids an EQUALITY delete file matches on (spec
                    # field 135; null for data / position-delete files)
                    {
                        "name": "equality_ids",
                        "field-id": 135,
                        "type": ["null", {"type": "array", "items": "int"}],
                    },
                ],
            },
        },
    ],
}


# identity partition sources supported for external writes: spark type
# name -> avro type in the manifest's typed partition record (r102).
# Date encodes as days-since-epoch int, the spec's representation.
_PV_AVRO = {
    "long": "long", "integer": "int", "short": "int", "byte": "int",
    "string": "string", "double": "double", "float": "float",
    "boolean": "boolean", "date": "int",
}

# date-family partition transforms supported on the external write plane
# (VERDICT r11 #3 — the reference's own spec is PARTITIONED BY
# (YEAR(fecha_ingreso)), 03.iceberg_primer.py:124). All four are the
# spec's deterministic epoch arithmetic ("Partition Transforms"): result
# is an int ordinal from 1970-01-01 (UTC for timestamps, floor semantics
# for pre-epoch values). bucket/truncate stay refused — evaluating a
# hash/truncation externally risks silently wrong tuples.
_DATE_TRANSFORMS = {"year", "month", "day", "hour",
                    "years", "months", "days", "hours"}
_US_PER_DAY = 86_400_000_000
_US_PER_HOUR = 3_600_000_000


def _floor_div_us(us: Column, unit: int) -> Column:
    """Exact long floor-division (negative-safe): pmod keeps the
    remainder non-negative, so pre-epoch timestamps land in the
    previous ordinal like the spec requires."""
    return ((us - F.pmod(us, F.lit(unit))) / F.lit(unit)).cast("int")


def _transform_col(transform: str, col: Column,
                   dt: T.DataType) -> Column | None:
    """Spark expression computing an Iceberg date-family partition
    transform from a source column, spec-exact. Derivation goes through
    days-since-epoch (tz-independent) rather than F.year/F.month on a
    timestamp, which would apply the SESSION timezone instead of the
    spec's UTC. None when (transform, source type) is unsupported."""
    name = dt.typeName()
    epoch = F.to_date(F.lit("1970-01-01"))
    if name == "date":
        if transform in ("hour", "hours"):
            return None  # hour() is timestamp-only per the spec
        d = col
    elif name == "timestamp":
        us = F.unix_micros(col)
        if transform in ("hour", "hours"):
            return _floor_div_us(us, _US_PER_HOUR)
        d = F.date_add(epoch, _floor_div_us(us, _US_PER_DAY))
    elif name == "timestamp_ntz":
        # ntz transforms by the LITERAL calendar value (no zone): derive
        # from the date/hour fields directly — tz-independent and exact
        d = F.to_date(col)
        if transform in ("hour", "hours"):
            return (F.datediff(d, epoch) * 24 + F.hour(col)).cast("int")
    else:
        return None
    if transform in ("day", "days"):
        return F.datediff(d, epoch).cast("int")
    if transform in ("year", "years"):
        return (F.year(d) - F.lit(1970)).cast("int")
    return ((F.year(d) - F.lit(1970)) * 12
            + F.month(d) - F.lit(1)).cast("int")


def parse_partition_by(partition_by: list[str] | None,
                       dtype_of: dict[str, T.DataType],
                       ) -> list[tuple[str, str]]:
    """Parse + validate CTAS/evolution partition spellings — a column
    name (identity), the date family (`YEAR(col)` / `months(col)` — the
    reference's own spec, 03.iceberg_primer.py:124), or the Spark SQL
    `bucket(16, col)` / `truncate(4, col)` — into (spec transform
    string, source column). Shared by `write_iceberg_table` and
    `update_spec`."""
    import re as _re

    from lakehouses_spark.tables.iceberg_transforms import (
        bucket_col,
        truncate_col,
    )

    part: list[tuple[str, str]] = []
    for ent in partition_by or []:
        m = _re.fullmatch(
            r"(years?|months?|days?|hours?)\s*\(\s*(\w+)\s*\)",
            ent.strip(), _re.IGNORECASE)
        bm = _re.fullmatch(
            r"(bucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)",
            ent.strip(), _re.IGNORECASE)
        if m:
            part.append((m.group(1).lower().rstrip("s"), m.group(2)))
        elif bm:
            part.append((f"{bm.group(1).lower()}[{int(bm.group(2))}]",
                         bm.group(3)))
        else:
            part.append(("identity", ent.strip()))
    missing = [c for _, c in part if c not in dtype_of]
    if missing:
        raise ValueError(f"partition_by columns {missing} not found")
    for tr, c in part:
        tname = dtype_of[c].typeName()
        if tr == "identity":
            if tname not in _PV_AVRO:
                raise IcebergFormatError(
                    f"partition column {c!r} has type {tname!r}, not "
                    "supported as an identity partition source"
                )
        elif tr.startswith("bucket["):
            n = int(tr[7:-1])
            if n <= 0 or bucket_col(F.col(c), dtype_of[c], n) is None:
                raise IcebergFormatError(
                    f"partition transform bucket({n}, {c}) over type "
                    f"{tname!r} is not supported (int/long/date/"
                    "timestamp/string/binary sources, N > 0)"
                )
        elif tr.startswith("truncate["):
            w = int(tr[9:-1])
            if w <= 0 or truncate_col(F.col(c), dtype_of[c], w) is None:
                raise IcebergFormatError(
                    f"partition transform truncate({w}, {c}) over type "
                    f"{tname!r} is not supported (int/long/string "
                    "sources, W > 0)"
                )
        elif _transform_col(tr, F.col(c), dtype_of[c]) is None:
            raise IcebergFormatError(
                f"partition transform {tr}({c}) over type {tname!r} is "
                "not supported (year/month/day take date or timestamp; "
                "hour takes timestamp)"
            )
    return part


def spec_field_name(tr: str, c: str) -> str:
    """Avro-safe spec field names matching Iceberg's own conventions."""
    if tr == "identity":
        return c
    if tr.startswith("bucket["):
        return f"{c}_bucket"
    if tr.startswith("truncate["):
        return f"{c}_trunc"
    return f"{c}_{tr}"


def _pv_from_dir(raw: str | None, dt: T.DataType) -> Any:
    """A hive directory value (already %XX-unescaped) back to the typed
    partition value the manifest stores."""
    if raw is None:
        return None
    name = dt.typeName()
    if name in ("integer", "long", "short", "byte"):
        return int(raw)
    if name in ("double", "float"):
        return float(raw)
    if name == "boolean":
        return raw == "true"
    if name == "date":
        import datetime

        return (datetime.date.fromisoformat(raw)
                - datetime.date(1970, 1, 1)).days
    return raw


# single-value binary serialization (Iceberg spec appendix D): the subset of
# types LakeTable stats actually carry
def _encode_bound(value: Any, dt: T.DataType) -> bytes | None:
    import struct as _st

    if value is None:
        return None
    if isinstance(value, float) and value != value:
        # the Iceberg spec excludes NaN from lower/upper bounds
        # (nan_value_counts is the dedicated field) — never encode one
        return None
    name = dt.typeName()
    try:
        if name in ("integer", "short", "byte"):
            return _st.pack("<i", int(value))
        if name == "long":
            return _st.pack("<q", int(value))
        if name == "float":
            return _st.pack("<f", float(value))
        if name == "double":
            return _st.pack("<d", float(value))
        if name == "boolean":
            return b"\x01" if value else b"\x00"
        if name == "string":
            return str(value).encode("utf-8")
        if name == "date":
            import datetime

            d = (
                datetime.date.fromisoformat(value)
                if isinstance(value, str) else value
            )
            return _st.pack("<i", (d - datetime.date(1970, 1, 1)).days)
    except (ValueError, TypeError):
        return None
    return None  # unencoded types simply omit their bounds


def _decode_bound(raw: bytes, dt: T.DataType):
    import struct as _st

    name = dt.typeName()
    if name in ("integer", "short", "byte"):
        return _st.unpack("<i", raw)[0]
    if name == "long":
        return _st.unpack("<q", raw)[0]
    if name == "float":
        return _st.unpack("<f", raw)[0]
    if name == "double":
        return _st.unpack("<d", raw)[0]
    if name == "boolean":
        return raw == b"\x01"
    if name == "string":
        return raw.decode("utf-8")
    if name == "date":
        import datetime

        return datetime.date(1970, 1, 1) + datetime.timedelta(
            days=_st.unpack("<i", raw)[0]
        )
    return None

_STATUS_EXISTING, _STATUS_ADDED, _STATUS_DELETED = 0, 1, 2


def _write_position_delete_manifest(
    spark, table_path: Path, dest: Path, location: str, meta_dir: Path,
    spark_schema: T.StructType, mapping: dict[str, str], predicate: str,
    targets_rel: list[str], mapped_rel, snap_id: int, seq: int,
) -> dict:
    """Materialize one merge-on-read tombstone as a native Iceberg v2
    position-delete file: scan the then-live target files (distributed, one
    scan), collect (exported data-file URI, row ordinal) for rows matching
    the predicate, write them as a sorted parquet delete file + a content=1
    delete manifest. Returns the del_reg record ({"ml_row", "targets"});
    ml_row is None when the predicate matched no rows."""
    import pyarrow.parquet as _pq

    phys = {f.name: mapping.get(f.name, f.name) for f in spark_schema.fields}
    phys_schema = T.StructType(
        [T.StructField(phys[f.name], f.dataType, f.nullable)
         for f in spark_schema.fields]
    )
    abs_map = {
        str((table_path / rel).resolve()): f"{location}/{mapped_rel(rel)}"
        for rel in targets_rel
    }
    hits = (
        spark.read.schema(phys_schema).parquet(*abs_map)
        .select(
            fs_path_col().alias("__fp"),
            F.col("_metadata.row_index").alias("pos"),
            *[F.col(phys[f.name]).alias(f.name) for f in spark_schema.fields],
        )
        .where(F.expr(predicate))
        .select("__fp", "pos")
    )
    uri_map = spark.createDataFrame(
        list(abs_map.items()), "__fp string, file_path string"
    )
    rows = (
        hits.join(F.broadcast(uri_map), "__fp")
        .select("file_path", "pos")
        .repartition(1)
        .sortWithinPartitions("file_path", "pos")
    )
    name = f"pos-delete-{uuid.uuid4().hex}.parquet"
    (dest / "data").mkdir(parents=True, exist_ok=True)
    tmp = dest / "data" / f".tmp-{name}"
    rows.write.parquet(str(tmp))
    part = next(tmp.glob("part-*.parquet"))
    final = dest / "data" / name
    os.replace(part, final)
    shutil.rmtree(tmp)
    n_rows = _pq.ParquetFile(final).metadata.num_rows
    if n_rows == 0:
        final.unlink()
        return {"ml_row": None, "targets": set(), "dfile": None}
    _attach_delete_field_ids(final)
    dfile = {
        "file_path": f"{location}/data/{name}",
        "record_count": n_rows,
        "file_size_in_bytes": final.stat().st_size,
    }
    out = _emit_position_delete_manifest(meta_dir, location, dfile, snap_id, seq)
    out["targets"] = set(targets_rel)
    return out


def _attach_delete_field_ids(final: Path) -> None:
    """Rewrite a Spark-written position-delete parquet in place, attaching
    the Iceberg RESERVED field ids the v2 spec assigns to delete-file
    columns (file_path=2147483546, pos=2147483545). Spec-strict external
    readers (Spark-Iceberg, pyiceberg) resolve delete-file columns by
    parquet field id, not by name — without the ids they may silently skip
    the deletes, resurrecting rows. Streamed row-group-at-a-time, so driver
    memory stays bounded by one row group regardless of delete count."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    src = _pq.ParquetFile(final)
    schema = pa.schema(
        [
            src.schema_arrow.field("file_path").with_metadata(
                {b"PARQUET:field_id": b"2147483546"}
            ),
            src.schema_arrow.field("pos").with_metadata(
                {b"PARQUET:field_id": b"2147483545"}
            ),
        ]
    )
    tmp = final.with_name(final.name + ".fid")
    with _pq.ParquetWriter(tmp, schema) as w:
        for batch in src.iter_batches():
            w.write_batch(pa.RecordBatch.from_arrays(
                [batch.column("file_path"), batch.column("pos")], schema=schema
            ))
    src.close()
    os.replace(tmp, final)


def _emit_position_delete_manifest(
    meta_dir: Path, location: str, dfile: dict, snap_id: int, seq: int
) -> dict:
    """Write the content=1 delete manifest + manifest-list row for one
    position-delete parquet at the given snapshot/sequence. Split out from
    the scan so a RESTORE can RELIST an existing delete file at a NEW
    sequence number (position deletes only apply to data files with
    sequence number <= the delete's, and restored data files re-enter at
    the restore snapshot's sequence)."""
    n_rows = dfile["record_count"]
    entry = {
        "status": _STATUS_ADDED,
        "snapshot_id": snap_id,
        "sequence_number": seq,
        "file_sequence_number": seq,
        "data_file": {
            "content": 1,  # position deletes
            "file_path": dfile["file_path"],
            "file_format": "PARQUET",
            "partition": {},
            "record_count": n_rows,
            "file_size_in_bytes": dfile["file_size_in_bytes"],
            "lower_bounds": None,
            "upper_bounds": None,
            "equality_ids": None,
        },
    }
    data = write_ocf_bytes_with_meta(
        [entry], _MANIFEST_ENTRY_SCHEMA,
        {
            "partition-spec": "[]",
            "partition-spec-id": "0",
            "format-version": str(FORMAT_VERSION),
            "content": "deletes",
        },
    )
    mname = f"{uuid.uuid4()}-d0.avro"
    (meta_dir / mname).write_bytes(data)
    return {
        "ml_row": {
            "manifest_path": f"{location}/metadata/{mname}",
            "manifest_length": len(data),
            "partition_spec_id": 0,
            "content": 1,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snap_id,
            "added_files_count": 1,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": n_rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        },
        "dfile": dict(dfile),
    }


# --------------------------------------------------------------------------- #
# export
# --------------------------------------------------------------------------- #
def export_iceberg_metadata(
    table, dest: str | Path, mode: str = "error"
) -> Path:
    """Export a LakeTable as a standalone Iceberg v2 table at ``dest``
    (hadoop-catalog layout). One ``v<N>.metadata.json`` per LakeTable
    version; every data-changing commit becomes a snapshot with its own
    manifest list + manifest, so snapshot time travel matches LakeTable
    version time travel 1:1. Data files are hard-linked, never rewritten.
    Merge-on-read predicate tombstones export as NATIVE v2 position-delete
    files (spec "Position Delete Files"): per tombstone commit, one
    (file_path, pos) parquet + a content=1 delete manifest listed while the
    tombstone is active — no materialize_tombstones() required.

    Refusals mirror `export_delta_log`: truncated history, vacuumed
    (missing) historical files, and physical-name resurrection in
    pre-fresh-minting logs all fail loudly BEFORE anything is written."""
    dest = Path(dest)
    meta_dir = dest / "metadata"
    state = table.state()
    versions = txlog.list_versions(table.path)
    if versions != list(range(len(versions))):
        raise IcebergExportError(
            "log history is truncated (cleanup_log); full-history export "
            f"needs contiguous commits from 0, have {versions}"
        )
    commits = [txlog.read_commit(table.path, v) for v in versions]
    # predicate tombstones (merge-on-read deletes) export as NATIVE Iceberg
    # v2 position-delete files — (file_path, pos) parquet + a content=1
    # delete manifest per tombstone commit — which the reader and external
    # clients already consume; no materialize_tombstones() required.

    # ---- prescan: every referenced file must still exist (vacuum guard) ----
    # shallow-clone references resolve OUTSIDE the table root; re-home them
    # under data/ext-* exactly like export_delta_log
    path_map: dict[str, str] = {}

    def mapped_rel(rel: str) -> str:
        if rel not in path_map:
            if rel.startswith("..") or Path(rel).is_absolute():
                path_map[rel] = f"data/ext-{len(path_map):04d}-{Path(rel).name}"
            else:
                path_map[rel] = rel
        return path_map[rel]

    for c in commits:
        for rel in list(c.get("remove", [])) + [a["path"] for a in c.get("add", [])]:
            mapped_rel(rel)
    missing = sorted(
        rel for rel in path_map if not (table.path / rel).resolve().exists()
    )
    if missing:
        raise IcebergExportError(
            f"{len(missing)} historical data file(s) no longer exist (first: "
            f"{missing[0]!r}) — the table was vacuumed; export a CLONE instead"
        )

    if meta_dir.exists():
        if mode == "error":
            raise FileExistsError(f"iceberg table already exists: {dest}")
        if mode == "overwrite":
            shutil.rmtree(dest)
    meta_dir.mkdir(parents=True, exist_ok=True)

    table_uuid = str(uuid.uuid4())
    location = str(dest.resolve())

    # stable field ids keyed by PHYSICAL structural path (rename keeps the
    # id; drop->re-add arrives with a fresh-minted physical name, so it
    # naturally allocates a fresh id — same invariant delta_log.py enforces)
    path_ids: dict[str, int] = {}

    def alloc_for(phys_top: dict[str, str]):
        def alloc(path: str) -> int:
            head, _, rest = path.partition(".")
            key = phys_top.get(head, head) + ("." + rest if rest else "")
            if key not in path_ids:
                path_ids[key] = len(path_ids) + 1
            return path_ids[key]

        return alloc

    running_schema: str | None = None
    running_mapping: dict[str, str] = {}
    running_properties: dict[str, str] = {}
    running_partition_by: list[str] = []
    ever_phys: set[str] = set()
    prev_active: set[str] = set()

    live: dict[str, dict] = {}  # rel path -> LakeTable add action
    # manifest registry for reuse: {"ml_row": manifest-list row,
    #  "live": {rel: {"add": action, "snap": id, "seq": n}}, "drop_after": bool}
    manifests: list[dict] = []
    # merge-on-read tombstones → native v2 position deletes:
    add_version: dict[str, int] = {}  # rel -> version that added the file
    active_tombs: list[dict] = []  # replayed like LakeTable state
    # (predicate, version) -> {"ml_row", "targets": set[rel]}; a delete
    # manifest is listed while its tombstone is active AND ≥1 target lives
    del_reg: dict[tuple, dict] = {}
    snapshots: list[dict] = []
    snapshot_log: list[dict] = []
    metadata_log: list[dict] = []
    schemas: list[dict] = []
    schema_ids_by_json: dict[str, int] = {}
    seq = 0
    created_ms = commits[0]["timestamp_ms"]

    for c in commits:
        v, ts = c["version"], c["timestamp_ms"]
        if c.get("schema"):
            running_schema = c["schema"]
        if c.get("column_mapping") is not None:
            running_mapping = dict(c["column_mapping"])
        if c.get("properties") is not None:
            running_properties = dict(c["properties"])
        if c.get("partition_by") is not None:
            running_partition_by = c["partition_by"]

        # physical-name resurrection guard (legacy logs), as in delta_log.py
        spark_schema = (
            T.StructType.fromJson(json.loads(running_schema))
            if running_schema
            else T.StructType([])
        )
        active = [running_mapping.get(f.name, f.name) for f in spark_schema.fields]
        returned = sorted(p for p in active if p in ever_phys and p not in prev_active)
        if returned:
            raise IcebergExportError(
                f"version {v}: physical column name(s) {returned} were dropped "
                "and later re-added without a fresh physical name; no field-id "
                "assignment is correct for all files — deep-CLONE first"
            )
        ever_phys.update(active)
        prev_active = set(active)

        # ---- schema entry (id'd by content) ----
        phys_top = {f.name: running_mapping.get(f.name, f.name) for f in spark_schema.fields}
        ice_struct = _spark_type_to_iceberg(spark_schema, alloc_for(phys_top))
        stats_ctx = {
            phys_top[f.name]: (path_ids[phys_top[f.name]], f.dataType)
            for f in spark_schema.fields
        }
        ice_schema_json = json.dumps(ice_struct, sort_keys=True)
        if ice_schema_json not in schema_ids_by_json:
            sid = len(schemas)
            schema_ids_by_json[ice_schema_json] = sid
            schemas.append({"schema-id": sid, **ice_struct})
        current_schema_id = schema_ids_by_json[ice_schema_json]

        # ---- data change -> snapshot (manifest REUSE, like real Iceberg:
        # a commit writes one manifest for its added files and rewrites
        # ONLY the manifests a delete touched; untouched manifests are
        # referenced as-is by the new manifest list, so per-snapshot
        # metadata work is O(changed files), not O(table files)) ----
        adds = c.get("add", [])
        removes = c.get("remove", [])
        # tombstone replay (exact txlog semantics)
        prev_tomb_keys = {(t["predicate"], t["version"]) for t in active_tombs}
        if c.get("tombstone"):
            active_tombs.append({"predicate": c["tombstone"], "version": v})
        if c.get("clear_tombstones"):
            active_tombs = []
        if c.get("set_tombstones") is not None:
            active_tombs = [dict(t) for t in c["set_tombstones"]]
        tomb_keys = {(t["predicate"], t["version"]) for t in active_tombs}
        tomb_changed = tomb_keys != prev_tomb_keys
        for a in adds:
            # RESTORE/CLONE re-add files under their ORIGINAL add version
            # (log.py:302 semantics — tombstones only apply to files that
            # predate them); a plain append's add version is this commit.
            add_version[a["path"]] = int(a.get("add_version", v))
        if adds or removes or tomb_changed or v == 0:
            seq += 1
            snap_id = v + 1  # deterministic, unique, time-travel friendly
            r_set = set(removes)
            removed_entries: list[tuple[str, dict]] = []
            next_manifests: list[dict] = []
            for m in manifests:
                hit = {rel for rel in m["live"] if rel in r_set}
                if not hit:
                    next_manifests.append(m)  # referenced as-is, no rewrite
                    continue
                for rel in sorted(hit):
                    removed_entries.append((rel, m["live"][rel]))
                survivors = {
                    rel: e for rel, e in m["live"].items() if rel not in hit
                }
                entries = [
                    _manifest_entry(
                        _STATUS_EXISTING, e["snap"], e["seq"], location,
                        mapped_rel(rel), e["add"], stats_ctx,
                    )
                    for rel, e in sorted(survivors.items())
                ] + [
                    _manifest_entry(
                        _STATUS_DELETED, snap_id, seq, location,
                        mapped_rel(rel), m["live"][rel]["add"], stats_ctx,
                    )
                    for rel in sorted(hit)
                ]
                rewritten = _write_manifest(
                    meta_dir, entries, ice_schema_json, snap_id, seq
                )
                rewritten["live"] = survivors
                # an all-deleted rewrite is listed THIS snapshot (to carry
                # the delete entries) and dropped from later lists
                rewritten["drop_after"] = not survivors
                next_manifests.append(rewritten)
            if adds:
                new_live = {
                    a["path"]: {"add": a, "snap": snap_id, "seq": seq}
                    for a in adds
                }
                entries = [
                    _manifest_entry(
                        _STATUS_ADDED, snap_id, seq, location,
                        mapped_rel(rel), e["add"], stats_ctx,
                    )
                    for rel, e in sorted(new_live.items())
                ]
                created = _write_manifest(
                    meta_dir, entries, ice_schema_json, snap_id, seq
                )
                created["live"] = new_live
                created["drop_after"] = False
                next_manifests.append(created)
            manifests = next_manifests
            live = {
                rel: e["add"] for m in manifests for rel, e in m["live"].items()
            }
            # ---- tombstones → v2 position-delete manifests ----
            for key in list(del_reg):
                if key not in tomb_keys:
                    del del_reg[key]  # cleared / restored-away tombstone
            readded = {a["path"] for a in adds}
            for t in active_tombs:
                key = (t["predicate"], t["version"])
                # the FULL eligible set (never shrunk in the registry —
                # targets that die and are later RESTOREd must re-apply)
                eligible = {
                    rel for rel in live
                    if add_version.get(rel, 0) < t["version"]
                }
                rec = del_reg.get(key)
                if rec is None or (eligible - rec["targets"]):
                    # first sight, or RESTORE/CLONE surfaced pre-tombstone
                    # files the existing delete file never scanned: rescan
                    # the full eligible set at THIS snapshot's sequence
                    new = (
                        _write_position_delete_manifest(
                            table.spark, table.path, dest, location,
                            meta_dir, spark_schema, running_mapping,
                            t["predicate"], sorted(eligible), mapped_rel,
                            snap_id, seq,
                        )
                        if eligible
                        else {"ml_row": None, "targets": set(), "dfile": None}
                    )
                    # remember the full EVALUATED set even when the
                    # predicate matched no rows, so re-adds of already-
                    # evaluated files don't trigger useless rescans
                    new["targets"] = set(eligible)
                    del_reg[key] = new
                elif rec.get("dfile") and (eligible & readded):
                    # a previously-evaluated target was RESTOREd after all
                    # its peers were removed (or alongside them): the
                    # delete parquet still covers it byte-for-byte, but
                    # spec-strict readers only apply a position delete to
                    # data files with sequence number <= the delete's, and
                    # the restored file re-enters at THIS sequence — relist
                    # the SAME delete file at the new sequence number.
                    del_reg[key] = {
                        **rec,
                        **_emit_position_delete_manifest(
                            meta_dir, location, rec["dfile"], snap_id, seq
                        ),
                    }
            ml_rows = [m["ml_row"] for m in manifests] + [
                e["ml_row"] for e in del_reg.values()
                if e["ml_row"] is not None and (e["targets"] & set(live))
            ]
            ml_name = f"snap-{snap_id}-1-{uuid.uuid4()}.avro"
            (meta_dir / ml_name).write_bytes(
                write_ocf_bytes_with_meta(
                    ml_rows,
                    _MANIFEST_LIST_SCHEMA,
                    {
                        "format-version": str(FORMAT_VERSION),
                        "snapshot-id": str(snap_id),
                        "sequence-number": str(seq),
                    },
                )
            )
            manifests = [m for m in manifests if not m["drop_after"]]
            n_added = len(adds)
            n_deleted = len(removed_entries)
            n_existing = len(live) - n_added
            op = (
                "delete" if ((removes or tomb_changed) and not adds)
                else "overwrite" if (removes and adds)
                else "append"
            )
            snapshots.append(
                {
                    "snapshot-id": snap_id,
                    **(
                        {"parent-snapshot-id": snapshots[-1]["snapshot-id"]}
                        if snapshots else {}
                    ),
                    "sequence-number": seq,
                    "timestamp-ms": ts,
                    "manifest-list": f"{location}/metadata/{ml_name}",
                    "summary": {
                        "operation": op,
                        "added-data-files": str(n_added),
                        "deleted-data-files": str(n_deleted),
                        "total-data-files": str(n_added + n_existing),
                        "lakehouses-operation": c["operation"],
                    },
                    "schema-id": current_schema_id,
                }
            )
            snapshot_log.append({"timestamp-ms": ts, "snapshot-id": snap_id})

        # ---- metadata file for THIS version ----
        name_mapping = [
            {"field-id": path_ids[phys_top[f.name]], "names": [phys_top[f.name]]}
            for f in spark_schema.fields
        ]
        meta = {
            "format-version": FORMAT_VERSION,
            "table-uuid": table_uuid,
            "location": location,
            "last-sequence-number": seq,
            "last-updated-ms": ts,
            "last-column-id": len(path_ids),
            "current-schema-id": current_schema_id,
            "schemas": list(schemas),
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "last-partition-id": 999,
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {
                **running_properties,
                "schema.name-mapping.default": json.dumps(name_mapping),
                **(
                    {"lakehouses.clusterBy": json.dumps(running_partition_by)}
                    if running_partition_by else {}
                ),
                "created-ms": str(created_ms),
            },
            **(
                {"current-snapshot-id": snapshots[-1]["snapshot-id"]}
                if snapshots else {"current-snapshot-id": -1}
            ),
            "refs": (
                {"main": {"snapshot-id": snapshots[-1]["snapshot-id"],
                          "type": "branch"}}
                if snapshots else {}
            ),
            "snapshots": list(snapshots),
            "snapshot-log": list(snapshot_log),
            "metadata-log": list(metadata_log),
        }
        meta_file = f"v{v + 1}.metadata.json"
        (meta_dir / meta_file).write_text(json.dumps(meta, indent=2))
        metadata_log.append(
            {"timestamp-ms": ts, "metadata-file": f"{location}/metadata/{meta_file}"}
        )

    # ---- data files: hard-link everything any commit referenced ----
    for rel, out_rel in path_map.items():
        src = (table.path / rel).resolve()
        tgt = dest / out_rel
        tgt.parent.mkdir(parents=True, exist_ok=True)
        if tgt.exists():
            continue
        try:
            os.link(src, tgt)
        except OSError:
            shutil.copy2(src, tgt)

    (meta_dir / "version-hint.text").write_text(str(len(commits)))
    return dest


def write_ocf_bytes_with_meta(rows: list, schema: dict, extra_meta: dict) -> bytes:
    """OCF with extra key-value metadata (Iceberg stores the table schema and
    partition spec in the manifest header). Splices the metadata map into the
    header the in-repo codec wrote — keeps avro_py's public API unchanged."""
    import io as _io

    from lakehouses_spark.functions import avro_py as _a

    buf = _io.BytesIO()
    buf.write(b"Obj\x01")
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
    meta.update({k: v.encode() for k, v in extra_meta.items()})
    _a._encode(buf, _a._OCF_META_SCHEMA, meta)
    sync = os.urandom(16)
    buf.write(sync)
    body = _io.BytesIO()
    for r in rows:
        _a._encode(body, schema, r)
    _a._write_long(buf, len(rows))
    _a._write_long(buf, len(body.getvalue()))
    buf.write(body.getvalue())
    buf.write(sync)
    return buf.getvalue()


def _write_manifest(
    meta_dir: Path, entries: list[dict], ice_schema_json: str,
    snap_id: int, seq: int, pctx: dict | None = None,
    content: int = 0,
) -> dict:
    """Write one manifest Avro file; return its registry record with the
    manifest-list row (counts by entry status, min sequence number).
    With ``pctx`` (an identity partition-write context) the entry
    schema's r102 partition record carries one TYPED field per spec
    field and the header declares the real spec — so a partitioned
    foreign table's commits stay readable by other engines."""
    import copy

    entry_schema = _MANIFEST_ENTRY_SCHEMA
    spec_json, spec_id = "[]", 0
    if pctx:
        entry_schema = copy.deepcopy(_MANIFEST_ENTRY_SCHEMA)
        for f in entry_schema["fields"]:
            if f["name"] == "data_file":
                for g in f["type"]["fields"]:
                    if g["name"] == "partition":
                        g["type"]["fields"] = [
                            {"name": pf["pname"],
                             "type": ["null", pf["avro"]],
                             "field-id": pf["field_id"]}
                            for pf in pctx["fields"]
                        ]
        spec_json, spec_id = pctx["spec_json"], pctx["spec_id"]
    name = f"{uuid.uuid4()}-m0.avro"
    data = write_ocf_bytes_with_meta(
        entries,
        entry_schema,
        {
            "schema": ice_schema_json,
            "partition-spec": spec_json,
            "partition-spec-id": str(spec_id),
            "format-version": str(FORMAT_VERSION),
            "content": "deletes" if content == 1 else "data",
        },
    )
    (meta_dir / name).write_bytes(data)

    def _n(status):
        return sum(1 for e in entries if e["status"] == status)

    def _rows(status):
        return sum(
            e["data_file"]["record_count"] for e in entries
            if e["status"] == status
        )

    location = str(meta_dir.parent.resolve())
    return {
        "ml_row": {
            "manifest_path": f"{location}/metadata/{name}",
            "manifest_length": len(data),
            "partition_spec_id": spec_id,
            "content": content,
            "sequence_number": seq,
            "min_sequence_number": min(
                (e["sequence_number"] for e in entries if e["sequence_number"]),
                default=seq,
            ),
            "added_snapshot_id": snap_id,
            "added_files_count": _n(_STATUS_ADDED),
            "existing_files_count": _n(_STATUS_EXISTING),
            "deleted_files_count": _n(_STATUS_DELETED),
            "added_rows_count": _rows(_STATUS_ADDED),
            "existing_rows_count": _rows(_STATUS_EXISTING),
            "deleted_rows_count": _rows(_STATUS_DELETED),
        },
    }


def _manifest_entry(
    status: int, snap_id: int, seq: int, location: str, rel: str, add: dict,
    stats_ctx: dict[str, tuple[int, T.DataType]] | None = None,
) -> dict:
    lower: list[dict] = []
    upper: list[dict] = []
    for phys, s in sorted((add.get("stats") or {}).items()):
        fid_dt = (stats_ctx or {}).get(phys)
        if fid_dt is None:
            continue
        fid, dt = fid_dt
        lo = _encode_bound(s.get("min"), dt)
        hi = _encode_bound(s.get("max"), dt)
        if lo is not None:
            lower.append({"key": fid, "value": lo})
        if hi is not None:
            upper.append({"key": fid, "value": hi})
    return {
        "status": status,
        "snapshot_id": snap_id,
        "sequence_number": seq,
        "file_sequence_number": seq,
        "data_file": {
            "content": _DATA_CONTENT,
            "file_path": f"{location}/{rel}",
            "file_format": "PARQUET",
            "partition": {},
            "record_count": add.get("num_records") or 0,
            "file_size_in_bytes": add.get("size_bytes") or 0,
            "lower_bounds": lower or None,
            "upper_bounds": upper or None,
            "equality_ids": None,
        },
    }


# --------------------------------------------------------------------------- #
# reader
# --------------------------------------------------------------------------- #
def write_iceberg_table(
    spark: SparkSession,
    df: DataFrame,
    path: str | Path,
    partition_by: list[str] | None = None,
    properties: dict[str, str] | None = None,
    sort_by: list[str] | None = None,
) -> "IcebergMetadataReader":
    """CTAS for Iceberg v2 WITHOUT a LakeTable — the `CREATE TABLE ...
    USING iceberg PARTITIONED BY (...) AS SELECT` surface
    (03.iceberg_primer.py:114-124): bootstrap the metadata layer (schema
    with stable field ids, name-mapping property, IDENTITY partition
    spec) at ``path``, then commit the initial `append` snapshot through
    the same plumbing the external DML uses — typed partition records in
    the manifest, one data-file group per partition tuple, data files
    keeping every column. Refuses an existing table and non-identity-
    encodable partition sources.

    100 TB shape: one distributed partition-grouped write; driver cost is
    O(files) manifest entries."""
    import time as _time

    path = Path(path)
    meta_dir = path / "metadata"
    if meta_dir.exists() and any(meta_dir.iterdir()):
        raise IcebergFormatError(
            f"an Iceberg table already exists at {path}")
    part = parse_partition_by(
        partition_by, {c: df.schema[c].dataType for c in df.columns})
    meta_dir.mkdir(parents=True, exist_ok=True)
    location = str(path.resolve())
    path_ids: dict[str, int] = {}

    def alloc(p: str) -> int:
        if p not in path_ids:
            path_ids[p] = len(path_ids) + 1
        return path_ids[p]

    ice_struct = _spark_type_to_iceberg(df.schema, alloc)
    ice_schema = {"schema-id": 0, **ice_struct}
    top_id = {f["name"]: f["id"] for f in ice_schema["fields"]}
    spec_fields = [
        {"name": spec_field_name(tr, c),
         "transform": tr, "source-id": top_id[c], "field-id": 1000 + i}
        for i, (tr, c) in enumerate(part)
    ]
    # WRITE ORDERED BY: each entry is `col [ASC|DESC] [NULLS FIRST|LAST]`
    # over an identity transform — declared in the metadata AND applied
    # to every data write (file-local clustering; tighter bounds)
    sort_fields: list[dict] = []
    for ent in sort_by or []:
        parts = ent.split()
        c = parts[0]
        if c not in top_id:
            raise ValueError(f"sort_by column {c!r} not in DataFrame")
        rest = " ".join(p.upper() for p in parts[1:])
        desc = "DESC" in rest
        nf = "NULLS LAST" not in rest if not desc else "NULLS FIRST" in rest
        sort_fields.append({
            "transform": "identity", "source-id": top_id[c],
            "direction": "desc" if desc else "asc",
            "null-order": "nulls-first" if nf else "nulls-last",
        })
    now_ms = int(_time.time() * 1000)
    name_mapping = [
        {"field-id": f["id"], "names": [f["name"]]}
        for f in ice_schema["fields"]
    ]
    meta = {
        "format-version": FORMAT_VERSION,
        "table-uuid": str(uuid.uuid4()),
        "location": location,
        "last-sequence-number": 0,
        "last-updated-ms": now_ms,
        "last-column-id": len(path_ids),
        "current-schema-id": 0,
        "schemas": [ice_schema],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "last-partition-id": 999 + len(spec_fields),
        "default-sort-order-id": 1 if sort_by else 0,
        "sort-orders": (
            [{"order-id": 0, "fields": []}]
            + ([{"order-id": 1, "fields": sort_fields}] if sort_by else [])
        ),
        "properties": {
            **(properties or {}),
            "schema.name-mapping.default": json.dumps(name_mapping),
            "created-ms": str(now_ms),
        },
        "current-snapshot-id": -1,
        "refs": {},
        "snapshots": [],
        "snapshot-log": [],
        "metadata-log": [],
    }
    (meta_dir / "v1.metadata.json").write_text(json.dumps(meta, indent=2))
    (meta_dir / "version-hint.text").write_text("1")
    r = IcebergMetadataReader(spark, path)
    r.append(df)
    return IcebergMetadataReader(spark, path)


class IcebergMetadataReader:
    """Independent Iceberg v1/v2 metadata reader: stdlib JSON + pure-Python
    Avro OCF. Resolves current metadata via version-hint.text (hadoop
    catalog) or the highest v*.metadata.json."""

    def __init__(self, spark: SparkSession, path: str | Path):
        self.spark = spark
        self.path = Path(path)
        self.meta_dir = self.path / "metadata"
        if not self.meta_dir.is_dir():
            raise FileNotFoundError(f"not an iceberg table (no metadata/): {path}")
        self.meta = json.loads(self._current_metadata_file().read_text())
        if self.meta.get("format-version") not in (1, 2):
            raise IcebergFormatError(
                f"unsupported format-version {self.meta.get('format-version')}"
            )

    def _current_metadata_file(self) -> Path:
        hint = self.meta_dir / "version-hint.text"
        if hint.exists():
            v = hint.read_text().strip()
            cand = self.meta_dir / f"v{v}.metadata.json"
            if cand.exists():
                return cand
        files = sorted(
            self.meta_dir.glob("v*.metadata.json"),
            key=lambda p: int(p.name.split(".")[0][1:]),
        )
        if not files:
            raise FileNotFoundError(f"no v*.metadata.json under {self.meta_dir}")
        return files[-1]

    # -- snapshot resolution --------------------------------------------- #
    def _snapshot(self, snapshot_id: int | None = None) -> dict | None:
        snaps = self.meta.get("snapshots") or []
        if snapshot_id is None:
            cur = self.meta.get("current-snapshot-id", -1)
            if cur == -1:
                return None
            snapshot_id = cur
        for s in snaps:
            if s["snapshot-id"] == snapshot_id:
                return s
        raise IcebergFormatError(f"snapshot {snapshot_id} not found")

    def _local(self, uri: str) -> Path:
        # manifests record absolute table-location URIs; re-root them so a
        # moved/copied table directory stays readable
        marker = "/metadata/"
        if marker in uri:
            tail = uri.rsplit(marker, 1)[1]
            cand = self.meta_dir / tail
            if cand.exists():
                return cand
        loc = self.meta["location"].rstrip("/")
        if uri.startswith(loc):
            return self.path / uri[len(loc):].lstrip("/")
        return Path(uri)

    @staticmethod
    def _inherit_seq(entry: dict, ml_seq: int) -> dict:
        """Sequence-number inheritance (spec "Sequence Number Inheritance";
        ADVICE r12): a v2 manifest entry with status ADDED (1) may leave
        `sequence_number` / `file_sequence_number` null — the reader must
        substitute the manifest-list row's `sequence_number`. Foreign
        Spark/Iceberg writers rely on this routinely; without resolving it
        here, (a) `plan_files` coerced null to 0, making every equality
        delete apply to those files (over-deleting rows), and (b)
        append()/merge()/rewrite relisted the entries as EXISTING with
        null sequence numbers — spec-invalid, and real readers would
        inherit the NEW snapshot's higher sequence number, aging the
        files forward past older equality deletes."""
        if entry.get("status") == 1:
            if entry.get("sequence_number") is None:
                entry["sequence_number"] = ml_seq
            if entry.get("file_sequence_number") is None:
                entry["file_sequence_number"] = ml_seq
        return entry

    def _manifest_rows(self, snapshot: dict) -> tuple[list[dict], list[dict]]:
        """(data entries, delete entries) for a snapshot — manifest-list
        `content` routes each manifest (0 = data, 1 = row-level deletes);
        ADDED entries with null sequence numbers resolve inheritance from
        the manifest-list row before anything plans with them.
        Past DISTRIBUTED_MANIFEST_THRESHOLD manifests, the per-manifest OCF
        decode fans out to EXECUTORS (one task per manifest) instead of a
        sequential driver-side walk — at 100×-scale (thousands of manifests
        × thousands of entries) the decode parallelizes across the cluster
        while the driver only receives the decoded entries it must plan
        with anyway."""
        _, ml_rows = read_ocf_bytes(self._local(snapshot["manifest-list"]).read_bytes())
        if len(ml_rows) > DISTRIBUTED_MANIFEST_THRESHOLD:
            jobs = {
                str(self._local(m["manifest_path"])):
                    (int(m.get("content", 0) or 0),
                     int(m.get("sequence_number") or 0),
                     int(m.get("partition_spec_id", 0) or 0))
                for m in ml_rows
            }
            decoded = self._decode_manifests_distributed(jobs)
            if decoded is not None:
                return (
                    [{**self._inherit_seq(r, s), "__spec_id": sid}
                     for (c, s, sid), r in decoded if c != 1],
                    [{**self._inherit_seq(r, s), "__spec_id": sid}
                     for (c, s, sid), r in decoded if c == 1],
                )
            # else: by-value shipping unavailable — sequential fallback
        data_entries: list[dict] = []
        delete_entries: list[dict] = []
        for m in ml_rows:
            _, rows = read_ocf_bytes(self._local(m["manifest_path"]).read_bytes())
            ml_seq = int(m.get("sequence_number") or 0)
            sid = int(m.get("partition_spec_id", 0) or 0)
            # the entry remembers its manifest's partition spec so a
            # relisting commit can keep it under a SAME-SPEC manifest
            # (a manifest has exactly one spec; mixing breaks readers)
            rows = [{**self._inherit_seq(r, ml_seq), "__spec_id": sid}
                    for r in rows]
            (delete_entries if m.get("content", 0) == 1 else data_entries).extend(rows)
        return data_entries, delete_entries

    def _decode_manifests_distributed(
        self, jobs: dict[str, tuple]
    ) -> list[tuple[tuple, dict]] | None:
        """Fan the per-manifest OCF decode out to executors — valid on a
        REAL multi-node cluster, not just local mode, which needs two
        things the naive closure gets wrong: (1) manifest bytes are read
        via ``sc.binaryFiles`` (Hadoop FileSystem — any scheme the cluster
        reads: s3a/abfss/hdfs/file), not a driver-local ``open()`` on the
        executor; (2) the OCF decoder ships BY VALUE (cloudpickle module
        registration, same pattern as stream_source.py:201) so executors
        don't need lakehouses_spark on their PYTHONPATH. Returns None when
        by-value registration is unavailable — the caller falls back to
        the sequential driver-side walk."""
        try:
            from pyspark import cloudpickle

            from lakehouses_spark.functions import avro_py as _avro_mod

            cloudpickle.register_pickle_by_value(_avro_mod)
        except Exception:
            return None
        from urllib.parse import unquote, urlparse

        from lakehouses_spark.functions.avro_py import read_ocf_bytes as _decode

        content_by_name = {Path(p).name: c for p, c in jobs.items()}
        if len(content_by_name) != len(jobs):  # uuid names never collide
            return None

        def _per_file(kv):
            uri, payload = kv
            name = unquote(urlparse(uri).path).rsplit("/", 1)[-1]
            _, rows = _decode(bytes(payload))
            return [(name, r) for r in rows]

        decoded = (
            self.spark.sparkContext
            .binaryFiles(",".join(jobs), minPartitions=min(len(jobs), 64))
            .flatMap(_per_file)
            .collect()
        )
        return [(content_by_name[n], r) for n, r in decoded]

    def _live_data_entries(self, snapshot_id: int | None = None) -> list[dict]:
        snap = self._snapshot(snapshot_id)
        if snap is None:
            return []
        out = []
        for e in self._manifest_rows(snap)[0]:
            if e["status"] == _STATUS_DELETED:
                continue
            if e["data_file"].get("content", 0) != _DATA_CONTENT:
                raise IcebergFormatError(
                    "delete files inside a DATA manifest are malformed "
                    f"(content={e['data_file'].get('content')})"
                )
            out.append(e)
        return out

    def live_files(self, snapshot_id: int | None = None) -> list[dict]:
        return [e["data_file"] for e in self._live_data_entries(snapshot_id)]

    def _live_delete_entries(self, snapshot_id: int | None = None) -> list[dict]:
        snap = self._snapshot(snapshot_id)
        if snap is None:
            return []
        out = []
        for e in self._manifest_rows(snap)[1]:
            if e["status"] == _STATUS_DELETED:
                continue
            if e["data_file"].get("content", 0) not in (1, 2):
                raise IcebergFormatError(
                    f"data file (content={e['data_file'].get('content')}) "
                    "inside a DELETE manifest is malformed"
                )
            out.append(e)
        return out

    def position_delete_files(self, snapshot_id: int | None = None) -> list[dict]:
        """Live POSITION-delete files (v2 row-level deletes, spec
        "Position Delete Files": parquet rows of (file_path, pos) naming
        deleted row ordinals in specific data files)."""
        return [
            e["data_file"]
            for e in self._live_delete_entries(snapshot_id)
            if e["data_file"].get("content", 0) == 1
        ]

    def equality_delete_entries(self, snapshot_id: int | None = None) -> list[dict]:
        """Live EQUALITY-delete entries (spec "Equality Delete Files"):
        each carries the delete file plus its sequence number — an equality
        delete applies only to data files with a STRICTLY SMALLER data
        sequence number (rows written after the delete survive)."""
        return [
            e for e in self._live_delete_entries(snapshot_id)
            if e["data_file"].get("content", 0) == 2
        ]

    def schema(self, schema_id: int | None = None) -> T.StructType:
        schemas = self.meta.get("schemas") or []
        sid = self.meta["current-schema-id"] if schema_id is None else schema_id
        for s in schemas:
            if s["schema-id"] == sid:
                return _iceberg_type_to_spark({k: v for k, v in s.items()
                                               if k != "schema-id"})
        raise IcebergFormatError(f"schema-id {sid} not found")

    def name_mapping(self) -> dict[int, str]:
        """field-id -> first mapped file column name, from the spec's
        schema.name-mapping.default property (files without parquet field
        ids — exactly what this exporter writes)."""
        raw = (self.meta.get("properties") or {}).get("schema.name-mapping.default")
        if not raw:
            return {}
        return {m["field-id"]: m["names"][0] for m in json.loads(raw)}

    def plan_files(
        self,
        filters: list[tuple] | None = None,
        snapshot_id: int | None = None,
        ref: str | None = None,
    ) -> list[dict]:
        """Manifest-level scan planning: drop every live data file whose
        [lower_bounds, upper_bounds] for a filtered field can't satisfy the
        predicate — Iceberg's min/max file pruning, evaluated driver-side
        from the manifest stats without touching any parquet footer.
        ``filters``: [(column, op, value)] with op in =,<,<=,>,>=; files
        lacking bounds for a column are conservatively kept.
        ``ref``: plan at a named branch/tag instead of a snapshot id."""
        if ref is not None:
            if snapshot_id is not None:
                raise ValueError("pass either snapshot_id or ref, not both")
            snapshot_id = self._resolve_ref(ref)
        files = self.live_files(snapshot_id)
        if not filters:
            return files
        schema_id = None if snapshot_id is None else (
            (self._snapshot(snapshot_id) or {}).get("schema-id")
        )
        ice = next(
            s for s in self.meta["schemas"]
            if s["schema-id"] == (schema_id if schema_id is not None
                                  else self.meta["current-schema-id"])
        )
        by_name = {
            f["name"]: (f["id"], _iceberg_type_to_spark(f["type"]))
            for f in ice["fields"]
            if not isinstance(f["type"], dict)
        }

        def bound(df_, which, fid, dt):
            for kv in df_.get(which) or []:
                if kv["key"] == fid:
                    return _decode_bound(bytes(kv["value"]), dt)
            return None

        def may_match(df_) -> bool:
            for col, op, val in filters:
                if col not in by_name:
                    continue
                fid, dt = by_name[col]
                lo = bound(df_, "lower_bounds", fid, dt)
                hi = bound(df_, "upper_bounds", fid, dt)
                if lo is None or hi is None:
                    continue  # no stats -> keep
                if (isinstance(lo, float) and lo != lo) or (
                        isinstance(hi, float) and hi != hi):
                    continue  # NaN bound (foreign writer): comparisons
                    # below are all False — keep the file
                if op in ("=", "==") and not (lo <= val <= hi):
                    return False
                if op == "<" and not (lo < val):
                    return False
                if op == "<=" and not (lo <= val):
                    return False
                if op == ">" and not (hi > val):
                    return False
                if op == ">=" and not (hi >= val):
                    return False
            return True

        return [f for f in files if may_match(f)]

    def to_df(
        self,
        snapshot_id: int | None = None,
        filters: list[tuple] | None = None,
        columns: list[str] | None = None,
        ref: str | None = None,
        _with_path: bool = False,
        _paths: set[str] | None = None,
        _with_pos: bool = False,
    ) -> DataFrame:
        """Read the snapshot. ``filters`` prune files via the manifest
        min/max bounds then apply row-wise; ``columns`` (r8) prunes the
        parquet ReadSchema to the requested logical columns (filter and
        equality-delete columns are read internally as needed but not
        returned); ``ref`` (r9) reads a named branch/tag — Iceberg's
        `VERSION AS OF 'refname'` — with the referenced snapshot's schema,
        like explicit snapshot time travel."""
        if ref is not None:
            if snapshot_id is not None:
                raise ValueError("pass either snapshot_id or ref, not both")
            snapshot_id = self._resolve_ref(ref)
        snap = self._snapshot(snapshot_id)
        # current reads use current-schema-id (metadata-only alters bump the
        # schema without a new snapshot); explicit time travel uses the
        # schema the snapshot was committed under
        schema_id = (
            snap.get("schema-id") if snap and snapshot_id is not None else None
        )
        logical = self.schema(schema_id)
        files = self.plan_files(filters, snapshot_id)
        if _paths is not None:
            # caller-scoped read (the COW DML rewrite pass): list and
            # scan ONLY the affected files, never the table
            files = [
                f for f in files
                if str(self._local_data(f["file_path"]).resolve()) in _paths
            ]
        if not files:
            empty = self.spark.createDataFrame([], logical)
            empty = empty.select(*columns) if columns is not None else empty
            if _with_path:  # internal: COW DML keys rewrites by file
                empty = empty.withColumn(
                    "__if_fp", F.lit(None).cast("string"))
            if _with_pos:
                empty = empty.withColumn(
                    "__if_pos", F.lit(None).cast("bigint"))
            return empty
        mapping = self.name_mapping()
        # physical (in-file) name per top-level field via name mapping
        ice = next(
            s for s in self.meta["schemas"]
            if s["schema-id"] == (schema_id if schema_id is not None
                                  else self.meta["current-schema-id"])
        )
        phys = {
            f["name"]: mapping.get(f["id"], f["name"]) for f in ice["fields"]
        }
        eq_entries = self.equality_delete_entries(snapshot_id)
        all_names = {f.name for f in logical.fields}
        for c in list(columns or []) + [c for c, _, _ in (filters or [])]:
            if c not in all_names:
                raise IcebergFormatError(f"unknown column {c!r}")
        need: set[str] | None = None
        if columns is not None:
            # filter + equality-delete columns must be READ even when not
            # returned (the anti-join and residual predicates touch them)
            id2name_all = {f["id"]: f["name"] for f in ice["fields"]}
            eq_cols = {
                id2name_all[i]
                for e in eq_entries
                for i in (e["data_file"].get("equality_ids") or [])
                if i in id2name_all
            }
            need = set(columns) | {c for c, _, _ in (filters or [])} | eq_cols
        read_fields = [
            f for f in logical.fields if need is None or f.name in need
        ]
        out_names = (
            [f.name for f in logical.fields if f.name in set(columns)]
            if columns is not None
            else [f.name for f in logical.fields]
        )
        phys_schema = T.StructType(
            [
                T.StructField(phys[f.name], f.dataType, f.nullable)
                for f in read_fields
            ]
        )
        paths = [str(self._local_data(df_["file_path"])) for df_ in files]
        df = self.spark.read.schema(phys_schema).parquet(*paths)
        if _with_pos:
            # physical row ordinal, captured at the scan (the MOR delete
            # writer needs it; _metadata is only addressable here)
            df = df.withColumn("__if_pos", F.col("_metadata.row_index"))
        dels = self.position_delete_files(snapshot_id)
        if dels:
            # v2 position deletes: (file_path, pos) rows in parquet delete
            # files → anti-join against (_metadata.file_path, row_index),
            # the same mechanism as the Delta deletion-vector path. The
            # delete rows name data files by their manifest URI; a small
            # broadcast map rebases them onto the canonical local path the
            # metadata column reports.
            del_paths = [str(self._local_data(d["file_path"])) for d in dels]
            del_df = self.spark.read.schema(
                "file_path string, pos bigint"
            ).parquet(*del_paths)
            uri_map = self.spark.createDataFrame(
                [
                    (f["file_path"],
                     str(self._local_data(f["file_path"]).resolve()))
                    for f in files
                ],
                "u string, __if_fp string",
            )
            dmapped = del_df.join(
                F.broadcast(uri_map), del_df["file_path"] == uri_map["u"]
            ).select("__if_fp", F.col("pos").alias("__if_ri"))
            # percent-decoded like the Delta reader (ADVICE r7): the map is
            # keyed on raw resolved paths, Spark reports the column encoded
            fp = fs_path_col()
            df = (
                df.withColumns(
                    {"__if_fp": fp, "__if_ri": F.col("_metadata.row_index")}
                )
                .join(F.broadcast(dmapped), ["__if_fp", "__if_ri"], "left_anti")
            )
        if eq_entries:
            # v2 equality deletes: each delete file holds VALUE tuples for
            # the columns named by equality_ids; a data row is deleted when
            # it matches any tuple AND its file's data sequence number is
            # STRICTLY below the delete's. Null-safe equality per the spec.
            id2name = {f["id"]: f["name"] for f in ice["fields"]}
            nm = mapping
            seq_map = self.spark.createDataFrame(
                [
                    (str(self._local_data(e["data_file"]["file_path"]).resolve()),
                     int(e.get("sequence_number") or 0))
                    for e in self._live_data_entries(snapshot_id)
                ],
                "__if_fp string, __if_seq bigint",
            )
            fp = fs_path_col()
            if "__if_fp" not in df.columns:
                df = df.withColumn("__if_fp", fp)
            df = df.join(F.broadcast(seq_map), "__if_fp", "left")
            for e in eq_entries:
                dfile = e["data_file"]
                seq_d = int(e.get("sequence_number") or 0)
                ids = dfile.get("equality_ids") or []
                cols = [nm.get(i, id2name.get(i)) for i in ids]
                if not cols or any(c is None for c in cols):
                    raise IcebergFormatError(
                        f"equality delete file {dfile['file_path']!r} names "
                        f"unknown field ids {ids}"
                    )
                del_rows = (
                    self.spark.read.parquet(
                        str(self._local_data(dfile["file_path"]))
                    )
                    .select(*[F.col(c).alias(f"__eq_{c}") for c in cols])
                    .distinct()
                )
                cond = F.col("__if_seq") < F.lit(seq_d)
                for c in cols:
                    cond = cond & F.col(c).eqNullSafe(F.col(f"__eq_{c}"))
                df = df.join(F.broadcast(del_rows), cond, "left_anti")
        path_extra = ["__if_fp"] if _with_path else []
        if _with_path and "__if_fp" not in df.columns:
            df = df.withColumn("__if_fp", fs_path_col())
        if _with_pos:
            path_extra = path_extra + ["__if_pos"]
        out = df.select(
            *[F.col(phys[f.name]).alias(f.name) for f in read_fields],
            *path_extra,
        )
        # residual row-level filter on top of the file-level prune
        ops = {
            "=": "==", "==": "==", "<": "<", "<=": "<=", ">": ">", ">=": ">=",
        }
        for col, op, val in filters or []:
            c, v = F.col(col), F.lit(val)
            out = out.where(
                {"==": c == v, "<": c < v, "<=": c <= v,
                 ">": c > v, ">=": c >= v}[ops[op]]
            )
        return out.select(*out_names, *path_extra)

    def _local_data(self, uri: str) -> Path:
        loc = self.meta["location"].rstrip("/")
        if uri.startswith(loc):
            return self.path / uri[len(loc):].lstrip("/")
        return Path(uri)

    # -- metadata tables (03.iceberg_primer.py:380-456) ------------------- #
    def expire_snapshots(
        self, keep_last: int = 1, dry_run: bool = False,
        max_metadata_versions: int | None = None,
    ) -> dict:
        """Iceberg's expireSnapshots maintenance (Spark SQL
        `CALL catalog.system.expire_snapshots(...)`): retain the newest
        `keep_last` snapshots (the current snapshot always survives),
        write a NEW v{n+1}.metadata.json with the expired ones pruned
        from `snapshots`/`snapshot-log`, flip version-hint, and delete
        only what the expired snapshots alone referenced — their
        manifest lists, manifests no retained snapshot lists, and
        data/delete files no retained snapshot reaches. Time travel to
        retained snapshots is untouched; reads of expired ids raise
        snapshot-not-found — exactly Iceberg's contract.

        ``max_metadata_versions`` additionally trims the metadata-log to
        its newest N entries and unlinks the older v*.metadata.json files
        (Iceberg's `write.metadata.previous-versions-max` +
        delete-after-commit behavior) — the current file and version-hint
        are never touched.

        100 TB shape: cost is O(metadata of expired snapshots) — the
        kept-file index is built from the RETAINED manifests (bounded by
        the live table), data files are unlinked, never read."""
        import time as _time

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        snaps = list(self.meta.get("snapshots") or [])
        cur = self.meta.get("current-snapshot-id", -1)
        # snapshots pinned by a ref (branch or tag) never expire — Iceberg's
        # ExpireSnapshots retains every ref target until the ref is dropped
        keep_ids = {s["snapshot-id"] for s in snaps[-keep_last:]}
        keep_ids |= {
            r["snapshot-id"] for r in (self.meta.get("refs") or {}).values()
        }
        if cur != -1:
            keep_ids.add(cur)
        retained = [s for s in snaps if s["snapshot-id"] in keep_ids]
        expired = [s for s in snaps if s["snapshot-id"] not in keep_ids]

        keep_files: set[Path] = set()
        keep_manifests: set[Path] = set()
        for s in retained:
            ml = self._local(s["manifest-list"])
            keep_files.add(ml)
            _, rows = read_ocf_bytes(ml.read_bytes())
            for m in rows:
                mp = self._local(m["manifest_path"])
                keep_manifests.add(mp)
                _, entries = read_ocf_bytes(mp.read_bytes())
                # reachability = ADDED/EXISTING entries only: a DELETED
                # entry records removal, it does not keep the file alive
                # (Iceberg's expireSnapshots contract — this is what lets
                # rewrite_data_files' replaced files reclaim)
                keep_files.update(
                    self._local_data(e["data_file"]["file_path"])
                    for e in entries
                    if e["status"] != _STATUS_DELETED
                )
        keep_files |= keep_manifests

        drop: set[Path] = set()
        stats = {"manifest_lists": 0, "manifests": 0, "data_files": 0}
        for s in expired:
            ml = self._local(s["manifest-list"])
            if ml in keep_files or not ml.exists():
                continue
            drop.add(ml)
            stats["manifest_lists"] += 1
            _, rows = read_ocf_bytes(ml.read_bytes())
            for m in rows:
                mp = self._local(m["manifest_path"])
                if mp in keep_files or not mp.exists() or mp in drop:
                    continue
                drop.add(mp)
                stats["manifests"] += 1
                _, entries = read_ocf_bytes(mp.read_bytes())
                for e in entries:
                    dp = self._local_data(e["data_file"]["file_path"])
                    if dp not in keep_files and dp not in drop and dp.exists():
                        drop.add(dp)
                        stats["data_files"] += 1

        result = {
            "expired": [s["snapshot-id"] for s in expired],
            "deleted_manifest_lists": stats["manifest_lists"],
            "deleted_manifests": stats["manifests"],
            "deleted_data_files": stats["data_files"],
        }
        if dry_run or not expired:
            return result

        now_ms = int(_time.time() * 1000)
        cur_file = self._current_metadata_file()
        meta = dict(self.meta)
        meta["snapshots"] = retained
        meta["snapshot-log"] = [
            e for e in (self.meta.get("snapshot-log") or [])
            if e.get("snapshot-id") in keep_ids
        ]
        meta["last-updated-ms"] = now_ms
        meta["metadata-log"] = (self.meta.get("metadata-log") or []) + [{
            "timestamp-ms": now_ms,
            "metadata-file":
                f"{self.meta['location']}/metadata/{cur_file.name}",
        }]
        if max_metadata_versions is not None:
            if max_metadata_versions < 1:
                raise ValueError("max_metadata_versions must be >= 1")
            kept_log = meta["metadata-log"][-max_metadata_versions:]
            kept_names = {
                e["metadata-file"].rsplit("/", 1)[-1] for e in kept_log
            }
            result["deleted_metadata_files"] = 0
            for e in meta["metadata-log"][:-max_metadata_versions]:
                name = e["metadata-file"].rsplit("/", 1)[-1]
                if name in kept_names or name == cur_file.name:
                    continue
                p = self.meta_dir / name
                if p.exists():
                    p.unlink()
                    result["deleted_metadata_files"] += 1
            meta["metadata-log"] = kept_log
        new_v = int(cur_file.name.split(".")[0][1:]) + 1
        (self.meta_dir / f"v{new_v}.metadata.json").write_text(
            json.dumps(meta, indent=2)
        )
        (self.meta_dir / "version-hint.text").write_text(str(new_v))
        for p in drop:
            p.unlink(missing_ok=True)
        self.meta = meta
        return result

    def rewrite_data_files(
        self, target_files: int | None = None,
        target_file_size_mb: int = 128, dry_run: bool = False,
    ) -> dict:
        """Iceberg's rewriteDataFiles compaction (Spark SQL
        `CALL catalog.system.rewrite_data_files(...)`): read the CURRENT
        snapshot (row-level deletes applied), bin-pack it into
        ``target_files`` files (default: ceil(live bytes / target size)),
        and commit a new `replace` snapshot whose single manifest lists
        the new files as ADDED and every old live file as DELETED —
        active position/equality-delete manifests drop out because their
        rows are now physically gone. Time travel to prior snapshots is
        untouched (their manifest lists still exist); the old files
        become reclaimable by the next `expire_snapshots`.

        100 TB shape: the rewrite is ONE distributed Spark pass over the
        live data (scan → repartition → write); metadata cost is O(live
        files). This is the maintenance op that keeps MOR tables from
        accumulating delete files and small-file tables from drowning
        their planners."""
        pctx = self._partition_ctx("rewrite_data_files")
        live = self._live_data_entries()
        if not live:
            raise IcebergFormatError("no live data files to rewrite")
        total_bytes = sum(
            e["data_file"]["file_size_in_bytes"] or 0 for e in live
        )
        n_out = target_files or max(
            1, -(-total_bytes // (target_file_size_mb * 1024 * 1024))
        )
        plan = {
            "input_files": len(live),
            "input_bytes": total_bytes,
            "target_files": int(n_out),
            "applied_delete_files": len(self.position_delete_files())
            + len({e["data_file"]["file_path"]
                   for e in self.equality_delete_entries()}),
        }
        if dry_run:
            return plan

        logical, ice, phys_of, fid_of_phys, dt_of_phys = self._phys_maps()

        df = self.to_df()
        for f in logical.fields:  # files store PHYSICAL names
            if phys_of[f.name] != f.name:
                df = df.withColumnRenamed(f.name, phys_of[f.name])
        new_rels = self._write_cow_files(
            df.repartition(int(n_out)), "rewritten", pctx=pctx)

        new_id, seq = self._next_ids()
        entries = self._added_entries(
            new_rels, new_id, seq, fid_of_phys, dt_of_phys)
        n_added = len(entries)  # zero-row partitions were dropped
        for e in live:  # relist every replaced file as DELETED
            entries.append({
                "status": 2,
                "snapshot_id": new_id,
                "sequence_number": e.get("sequence_number"),
                "file_sequence_number": e.get("file_sequence_number"),
                "data_file": e["data_file"],
                "__spec_id": e.get("__spec_id"),
            })
        self._commit_snapshot(
            entries, ice, new_id, seq,
            operation="replace",
            summary={
                "added-data-files": str(n_added),
                "deleted-data-files": str(len(live)),
                "total-data-files": str(n_added),
            },
            pctx=pctx,
        )
        plan["output_files"] = n_added
        plan["snapshot_id"] = new_id
        return plan

    # -- COW commit plumbing shared by rewrite_data_files and the DML ---- #
    def _phys_maps(self):
        logical = self.schema()
        mapping = self.name_mapping()  # field-id -> physical name
        ice = next(
            s for s in self.meta["schemas"]
            if s["schema-id"] == self.meta["current-schema-id"]
        )
        phys_of = {
            f["name"]: mapping.get(f["id"], f["name"]) for f in ice["fields"]
        }
        fid_of_phys = {mapping.get(f["id"], f["name"]): f["id"]
                       for f in ice["fields"]}
        dt_of_phys = {phys_of[f.name]: f.dataType for f in logical.fields}
        return logical, ice, phys_of, fid_of_phys, dt_of_phys

    def _next_ids(self) -> tuple[int, int]:
        snap_ids = [s["snapshot-id"]
                    for s in self.meta.get("snapshots") or []]
        new_id = max(snap_ids) + 1 if snap_ids else 1
        seq = int(self.meta.get("last-sequence-number", 0)) + 1
        return new_id, seq

    def _sort_cols(self) -> list:
        """Spark sort expressions for the table's default sort order
        (PHYSICAL column names) — identity fields only; any transform or
        unresolvable source disables the sort (advisory clustering,
        never a correctness gate)."""
        so_id = self.meta.get("default-sort-order-id", 0)
        so = next((s for s in (self.meta.get("sort-orders") or [])
                   if s.get("order-id") == so_id), None)
        fields = (so or {}).get("fields") or []
        if not fields:
            return []
        ice = next(s for s in self.meta["schemas"]
                   if s["schema-id"] == self.meta["current-schema-id"])
        by_id = {f["id"]: f for f in ice["fields"]}
        mapping = self.name_mapping()
        cols = []
        for sf in fields:
            if (sf.get("transform") or "").lower() != "identity":
                return []
            srcf = by_id.get(sf.get("source-id"))
            if srcf is None or isinstance(srcf.get("type"), dict):
                return []
            phys = mapping.get(srcf["id"], srcf["name"])
            c = F.col(phys)
            asc = (sf.get("direction") or "asc").lower() != "desc"
            nf = (sf.get("null-order") or "nulls-first").lower() \
                == "nulls-first"
            c = (c.asc_nulls_first() if nf else c.asc_nulls_last()) \
                if asc else \
                (c.desc_nulls_first() if nf else c.desc_nulls_last())
            cols.append(c)
        return cols

    def _write_cow_files(
        self, df: DataFrame, prefix: str, pctx: dict | None = None,
    ) -> list[tuple[str, dict]]:
        """Write ``df`` as data files; return [(relative path, partition
        tuple)]. Under an identity spec (``pctx``) the write groups rows
        per partition via `partitionBy` on DUPLICATED columns — so the
        data files keep every table column (Iceberg's native layout,
        unlike Delta's hive stripping) while each file still belongs to
        exactly one partition tuple, decoded typed from the hive
        directory names. One distributed write either way."""
        from lakehouses_spark.tables.delta_log import hive_partition_values

        rel_dir = f"data/{prefix}-{uuid.uuid4().hex[:8]}"
        tmp = self.path / f".tmp-{prefix}-{uuid.uuid4().hex}"
        sort_cols = self._sort_cols()
        dup_of: list[tuple[str, dict]] = []
        if pctx:
            for i, f in enumerate(pctx["fields"]):
                dup = f"__lhp_{i}"
                df = df.withColumn(dup, f["pcol"])
                dup_of.append((dup, f))
            if sort_cols:
                # the declared WRITE ORDERED BY, task-local (no
                # shuffle). Partition dup columns lead the order so the
                # file writer's required partition ordering is already
                # satisfied and it does not re-sort (which would
                # destroy the data clustering)
                df = df.sortWithinPartitions(
                    *[F.col(d) for d, _ in dup_of], *sort_cols)
            df.write.partitionBy(*[d for d, _ in dup_of]).parquet(str(tmp))
            parts = sorted(
                p for p in tmp.rglob("part-*.parquet") if p.is_file())
        else:
            if sort_cols:
                df = df.sortWithinPartitions(*sort_cols)
            df.write.parquet(str(tmp))
            parts = sorted(tmp.glob("part-*.parquet"))
        (self.path / rel_dir).mkdir(parents=True, exist_ok=True)
        out: list[tuple[str, dict]] = []
        for i, part in enumerate(parts):
            pv: dict[str, Any] = {}
            if pctx:
                raw_by_dup = hive_partition_values(
                    part.relative_to(tmp).parts[:-1])
                for dup, f in dup_of:
                    pv[f["pname"]] = _pv_from_dir(
                        raw_by_dup.get(dup), f["vdt"])
            rel = f"{rel_dir}/part-{i:05d}.parquet"
            os.replace(part, self.path / rel)
            out.append((rel, pv))
        shutil.rmtree(tmp, ignore_errors=True)
        return out

    def _added_entries(self, new_rels: list[tuple[str, dict]],
                       new_id: int, seq: int,
                       fid_of_phys: dict, dt_of_phys: dict) -> list[dict]:
        """ADDED manifest entries for freshly-written parquet files
        (``new_rels``: [(relative path, partition tuple)]), with
        lower/upper bounds decoded from the footers (so filter-driven
        file skipping keeps working on the new layout)."""
        import pyarrow.parquet as pq

        location = self.meta["location"].rstrip("/")
        entries: list[dict] = []
        for rel, pv in new_rels:
            md = pq.ParquetFile(self.path / rel).metadata
            if md.num_rows == 0:
                # an empty rewrite partition (e.g. a COW DELETE that
                # removed every row of the affected files) — a zero-row
                # live file is pure planner noise; drop it
                (self.path / rel).unlink(missing_ok=True)
                continue
            lower: list[dict] = []
            upper: list[dict] = []
            # exactness-guarded bounds (see exact_footer_bounds): a
            # column with any row group holding values but no min/max
            # gets NO bounds — partial bounds would under-cover the file
            # and manifest pruning would wrongly skip it
            mins, maxs = exact_footer_bounds(md)
            for name in sorted(mins):
                fid = fid_of_phys.get(name)
                dt = dt_of_phys.get(name)
                if fid is None or dt is None:
                    continue
                lo = _encode_bound(mins[name], dt)
                hi = _encode_bound(maxs[name], dt)
                if lo is not None:
                    lower.append({"key": fid, "value": lo})
                if hi is not None:
                    upper.append({"key": fid, "value": hi})
            entries.append({
                "status": 1,  # ADDED
                "snapshot_id": new_id,
                "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": 0,
                    "file_path": f"{location}/{rel}",
                    "file_format": "PARQUET",
                    "partition": pv,
                    "record_count": md.num_rows,
                    "file_size_in_bytes": (self.path / rel).stat().st_size,
                    "lower_bounds": lower or None,
                    "upper_bounds": upper or None,
                    "equality_ids": None,
                },
            })
        return entries

    def _spec_record_ctx(self, spec_id: int) -> dict | None:
        """A RELISTING partition-record context for ``spec_id`` — the
        typed field layout a manifest of that spec declares (pname /
        field-id / Avro value type / spec JSON), WITHOUT the write-side
        transform evaluation `_partition_ctx` builds. Used when a
        commit must relist EXISTING entries whose manifests were
        written under an OLDER spec: a manifest has exactly ONE spec,
        so those entries keep their own (multi-spec tables — partition
        evolution). None when the spec is unpartitioned; unknown
        transforms refuse loudly (their value TYPE is unknowable)."""
        spec = next(
            (s for s in (self.meta.get("partition-specs") or [])
             if s.get("spec-id") == spec_id), None)
        fields = (spec or {}).get("fields") or []
        if not fields:
            return None
        from lakehouses_spark.tables.iceberg_transforms import (
            parse_spec_transform,
        )

        ice = next(s for s in self.meta["schemas"]
                   if s["schema-id"] == self.meta["current-schema-id"])
        by_id = {f["id"]: f for f in ice["fields"]}
        out = []
        for pf in fields:
            tr = (pf.get("transform") or "").lower()
            bt = parse_spec_transform(tr)
            src = by_id.get(pf.get("source-id"))
            if tr == "identity" or (bt and bt[0] == "truncate"):
                if src is None or isinstance(src.get("type"), dict):
                    raise IcebergFormatError(
                        f"partition field {pf.get('name')!r} of spec "
                        f"{spec_id} has no resolvable primitive source"
                    )
                dt = _iceberg_type_to_spark(src["type"])
                avro_t = _PV_AVRO.get(dt.typeName())
            elif tr in _DATE_TRANSFORMS or (bt and bt[0] == "bucket"):
                avro_t = "int"
            else:
                raise IcebergFormatError(
                    f"cannot relist entries of spec {spec_id}: unknown "
                    f"transform {pf.get('transform')!r}"
                )
            if avro_t is None:
                raise IcebergFormatError(
                    f"cannot relist entries of spec {spec_id}: value "
                    f"type of {pf.get('name')!r} is not encodable"
                )
            out.append({"pname": pf["name"],
                        "field_id": pf.get("field-id", 1000),
                        "avro": avro_t})
        return {"spec_id": spec_id, "fields": out,
                "spec_json": json.dumps(fields)}

    def _commit_snapshot(self, entries: list[dict], ice: dict,
                         new_id: int, seq: int, operation: str,
                         summary: dict,
                         carried_ml_rows: list[dict] | None = None,
                         pctx: dict | None = None,
                         delete_entries: list[dict] | None = None) -> None:
        """Write one manifest for ``entries``, a manifest list referencing
        it (plus any carried manifest-list rows — e.g. live delete
        manifests that must keep applying), and the next metadata.json
        with the snapshot appended and main ref advanced. ``pctx``
        threads the identity partition-write context so partitioned
        tables commit typed partition records under the declared spec.

        Multi-spec tables (partition evolution): entries tagged with a
        DIFFERENT ``__spec_id`` than the current spec relist in their
        own per-spec manifests — a manifest has exactly one partition
        spec, and mixing tuple layouts corrupts real readers."""
        import time as _time

        location = self.meta["location"].rstrip("/")
        now_ms = int(_time.time() * 1000)
        cur_spec = (pctx or {}).get(
            "spec_id", self.meta.get("default-spec-id", 0))
        by_spec: dict[int, list[dict]] = {}
        main_entries: list[dict] = []
        for e in entries:
            sid = e.get("__spec_id", cur_spec)
            e = {k: v for k, v in e.items() if k != "__spec_id"}
            if e.get("status") == 1 or sid == cur_spec:
                main_entries.append(e)  # fresh files use the current spec
            else:
                by_spec.setdefault(sid, []).append(e)
        m = _write_manifest(self.meta_dir, main_entries, json.dumps(ice),
                            new_id, seq, pctx=pctx)
        ml_rows = [m["ml_row"]]
        for sid in sorted(by_spec):
            mo = _write_manifest(
                self.meta_dir, by_spec[sid], json.dumps(ice),
                new_id, seq, pctx=self._spec_record_ctx(sid))
            ml_rows.append(mo["ml_row"])
        if delete_entries:
            # merge-on-read DML: the new row-level delete files commit in
            # their own DELETE manifest (manifest-list content=1)
            dm = _write_manifest(
                self.meta_dir,
                [{k: v for k, v in e.items() if k != "__spec_id"}
                 for e in delete_entries],
                json.dumps(ice), new_id, seq, pctx=pctx,
                content=1)
            ml_rows.append(dm["ml_row"])
        for r in carried_ml_rows or []:
            # normalize to our manifest-list schema (foreign rows may
            # carry extra/missing optional fields)
            ml_rows.append({
                f["name"]: r.get(f["name"], 0)
                for f in _MANIFEST_LIST_SCHEMA["fields"]
            })
        ml_name = f"snap-{new_id}-1-{uuid.uuid4()}.avro"
        (self.meta_dir / ml_name).write_bytes(
            write_ocf_bytes_with_meta(
                ml_rows,
                _MANIFEST_LIST_SCHEMA,
                {
                    "format-version": str(FORMAT_VERSION),
                    "snapshot-id": str(new_id),
                    "sequence-number": str(seq),
                },
            )
        )
        cur = self.meta.get("current-snapshot-id", -1)
        snap = {
            "snapshot-id": new_id,
            **({"parent-snapshot-id": cur} if cur != -1 else {}),
            "sequence-number": seq,
            "timestamp-ms": now_ms,
            "manifest-list": f"{location}/metadata/{ml_name}",
            "summary": {"operation": operation, **summary},
            "schema-id": self.meta["current-schema-id"],
        }
        meta = dict(self.meta)
        meta["snapshots"] = list(self.meta.get("snapshots") or []) + [snap]
        meta["snapshot-log"] = list(self.meta.get("snapshot-log") or []) + [
            {"timestamp-ms": now_ms, "snapshot-id": new_id}
        ]
        meta["current-snapshot-id"] = new_id
        meta["last-sequence-number"] = seq
        refs = dict(meta.get("refs") or {})
        # the main branch always tracks the current snapshot; create it
        # on the FIRST commit to a fresh table (write_iceberg_table)
        refs["main"] = {
            **refs.get("main", {"type": "branch"}), "snapshot-id": new_id,
        }
        meta["refs"] = refs
        self._commit_metadata(meta)

    def delete(self, predicate: str, dry_run: bool = False,
               mode: str | None = None,
               strategy: str | None = None) -> dict:
        """DELETE FROM on an external Iceberg v2 table. Mode resolves
        from the argument, else the table's `write.delete.mode`
        property, else copy-on-write (Spark-Iceberg's default):

        - ``copy-on-write``: files containing matching rows are
          rewritten without them; the commit is a new `delete` snapshot
          whose manifest relists rewritten files as ADDED, removed files
          as DELETED, and untouched files as EXISTING — live delete
          manifests for untouched files carry over. The format twin of
          `DeltaLogReader.delete`.
        - ``merge-on-read`` (r12): commit POSITION DELETE files instead
          of rewriting data — the scale path for sparse deletes over
          huge files (see `_mor_delete`). With ``strategy="equality"``
          (r12 continuation — the Flink-upsert shape) the commit is an
          EQUALITY DELETE file built purely from the predicate's
          literals: ZERO data read, the cheapest possible delete-by-key
          (see `_eq_delete`)."""
        mode = mode or (self.meta.get("properties") or {}).get(
            "write.delete.mode", "copy-on-write")
        if strategy not in (None, "position", "equality"):
            raise IcebergFormatError(
                f"unknown delete strategy {strategy!r} "
                "(position or equality)")
        if mode == "merge-on-read":
            if strategy == "equality":
                return self._eq_delete(predicate, dry_run)
            return self._mor_delete(predicate, dry_run)
        if strategy == "equality":
            raise IcebergFormatError(
                "strategy='equality' requires mode='merge-on-read'")
        if mode != "copy-on-write":
            raise IcebergFormatError(
                f"unknown write.delete.mode {mode!r} (copy-on-write or "
                "merge-on-read)")
        return self._cow_dml("DELETE", predicate, None, dry_run)

    _EQ_DELETE_MAX_TUPLES = 10_000

    def _eq_delete(self, predicate: str, dry_run: bool) -> dict:
        """DELETE, merge-on-read via an EQUALITY DELETE file (spec
        "Equality Delete Files"): the predicate must be a top-level AND
        of equality / IN literal comparisons over primitive columns —
        their cartesian product becomes the delete file's value tuples,
        `equality_ids` names the columns by field id, and the file
        commits in a content=1 DELETE manifest. A data row is deleted
        when it matches any tuple and its file's sequence number is
        STRICTLY below the delete's — which every current file is, so
        the predicate semantics equal a COW/position delete's, at ZERO
        data read and O(tuples) write. Unpartitioned tables only (a
        partition-scoped equality delete needs a derivable tuple per
        value — use the position strategy there). Anything the
        conservative parser can't prove equality-shaped refuses
        loudly."""
        import itertools

        import pyarrow.parquet as pq

        from lakehouses_spark.tables.delta_log import split_top_level_and
        from lakehouses_spark.tables.iceberg_transforms import (
            parse_col_op_literal,
        )

        if self._partition_ctx("DELETE") is not None:
            raise IcebergFormatError(
                "equality-delete strategy supports unpartitioned tables "
                "only — use the position strategy on a partitioned table"
            )
        logical, ice, phys_of, fid_of_phys, dt_of_phys = self._phys_maps()
        by_name = {f.name: f for f in logical.fields}

        def lit_ok(v: Any, tname: str) -> bool:
            import datetime as _dt

            if tname in ("integer", "long", "short", "byte"):
                return isinstance(v, int) and not isinstance(v, bool)
            if tname == "string":
                return isinstance(v, str)
            if tname == "date":
                return isinstance(v, _dt.date)
            return False

        cols: list[str] = []
        value_lists: list[list[Any]] = []
        for conj in split_top_level_and(predicate):
            parsed = parse_col_op_literal(conj)
            if parsed is None or parsed[1] not in ("=", "in"):
                raise IcebergFormatError(
                    "equality-delete strategy needs a conjunction of "
                    f"`col = literal` / `col IN (...)`; {conj!r} is not "
                    "— use the position strategy"
                )
            col, _, vals = parsed
            f = by_name.get(col)
            if f is None:
                raise ValueError(f"unknown column {col!r}")
            if col in cols:
                raise IcebergFormatError(
                    f"column {col!r} constrained twice — fold the "
                    "values into one IN list"
                )
            if not all(lit_ok(v, f.dataType.typeName()) for v in vals):
                raise IcebergFormatError(
                    f"literal(s) for {col!r} do not match its type — "
                    "use the position strategy"
                )
            cols.append(col)
            value_lists.append(vals)
        n_tuples = 1
        for vl in value_lists:
            n_tuples *= len(vl)
        if n_tuples > self._EQ_DELETE_MAX_TUPLES:
            raise IcebergFormatError(
                f"{n_tuples} equality tuples exceed the "
                f"{self._EQ_DELETE_MAX_TUPLES} cap — use the position "
                "strategy"
            )
        cur = self.meta.get("current-snapshot-id", -1)
        plan = {"delete_files": 0, "equality_rows": n_tuples,
                "scanned_files": 0, "snapshot_id": cur}
        if dry_run:
            return plan
        tuples = list(itertools.product(*value_lists))
        # the delete file stores the equality columns under their
        # PHYSICAL names (readers resolve them via equality_ids)
        eq_schema = T.StructType([
            T.StructField(phys_of[c], by_name[c].dataType, True)
            for c in cols
        ])
        df = self.spark.createDataFrame(tuples, eq_schema).coalesce(1)
        rel_dir = f"data/eq-delete-{uuid.uuid4().hex[:8]}"
        tmp = self.path / f".tmp-eqdel-{uuid.uuid4().hex}"
        df.write.parquet(str(tmp))
        (self.path / rel_dir).mkdir(parents=True, exist_ok=True)
        part = next(p for p in sorted(tmp.glob("part-*.parquet")))
        rel = f"{rel_dir}/eq-delete-00000.parquet"
        os.replace(part, self.path / rel)
        shutil.rmtree(tmp, ignore_errors=True)
        md = pq.ParquetFile(self.path / rel).metadata
        mins, maxs = exact_footer_bounds(md)
        lower, upper = [], []
        for pn in sorted(mins):
            fid = fid_of_phys.get(pn)
            dt = dt_of_phys.get(pn)
            if fid is None or dt is None:
                continue
            lo = _encode_bound(mins[pn], dt)
            hi = _encode_bound(maxs[pn], dt)
            if lo is not None:
                lower.append({"key": fid, "value": lo})
            if hi is not None:
                upper.append({"key": fid, "value": hi})
        location = self.meta["location"].rstrip("/")
        new_id, seq = self._next_ids()
        delete_entries = [{
            "status": 1,
            "snapshot_id": new_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 2,  # EQUALITY_DELETES
                "file_path": f"{location}/{rel}",
                "file_format": "PARQUET",
                "partition": {},
                "record_count": md.num_rows,
                "file_size_in_bytes": (self.path / rel).stat().st_size,
                "lower_bounds": lower or None,
                "upper_bounds": upper or None,
                "equality_ids": [
                    fid_of_phys[phys_of[c]] for c in cols],
            },
        }]
        live = self._live_data_entries()
        entries = [{
            "status": 0,  # every data file stays EXISTING, untouched
            "snapshot_id": e.get("snapshot_id"),
            "sequence_number": e.get("sequence_number"),
            "file_sequence_number": e.get("file_sequence_number"),
            "data_file": e["data_file"],
            "__spec_id": e.get("__spec_id"),
        } for e in live]
        snap = self._snapshot()
        carried = []
        if snap is not None:
            _, ml_rows = read_ocf_bytes(
                self._local(snap["manifest-list"]).read_bytes())
            carried = [r for r in ml_rows
                       if int(r.get("content", 0) or 0) == 1]
        self._commit_snapshot(
            entries, ice, new_id, seq,
            operation="delete",
            summary={
                "added-delete-files": "1",
                "added-equality-delete-records": str(md.num_rows),
                "total-data-files": str(len(live)),
                "lakehouses-delete-mode": "merge-on-read",
                "lakehouses-delete-strategy": "equality",
                "lakehouses-delete-predicate": predicate,
            },
            carried_ml_rows=carried,
            pctx=None,
            delete_entries=delete_entries,
        )
        plan["delete_files"] = 1
        plan["snapshot_id"] = new_id
        return plan

    def _write_position_deletes(self, matches: DataFrame,
                                live: list[dict],
                                new_id: int, seq: int,
                                ) -> tuple[list[dict], int]:
        """Write spec-shaped POSITION DELETE files for ``matches``
        (columns ``__if_fp``: resolved local path, ``__if_pos``: row
        ordinal): one sorted (file_path, pos) parquet set per partition
        tuple of the files they target, returning the ADDED delete
        manifest entries + tombstone count. Shared by the merge-on-read
        DELETE and UPDATE paths. The hit-file set is derived from the
        checkpointed match rows themselves (r12) — one O(files) collect —
        so callers no longer pre-compute an affected list with a second
        data pass."""
        import pyarrow.parquet as pq

        # resolved local path -> (manifest URI, partition tuple)
        info = {
            str(self._local_data(e["data_file"]["file_path"]).resolve()):
            (e["data_file"]["file_path"],
             e["data_file"].get("partition") or {})
            for e in live
        }
        uri_map = self.spark.createDataFrame(
            [(k, u) for k, (u, _) in info.items()],
            "__if_fp string, file_path string")
        # materialized ONCE: the hit-file collect and the per-tuple writes
        # below re-read blocks, not the match scan
        rows = (matches
                .join(F.broadcast(uri_map), "__if_fp")
                .select("file_path", F.col("__if_pos").alias("pos"))
                .localCheckpoint())
        hit_uris = {
            r["file_path"]
            for r in rows.select("file_path").distinct().collect()
        }
        by_tuple: dict[str, tuple[dict, set[str]]] = {}
        for u, pv in info.values():
            if u not in hit_uris:
                continue
            key = json.dumps(pv, sort_keys=True, default=str)
            by_tuple.setdefault(key, (pv, set()))[1].add(u)
        rel_dir = f"data/mor-delete-{uuid.uuid4().hex[:8]}"
        (self.path / rel_dir).mkdir(parents=True, exist_ok=True)
        location = self.meta["location"].rstrip("/")
        delete_entries: list[dict] = []
        n_deleted, i = 0, 0
        for key in sorted(by_tuple):
            pv, uris = by_tuple[key]
            part_rows = rows.where(F.col("file_path").isin(sorted(uris)))
            tmp = self.path / f".tmp-mor-{uuid.uuid4().hex}"
            (part_rows.repartition("file_path")
             .sortWithinPartitions("file_path", "pos")
             .write.parquet(str(tmp)))
            for part in sorted(tmp.glob("part-*.parquet")):
                md = pq.ParquetFile(part).metadata
                if md.num_rows == 0:
                    part.unlink()
                    continue
                rel = f"{rel_dir}/delete-{i:05d}.parquet"
                i += 1
                os.replace(part, self.path / rel)
                n_deleted += md.num_rows
                delete_entries.append({
                    "status": 1,
                    "snapshot_id": new_id,
                    "sequence_number": seq,
                    "file_sequence_number": seq,
                    "data_file": {
                        "content": 1,
                        "file_path": f"{location}/{rel}",
                        "file_format": "PARQUET",
                        "partition": pv,
                        "record_count": md.num_rows,
                        "file_size_in_bytes":
                            (self.path / rel).stat().st_size,
                        "lower_bounds": None,
                        "upper_bounds": None,
                        "equality_ids": None,
                    },
                })
            shutil.rmtree(tmp, ignore_errors=True)
        if not delete_entries:
            shutil.rmtree(self.path / rel_dir, ignore_errors=True)
        return delete_entries, n_deleted

    def _mor_delete(self, predicate: str, dry_run: bool) -> dict:
        """DELETE, merge-on-read (spec "Position Delete Files"): write
        parquet files of (file_path, pos) naming the matching rows and
        commit them in a DELETE manifest (manifest-list content=1) —
        every live data file relists EXISTING, prior delete manifests
        carry over, NOTHING is rewritten. Write cost is O(matching
        rows) instead of O(affected files' bytes) — at 100 TB a sparse
        DELETE over wide files costs a fraction of COW. Readers (this
        repo's to_df/plan_files, the tail/changelog streams, real
        engines) apply the deletes; `rewrite_data_files` materializes
        them away later. Delete files are written PER PARTITION TUPLE
        of the files they target (real readers prune delete manifests
        by partition) and each is sorted by (file_path, pos) per the
        spec."""
        pctx = self._partition_ctx("DELETE")
        live = self._live_data_entries()
        cur = self.meta.get("current-snapshot-id", -1)
        plan = {"candidate_files": len(live), "rewritten_files": 0,
                "delete_files": 0, "deleted_rows": 0, "snapshot_id": cur}
        if not live:
            return plan
        pred = F.expr(predicate)
        # ONE data pass (r12): plan only the partition/transform-prune
        # half and scan the candidates once — the match rows determine
        # both the hit files and the tombstones; _write_position_deletes
        # drops files with no matching rows itself.
        cand, _exact = self._plan_candidates(pred, pctx, live, predicate)
        if cand is not None and not cand:
            return plan
        logical, ice, phys_of, fid_of_phys, dt_of_phys = self._phys_maps()
        sub = self.to_df(_with_path=True, _with_pos=True, _paths=cand)
        matches = sub.where(pred).select("__if_fp", "__if_pos")
        if dry_run:
            return plan
        new_id, seq = self._next_ids()
        delete_entries, n_deleted = self._write_position_deletes(
            matches, live, new_id, seq)
        if not delete_entries:
            return plan
        entries = [{
            "status": 0,  # every data file stays EXISTING, untouched
            "snapshot_id": e.get("snapshot_id"),
            "sequence_number": e.get("sequence_number"),
            "file_sequence_number": e.get("file_sequence_number"),
            "data_file": e["data_file"],
            "__spec_id": e.get("__spec_id"),
        } for e in live]
        snap = self._snapshot()
        carried = []
        if snap is not None:
            _, ml_rows = read_ocf_bytes(
                self._local(snap["manifest-list"]).read_bytes())
            carried = [r for r in ml_rows
                       if int(r.get("content", 0) or 0) == 1]
        self._commit_snapshot(
            entries, ice, new_id, seq,
            operation="delete",
            summary={
                "added-delete-files": str(len(delete_entries)),
                "added-position-delete-records": str(n_deleted),
                "total-data-files": str(len(live)),
                "lakehouses-delete-mode": "merge-on-read",
                "lakehouses-delete-predicate": predicate,
            },
            carried_ml_rows=carried,
            pctx=pctx,
            delete_entries=delete_entries,
        )
        plan["delete_files"] = len(delete_entries)
        plan["deleted_rows"] = n_deleted
        plan["snapshot_id"] = new_id
        return plan

    def update(self, set: dict[str, str], where: str | None = None,
               dry_run: bool = False, mode: str | None = None) -> dict:
        """UPDATE ... SET on an external Iceberg v2 table. Mode resolves
        from the argument, else the table's `write.update.mode`
        property, else copy-on-write:

        - ``copy-on-write``: affected files rewrite with ``set`` applied
          to matching rows; commits an `overwrite` snapshot. The format
          twin of `DeltaLogReader.update`.
        - ``merge-on-read`` (r12): the OLD row versions tombstone as
          position deletes and the UPDATED rows append as new data files
          in the same snapshot — unmatched rows of affected files are
          never rewritten, so a sparse UPDATE over wide files costs
          O(matching rows), not O(affected files' bytes)."""
        if not set:
            raise ValueError("update() requires at least one SET column")
        mode = mode or (self.meta.get("properties") or {}).get(
            "write.update.mode", "copy-on-write")
        if mode == "merge-on-read":
            return self._mor_update(set, where or "true", dry_run)
        if mode != "copy-on-write":
            raise IcebergFormatError(
                f"unknown write.update.mode {mode!r} (copy-on-write or "
                "merge-on-read)")
        return self._cow_dml("UPDATE", where or "true", set, dry_run)

    def _mor_update(self, set_exprs: dict[str, str], predicate: str,
                    dry_run: bool) -> dict:
        """UPDATE, merge-on-read: ONE scan of the affected files feeds
        both legs (localCheckpoint) — the matching rows' (file, pos)
        write as position deletes, the SET-applied row images write as
        ADDED data files (partition-grouped, so a SET on a partition
        source moves rows to their new partition) — committed as one
        `overwrite` snapshot with every prior data file EXISTING and
        prior delete manifests carried."""
        pctx = self._partition_ctx("UPDATE")
        live = self._live_data_entries()
        cur = self.meta.get("current-snapshot-id", -1)
        plan = {"candidate_files": len(live), "rewritten_files": 0,
                "delete_files": 0, "updated_rows": 0, "snapshot_id": cur}
        if not live:
            return plan
        logical, ice, phys_of, fid_of_phys, dt_of_phys = self._phys_maps()
        names = {f.name for f in logical.fields}
        for c in set_exprs:
            if c not in names:
                raise ValueError(f"unknown SET column {c!r}")
        pred = F.expr(predicate)
        # ONE data pass (r12, same restructure as _mor_delete): the
        # checkpointed match set feeds the tombstones AND the SET-applied
        # images.
        cand, _exact = self._plan_candidates(pred, pctx, live, predicate)
        if cand is not None and not cand:
            return plan
        sub = self.to_df(_with_path=True, _with_pos=True, _paths=cand)
        matches = sub.where(pred)  # analysis validates the predicate
        if dry_run:
            return plan
        matches = matches.localCheckpoint()
        new_id, seq = self._next_ids()
        delete_entries, n_updated = self._write_position_deletes(
            matches.select("__if_fp", "__if_pos"),
            live, new_id, seq)
        if not delete_entries:
            return plan
        upd = matches.select(*[
            F.expr(set_exprs[f.name]).cast(f.dataType).alias(f.name)
            if f.name in set_exprs else F.col(f.name)
            for f in logical.fields
        ])
        for f in logical.fields:  # files store PHYSICAL names
            if phys_of[f.name] != f.name:
                upd = upd.withColumnRenamed(f.name, phys_of[f.name])
        new_rels = self._write_cow_files(upd, "update", pctx=pctx)
        entries = self._added_entries(
            new_rels, new_id, seq, fid_of_phys, dt_of_phys)
        n_added = len(entries)
        for e in live:
            entries.append({
                "status": 0,  # every prior data file stays EXISTING
                "snapshot_id": e.get("snapshot_id"),
                "sequence_number": e.get("sequence_number"),
                "file_sequence_number": e.get("file_sequence_number"),
                "data_file": e["data_file"],
                "__spec_id": e.get("__spec_id"),
            })
        snap = self._snapshot()
        carried = []
        if snap is not None:
            _, ml_rows = read_ocf_bytes(
                self._local(snap["manifest-list"]).read_bytes())
            carried = [r for r in ml_rows
                       if int(r.get("content", 0) or 0) == 1]
        self._commit_snapshot(
            entries, ice, new_id, seq,
            operation="overwrite",
            summary={
                "added-data-files": str(n_added),
                "added-delete-files": str(len(delete_entries)),
                "added-position-delete-records": str(n_updated),
                "total-data-files": str(len(live) + n_added),
                "lakehouses-update-mode": "merge-on-read",
                "lakehouses-update-predicate": predicate,
            },
            carried_ml_rows=carried,
            pctx=pctx,
            delete_entries=delete_entries,
        )
        plan["delete_files"] = len(delete_entries)
        plan["updated_rows"] = n_updated
        plan["added_files"] = n_added
        plan["snapshot_id"] = new_id
        return plan

    def _schema_add_columns(self, new_cols: list[tuple[str, Any]]) -> None:
        """Evolve the IN-MEMORY metadata with appended optional columns —
        fresh field ids, a new schema entry (old schemas stay for
        time-travel reads), current-schema-id bumped, name-mapping
        extended. Nothing touches disk until the caller's
        `_commit_metadata`, so the evolution and the data commit land as
        ONE metadata write (Iceberg's add-column + append transaction)."""
        meta = self.meta
        ice = next(s for s in meta["schemas"]
                   if s["schema-id"] == meta["current-schema-id"])
        last_id = int(meta.get(
            "last-column-id", max(f["id"] for f in ice["fields"])))
        fields = list(ice["fields"])
        mapping = json.loads((meta.get("properties") or {}).get(
            "schema.name-mapping.default", "[]"))
        for name, dt in new_cols:
            ice_t = _spark_type_to_iceberg(dt, lambda p: 0)
            if isinstance(ice_t, dict):
                raise IcebergFormatError(
                    f"merge_schema append: column {name!r} has a nested "
                    "type — external evolution supports primitives only"
                )
            last_id += 1
            fields.append({"id": last_id, "name": name,
                           "required": False, "type": ice_t})
            mapping.append({"field-id": last_id, "names": [name]})
        new_schema = {
            "schema-id": max(s["schema-id"] for s in meta["schemas"]) + 1,
            "type": "struct",
            "fields": fields,
        }
        meta["schemas"] = list(meta["schemas"]) + [new_schema]
        meta["current-schema-id"] = new_schema["schema-id"]
        meta["last-column-id"] = last_id
        props = dict(meta.get("properties") or {})
        props["schema.name-mapping.default"] = json.dumps(mapping)
        meta["properties"] = props

    def append(self, df: DataFrame, merge_schema: bool = False) -> dict:
        """Blind APPEND to an external Iceberg table — the format twin
        of `DeltaLogReader.append`: commit an `append` snapshot whose
        manifest lists the new files ADDED and every live file EXISTING
        at its original sequence number; live delete manifests carry
        over untouched. Values cast to the table schema; absent nullable
        columns fill null; absent required columns refuse. Extra columns
        refuse unless ``merge_schema``: the commit then carries a NEW
        schema (fresh field ids, old schemas retained for time travel) in
        the same metadata write. Identity-partitioned tables write one
        file group per tuple."""
        pctx = self._partition_ctx("APPEND")
        logical, ice, phys_of, fid_of_phys, dt_of_phys = self._phys_maps()
        names = {f.name for f in logical.fields}
        extra = [c for c in df.columns if c not in names]
        if extra and not merge_schema:
            raise IcebergFormatError(
                f"append columns {extra} are not in the table schema; "
                "pass merge_schema=True to evolve it"
            )
        if extra:
            self._schema_add_columns(
                [(c, df.schema[c].dataType) for c in extra])
            logical, ice, phys_of, fid_of_phys, dt_of_phys = \
                self._phys_maps()
        required = [f.name for f in logical.fields
                    if f.name not in df.columns and not f.nullable]
        if required:
            raise IcebergFormatError(
                f"append is missing required column(s) {required}"
            )
        out = df.select(*[
            (F.col(f.name).cast(f.dataType) if f.name in df.columns
             else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in logical.fields
        ])
        for f in logical.fields:  # files store PHYSICAL names
            if phys_of[f.name] != f.name:
                out = out.withColumnRenamed(f.name, phys_of[f.name])
        new_rels = self._write_cow_files(out, "append", pctx=pctx)
        new_id, seq = self._next_ids()
        entries = self._added_entries(
            new_rels, new_id, seq, fid_of_phys, dt_of_phys)
        n_added = len(entries)
        live = self._live_data_entries()
        for e in live:
            entries.append({
                "status": 0,  # EXISTING
                "snapshot_id": e.get("snapshot_id"),
                "sequence_number": e.get("sequence_number"),
                "file_sequence_number": e.get("file_sequence_number"),
                "data_file": e["data_file"],
                "__spec_id": e.get("__spec_id"),
            })
        snap = self._snapshot()
        carried = []
        if snap is not None:
            _, ml_rows = read_ocf_bytes(
                self._local(snap["manifest-list"]).read_bytes())
            carried = [
                r for r in ml_rows if int(r.get("content", 0) or 0) == 1
            ]
        self._commit_snapshot(
            entries, ice, new_id, seq,
            operation="append",
            summary={
                "added-data-files": str(n_added),
                "deleted-data-files": "0",
                "total-data-files": str(len(live) + n_added),
            },
            carried_ml_rows=carried,
            pctx=pctx,
        )
        return {"snapshot_id": new_id, "added_files": n_added}

    def overwrite(self, df: DataFrame,
                  replace_where: str | None = None) -> dict:
        """INSERT OVERWRITE on an external Iceberg v2 table, ONE
        `overwrite` snapshot (readers never observe an empty table):

        - ``replace_where=None``: every live file DELETED, ``df``'s
          files ADDED — the table's contents become exactly ``df``.
        - ``replace_where``: the dynamic form — rows matching the
          predicate delete (affected files rewrite without them, planned
          with the same partition/transform pruning as DELETE) and
          ``df`` appends; every written row must satisfy the predicate
          or the write refuses (so the replaced region and the new data
          cover the same slice — Spark's INSERT OVERWRITE ... WHERE /
          Delta replaceWhere semantics).

        100 TB shape: planning is driver-side manifest arithmetic +
        at most one restricted scan of the affected files; untouched
        files stay EXISTING at their sequence numbers."""
        pctx = self._partition_ctx("OVERWRITE")
        logical, ice, phys_of, fid_of_phys, dt_of_phys = self._phys_maps()
        names = {f.name for f in logical.fields}
        extra = [c for c in df.columns if c not in names]
        if extra:
            raise IcebergFormatError(
                f"overwrite columns {extra} are not in the table schema")
        required = [f.name for f in logical.fields
                    if f.name not in df.columns and not f.nullable]
        if required:
            raise IcebergFormatError(
                f"overwrite is missing required column(s) {required}")
        out = df.select(*[
            (F.col(f.name).cast(f.dataType) if f.name in df.columns
             else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in logical.fields
        ])
        live = self._live_data_entries()
        pred = F.expr(replace_where) if replace_where else None
        if pred is not None:
            bad = out.where(~pred.eqNullSafe(F.lit(True))).count()
            if bad:
                raise IcebergFormatError(
                    f"{bad} overwrite row(s) do not satisfy "
                    f"replace_where {replace_where!r}")
            affected = (self._plan_affected(pred, pctx, live,
                                            replace_where)
                        if live else set())
        else:
            affected = {
                str(self._local_data(
                    e["data_file"]["file_path"]).resolve())
                for e in live
            }
        kept = None
        if pred is not None and affected:
            sub = self.to_df(_with_path=True, _paths=set(affected))
            kept = sub.where(~pred.eqNullSafe(F.lit(True))).drop("__if_fp")
        for f in logical.fields:  # files store PHYSICAL names
            if phys_of[f.name] != f.name:
                out = out.withColumnRenamed(f.name, phys_of[f.name])
                if kept is not None:
                    kept = kept.withColumnRenamed(f.name, phys_of[f.name])
        new_rows = out if kept is None else kept.unionByName(out)
        new_rels = self._write_cow_files(new_rows, "overwrite", pctx=pctx)
        new_id, seq = self._next_ids()
        entries = self._added_entries(
            new_rels, new_id, seq, fid_of_phys, dt_of_phys)
        n_added = len(entries)
        n_deleted = 0
        for e in live:
            ap = str(self._local_data(
                e["data_file"]["file_path"]).resolve())
            is_affected = ap in affected
            n_deleted += is_affected
            entries.append({
                "status": 2 if is_affected else 0,  # DELETED / EXISTING
                "snapshot_id": new_id if is_affected
                else e.get("snapshot_id"),
                "sequence_number": e.get("sequence_number"),
                "file_sequence_number": e.get("file_sequence_number"),
                "data_file": e["data_file"],
                "__spec_id": e.get("__spec_id"),
            })
        # delete manifests carry over like the COW DML: position deletes
        # bind old paths (inert once those files are DELETED), equality
        # deletes bind by sequence number (< the new files' seq)
        snap = self._snapshot()
        carried = []
        if snap is not None:
            _, ml_rows = read_ocf_bytes(
                self._local(snap["manifest-list"]).read_bytes())
            carried = [r for r in ml_rows
                       if int(r.get("content", 0) or 0) == 1]
        self._commit_snapshot(
            entries, ice, new_id, seq,
            operation="overwrite",
            summary={
                "added-data-files": str(n_added),
                "deleted-data-files": str(n_deleted),
                "total-data-files": str(len(live) - n_deleted + n_added),
                "lakehouses-replace-where": replace_where or "true",
            },
            carried_ml_rows=carried,
            pctx=pctx,
        )
        return {"snapshot_id": new_id, "added_files": n_added,
                "deleted_files": n_deleted}

    def update_spec(self, partition_by: list[str] | None) -> dict:
        """PARTITION EVOLUTION (spec "Partition Evolution" / Spark's
        `ALTER TABLE ... ADD/REPLACE PARTITION FIELD`): REPLACE the
        default partition spec with one built from the CTAS spellings
        (identity / YEAR(col) / bucket(16, col) / truncate(4, col));
        None or [] evolves to unpartitioned. METADATA-ONLY — no data
        moves: existing files keep their spec (their manifests already
        declare it), new writes group under the new one, and every
        commit relists old-spec entries in per-spec manifests (a
        manifest has exactly one spec). Field-ids continue from
        last-partition-id; a field keeping the same (source, transform)
        keeps its id, so its stored tuples stay addressable."""
        logical = self.schema()
        dtype_of = {f.name: f.dataType for f in logical.fields}
        part = parse_partition_by(partition_by, dtype_of)
        meta = json.loads(json.dumps(self.meta))  # deep copy
        specs = list(meta.get("partition-specs") or
                     [{"spec-id": 0, "fields": []}])
        ice = next(s for s in meta["schemas"]
                   if s["schema-id"] == meta["current-schema-id"])
        top_id = {f["name"]: f["id"] for f in ice["fields"]}
        # reuse field-ids for (source, transform) pairs any existing
        # spec already names; mint fresh ones past last-partition-id
        known: dict[tuple[int, str], int] = {}
        last_pid = int(meta.get("last-partition-id", 999))
        for s in specs:
            for f in s.get("fields") or []:
                known[(f["source-id"], f["transform"])] = f["field-id"]
                last_pid = max(last_pid, int(f.get("field-id", 0)))
        fields = []
        for tr, c in part:
            key = (top_id[c], tr)
            if key in known:
                fid = known[key]
            else:
                last_pid += 1
                fid = last_pid
            fields.append({"name": spec_field_name(tr, c),
                           "transform": tr, "source-id": top_id[c],
                           "field-id": fid})
        cur = next(s for s in specs
                   if s["spec-id"] == meta.get("default-spec-id", 0))
        if cur.get("fields") == fields:
            return {"spec_id": cur["spec-id"], "changed": False}
        new_sid = max(s["spec-id"] for s in specs) + 1
        specs.append({"spec-id": new_sid, "fields": fields})
        meta["partition-specs"] = specs
        meta["default-spec-id"] = new_sid
        meta["last-partition-id"] = last_pid
        new_v = self._commit_metadata(meta)
        return {"spec_id": new_sid, "changed": True,
                "metadata_version": new_v}

    def set_properties(self, props: dict[str, str | None]) -> dict:
        """ALTER TABLE SET TBLPROPERTIES on an external Iceberg table: a
        METADATA-ONLY new metadata version (no snapshot) merging
        ``props`` into the table properties — a None value unsets the
        key (UNSET TBLPROPERTIES). The write plane itself honors
        properties like `write.delete.mode` on the next DML."""
        self._partition_ctx("SET TBLPROPERTIES")  # refuses unknown spec
        meta = json.loads(json.dumps(self.meta))  # deep copy
        properties = dict(meta.get("properties") or {})
        for k, v in props.items():
            if v is None:
                properties.pop(k, None)
            else:
                properties[k] = str(v)
        meta["properties"] = properties
        new_v = self._commit_metadata(meta)
        return {"metadata_version": new_v,
                "properties": len(properties)}

    def merge(
        self,
        source: DataFrame,
        on: str,
        when_matched_update: dict[str, str] | str | None = "all",
        when_not_matched_insert: dict[str, str] | str | None = "all",
        when_matched_delete: bool = False,
        schema_evolution: bool = False,
    ) -> dict:
        """MERGE INTO on an external Iceberg v2 table, copy-on-write —
        the format twin of `DeltaLogReader.merge` with the identical
        clause surface (the shared `merge_rewritten`/`merge_inserts`
        helpers compute both): `on` references columns as t.<col> /
        s.<col>; only files containing matched rows rewrite, inserts
        append as new files, and multiple source rows matching one
        target row with an update clause raise. A source with columns
        beyond the table schema refuses unless ``schema_evolution``
        (VERDICT r11 #4): the same metadata write then carries a NEW
        schema — fresh field ids, old schemas retained for time travel,
        untouched files read the new columns as NULL (reference
        evolution arc 03.iceberg_primer.py:232). Commits one `overwrite`
        snapshot: rewritten+inserted files ADDED, matched files DELETED,
        untouched files EXISTING at their original sequence numbers,
        live delete manifests carried (reference DML arc
        03.iceberg_primer.py:203-215).

        100 TB shape: matched-file planning is one distributed semi-join
        keyed by `_metadata.file_path`; the rewrite touches only matched
        files and the insert set — O(affected + inserts), never the
        table."""
        from lakehouses_spark.tables.delta_log import (
            merge_dup_match_check,
            merge_insert_required_check,
            merge_inserts,
            merge_rewritten,
            merge_widen,
        )

        pctx = self._partition_ctx("MERGE")
        live = self._live_data_entries()
        logical, ice, phys_of, fid_of_phys, dt_of_phys = self._phys_maps()
        names = [f.name for f in logical.fields]
        extra = [c for c in source.columns if c not in names]
        if extra and not schema_evolution:
            raise IcebergFormatError(
                f"MERGE source columns {extra} are not in the table "
                "schema; pass schema_evolution=True to evolve it"
            )
        widen_dtype = {c: source.schema[c].dataType for c in extra}
        names = names + extra

        def widen(df: DataFrame) -> DataFrame:
            return merge_widen(df, extra, widen_dtype)

        cond = F.expr(on)
        src = source.alias("s")
        t = self.to_df(_with_path=True).alias("t")
        affected = {
            r["__if_fp"] for r in
            t.join(src, cond, "inner")
            .select(F.col("t.__if_fp").alias("__if_fp"))
            .distinct().collect()
        }
        plan = {"candidate_files": len(live),
                "rewritten_files": len(affected),
                "snapshot_id": self.meta.get("current-snapshot-id", -1)}
        dtype_of = {
            f.name: f.dataType for f in logical.fields} | widen_dtype
        out_parts: list[DataFrame] = []
        if affected:
            # both rewrite-side reads list and scan ONLY the matched files
            sub = widen(self.to_df(
                _with_path=True, _paths=set(affected))).alias("t")
            if when_matched_update and not when_matched_delete:
                t_chk = (
                    self.to_df(_with_path=True, _paths=set(affected))
                    .withColumn("__tid__", F.monotonically_increasing_id())
                    .alias("t")
                )
                if merge_dup_match_check(t_chk, src, cond):
                    raise IcebergFormatError(
                        "MERGE: multiple source rows matched the same "
                        "target row with an update clause; dedupe the "
                        "source on the merge key first"
                    )
            out_parts.append(merge_rewritten(
                sub, src, cond, names, dtype_of, source.columns,
                when_matched_update, when_matched_delete,
            ))
        n_inserted = 0
        if when_not_matched_insert:
            merge_insert_required_check(
                logical.fields, source.columns, when_not_matched_insert,
                IcebergFormatError)
            ins = merge_inserts(
                src, self.to_df().alias("t"), cond, names, dtype_of,
                source.columns, when_not_matched_insert,
            )
            # single-pass insert leg (VERDICT r11): materialize the
            # whole-table anti-join once; count + COW write read blocks
            ins = ins.localCheckpoint()
            n_inserted = ins.count()
            if n_inserted:
                out_parts.append(ins)
        plan["inserted_rows"] = n_inserted
        if not affected and not n_inserted:
            return plan
        if extra:
            # evolve ONLY when the merge actually commits (the in-memory
            # metadata mutation lands with this snapshot's single
            # metadata write); refresh the id/physical maps so the new
            # columns get fresh field ids in bounds and manifests
            self._schema_add_columns(
                [(c, widen_dtype[c]) for c in extra])
            logical, ice, phys_of, fid_of_phys, dt_of_phys = \
                self._phys_maps()
        new_rows = out_parts[0]
        for p in out_parts[1:]:
            new_rows = new_rows.unionByName(p)
        for f in logical.fields:  # files store PHYSICAL names
            if phys_of[f.name] != f.name:
                new_rows = new_rows.withColumnRenamed(
                    f.name, phys_of[f.name])
        new_rels = self._write_cow_files(new_rows, "merge", pctx=pctx)
        new_id, seq = self._next_ids()
        entries = self._added_entries(
            new_rels, new_id, seq, fid_of_phys, dt_of_phys)
        n_added = len(entries)
        n_deleted = 0
        for e in live:
            ap = str(self._local_data(
                e["data_file"]["file_path"]).resolve())
            is_affected = ap in affected
            n_deleted += is_affected
            entries.append({
                "status": 2 if is_affected else 0,
                "snapshot_id": new_id if is_affected
                else e.get("snapshot_id"),
                "sequence_number": e.get("sequence_number"),
                "file_sequence_number": e.get("file_sequence_number"),
                "data_file": e["data_file"],
                "__spec_id": e.get("__spec_id"),
            })
        snap = self._snapshot()
        carried = []
        if snap is not None:
            _, ml_rows = read_ocf_bytes(
                self._local(snap["manifest-list"]).read_bytes())
            carried = [
                r for r in ml_rows if int(r.get("content", 0) or 0) == 1
            ]
        self._commit_snapshot(
            entries, ice, new_id, seq,
            operation="overwrite",
            summary={
                "added-data-files": str(n_added),
                "deleted-data-files": str(n_deleted),
                "total-data-files": str(len(live) - n_deleted + n_added),
                "lakehouses-merge-on": on,
            },
            carried_ml_rows=carried,
            pctx=pctx,
        )
        plan["snapshot_id"] = new_id
        return plan

    def rollback_to_snapshot(self, snapshot_id: int) -> dict:
        """Iceberg's `rollback_to_snapshot` procedure (Spark SQL `CALL
        catalog.system.rollback_to_snapshot(...)`) — the format-parity
        twin of `DeltaLogReader.restore`: a METADATA-ONLY re-point of
        `current-snapshot-id` (and the main branch ref) to an ANCESTOR
        of the current snapshot. No manifest or data file is touched;
        rolling forward again via `set_current_snapshot` keeps working
        because abandoned snapshots stay in the metadata until
        `expire_snapshots`."""
        snaps = {s["snapshot-id"]: s
                 for s in self.meta.get("snapshots") or []}
        if snapshot_id not in snaps:
            raise IcebergFormatError(f"unknown snapshot {snapshot_id}")
        cur = self.meta.get("current-snapshot-id", -1)
        anc = set()
        sid = cur
        while sid in snaps:
            anc.add(sid)
            sid = snaps[sid].get("parent-snapshot-id")
        if snapshot_id not in anc:
            raise IcebergFormatError(
                f"snapshot {snapshot_id} is not an ancestor of the "
                f"current snapshot {cur}; use set_current_snapshot for "
                "non-linear re-points"
            )
        return self._repoint(snapshot_id, cur)

    def set_current_snapshot(self, snapshot_id: int) -> dict:
        """Iceberg's `set_current_snapshot` procedure: re-point the table
        to ANY retained snapshot (no ancestry requirement) — the
        roll-forward companion to `rollback_to_snapshot`."""
        snaps = {s["snapshot-id"]: s
                 for s in self.meta.get("snapshots") or []}
        if snapshot_id not in snaps:
            raise IcebergFormatError(f"unknown snapshot {snapshot_id}")
        return self._repoint(
            snapshot_id, self.meta.get("current-snapshot-id", -1))

    def _repoint(self, snapshot_id: int, prev: int) -> dict:
        import time as _time

        meta = dict(self.meta)
        meta["current-snapshot-id"] = snapshot_id
        meta["snapshot-log"] = list(
            self.meta.get("snapshot-log") or []) + [{
                "timestamp-ms": int(_time.time() * 1000),
                "snapshot-id": snapshot_id,
            }]
        refs = dict(meta.get("refs") or {})
        if "main" in refs:
            refs["main"] = {**refs["main"], "snapshot-id": snapshot_id}
        meta["refs"] = refs
        self._commit_metadata(meta)
        return {"rolled_back_to": snapshot_id, "previous": prev}

    def _plan_affected(self, pred, pctx: dict | None,
                       live: list[dict],
                       predicate_sql: str | None = None) -> set[str]:
        """Absolute local paths of the live files holding rows where
        ``pred`` is TRUE. Under an identity spec, a predicate that
        references ONLY the partition source columns plans from the
        manifest partition tuples — classic partition pruning, zero data
        read (every row of a file shares its tuple). A MIXED predicate
        (r12) prunes candidates first — by its partition-only top-level
        AND conjuncts on identity tuples, and/or by enumerating a
        date-family transform tuple's finite date domain — then runs the
        exact scan over the candidates only. Only a predicate with no
        evaluable conjunct falls back to the full one-pass scan keyed by
        `_metadata.file_path`."""
        cand, exact = self._plan_candidates(pred, pctx, live, predicate_sql)
        if exact:
            return cand
        if cand is not None and not cand:
            return set()
        df = self.to_df(_with_path=True, _paths=cand)
        return {
            r["__if_fp"] for r in
            df.where(pred).select("__if_fp").distinct().collect()
        }

    def _plan_candidates(self, pred, pctx: dict | None,
                         live: list[dict],
                         predicate_sql: str | None = None,
                         ) -> tuple[set[str] | None, bool]:
        """Partition/transform-pruning half of `_plan_affected` (r12,
        shared with the one-pass merge-on-read verbs): (candidate
        absolute paths, exact). ``exact`` means the predicate was
        identity-tuple-only and the set IS the affected list (zero data
        read); ``None`` candidates mean nothing was evaluable
        driver-side (scan everything)."""
        from lakehouses_spark.tables.delta_log import (
            _quiet_analysis_probe,
            conjunct_candidates,
        )

        # driver-side tuple planning covers IDENTITY fields directly:
        # their tuple value IS the source-column value
        id_fields = [f for f in (pctx or {}).get("fields", [])
                     if f.get("transform") == "identity"]
        cand: set[str] | None = None
        if id_fields:
            import datetime

            rows = []
            complete = True
            for e in live:
                part = e["data_file"].get("partition") or {}
                vals = []
                for f in id_fields:
                    if f["pname"] not in part:
                        complete = False  # sloppy foreign manifest: scan
                        break
                    v = part[f["pname"]]
                    if f["dt"].typeName() == "date" and v is not None:
                        v = (datetime.date(1970, 1, 1)
                             + datetime.timedelta(days=int(v)))
                    vals.append(v)
                if not complete:
                    break
                rows.append((
                    str(self._local_data(
                        e["data_file"]["file_path"]).resolve()),
                    *vals,
                ))
            if complete:
                schema = T.StructType(
                    [T.StructField("__if_fp", T.StringType())]
                    + [T.StructField(f["src_name"], f["dt"])
                       for f in id_fields]
                )
                tuples = self.spark.createDataFrame(rows, schema)

                def tuple_hits(expr) -> set[str] | None:
                    try:
                        with _quiet_analysis_probe():
                            # analysis raises if the expression touches
                            # any data column -> no constraint
                            return {r["__if_fp"] for r in
                                    tuples.where(expr)
                                    .select("__if_fp").collect()}
                    except Exception:
                        return None

                hit, exact = conjunct_candidates(
                    tuple_hits, pred, predicate_sql)
                if exact:
                    # tuple-exact: every row shares its tuple
                    return hit, True
                cand = hit
        # date-family transform specs: prune candidates by enumerating
        # each tuple's finite date domain (sound superset), then run the
        # exact scan over the candidates only — O(partition), not O(table)
        cand_tr = self._transform_candidates(pred, pctx, live,
                                             predicate_sql)
        if cand_tr is not None:
            cand = cand_tr if cand is None else cand & cand_tr
        # bucket/truncate specs: prune by mapping literal-comparison
        # conjuncts through the transform driver-side (sound superset)
        cand_bt = self._bucket_truncate_candidates(pctx, live,
                                                   predicate_sql)
        if cand_bt is not None:
            cand = cand_bt if cand is None else cand & cand_bt
        return cand, False

    # days a tuple of each enumerable transform can span (year: leap)
    _ENUM_CAP_ROWS = 250_000

    def _transform_candidates(self, pred, pctx: dict | None,
                              live: list[dict],
                              predicate_sql: str | None = None,
                              ) -> set[str] | None:
        """Candidate files for a DML predicate on a DATE-source
        year/month/day transform spec (r12): a transform tuple cannot
        answer a source-column predicate directly, but its DATE DOMAIN
        is finite and small (year ≤ 366 days, month ≤ 31, day = 1) — so
        enumerate each DISTINCT tuple's domain, evaluate the predicate
        driver-side over (domain date, identity values), and keep the
        files whose tuple COULD hold a matching row. Sound superset
        pruning: the domain covers every value a file's rows can take;
        the caller still runs the exact scan over the candidates.
        Returns None when not applicable (no/multiple transform fields,
        timestamp source, incomplete or null tuples, predicate touches
        other data columns) — the caller then scans everything."""
        import calendar
        import datetime

        fields = (pctx or {}).get("fields") or []
        trs = [f for f in fields if f["transform"] != "identity"]
        if len(trs) != 1:
            return None
        tf = trs[0]
        if (tf["transform"] not in ("year", "month", "day")
                or tf["dt"].typeName() != "date"):
            return None
        names = [f["src_name"] for f in fields]
        if len(set(names)) != len(names):
            return None
        ti = fields.index(tf)
        combos: dict[tuple, list[str]] = {}
        for e in live:
            part = e["data_file"].get("partition") or {}
            if any(f["pname"] not in part for f in fields):
                return None  # sloppy foreign manifest: scan
            key = tuple(part[f["pname"]] for f in fields)
            if key[ti] is None:
                return None  # null transform tuple: can't enumerate
            combos.setdefault(key, []).append(
                str(self._local_data(
                    e["data_file"]["file_path"]).resolve()))

        epoch = datetime.date(1970, 1, 1)

        def domain(ordinal: int) -> list[datetime.date]:
            o = int(ordinal)
            if tf["transform"] == "day":
                return [epoch + datetime.timedelta(days=o)]
            if tf["transform"] == "month":
                y, m = 1970 + (o // 12), (o % 12) + 1
                return [datetime.date(y, m, d + 1)
                        for d in range(calendar.monthrange(y, m)[1])]
            y = 1970 + o
            start = datetime.date(y, 1, 1).toordinal()
            return [datetime.date.fromordinal(start + d)
                    for d in range(366 if calendar.isleap(y) else 365)]

        rows, keys = [], list(combos)
        for i, key in enumerate(keys):
            for d in domain(key[ti]):
                vals = list(key)
                # identity values keep their typed decode from the tuple
                for j, f in enumerate(fields):
                    if j != ti and f["dt"].typeName() == "date" \
                            and vals[j] is not None:
                        vals[j] = epoch + datetime.timedelta(
                            days=int(vals[j]))
                vals[ti] = d
                rows.append((i, *vals))
                if len(rows) > self._ENUM_CAP_ROWS:
                    return None  # domain blew the driver budget: scan
        schema = T.StructType(
            [T.StructField("__lh_combo__", T.IntegerType())]
            + [T.StructField(
                f["src_name"],
                f["dt"] if i != ti else T.DateType())
               for i, f in enumerate(fields)]
        )
        from lakehouses_spark.tables.delta_log import (
            _quiet_analysis_probe,
            conjunct_candidates,
        )

        frame = self.spark.createDataFrame(rows, schema)

        def combos_hit(expr) -> set[int] | None:
            try:
                with _quiet_analysis_probe():
                    return {r["__lh_combo__"] for r in
                            frame.where(expr).select("__lh_combo__")
                            .distinct().collect()}
            except Exception:
                return None  # references data columns: no constraint

        # NOTE: even the whole-predicate hit is a SUPERSET here, not
        # exact — a file's rows cover only part of its tuple's domain —
        # so exact=True changes nothing for this caller
        hit, _ = conjunct_candidates(combos_hit, pred, predicate_sql)
        if hit is None:
            return None
        out: set[str] = set()
        for i in hit:
            out.update(combos[keys[i]])
        return out

    def _bucket_truncate_candidates(self, pctx: dict | None,
                                    live: list[dict],
                                    predicate_sql: str | None,
                                    ) -> set[str] | None:
        """Candidate files for a DML predicate over a bucket[N] /
        truncate[W] spec (the transforms whose source domain per tuple
        is NOT enumerable): map literal-comparison top-level conjuncts
        through the transform driver-side and keep the files whose
        tuple could hold a matching row. Sound superset — a row
        matching the whole predicate satisfies every top-level conjunct
        (split_top_level_and returns the predicate WHOLE under a
        top-level OR), `col = lit` forces the file's bucket/truncate
        value to equal transform(lit), and for order-preserving
        int/long truncate a range conjunct bounds the tuple's covered
        interval [t, t+W-1]. NULL tuples are excluded: a NULL source
        value never satisfies a comparison. Literal/type mismatches,
        casts, functions — anything the conservative parser does not
        fully recognize — contribute NO constraint, never a wrong
        prune. None = no constraint (caller scans)."""
        if not predicate_sql or not pctx:
            return None
        from lakehouses_spark.tables.delta_log import conjunct_candidates
        from lakehouses_spark.tables.iceberg_transforms import (
            parse_col_op_literal,
            parse_spec_transform,
            py_bucket,
            py_truncate,
        )

        bt_fields = [
            (f, bt) for f in pctx["fields"]
            if (bt := parse_spec_transform(f["transform"])) is not None
        ]
        if not bt_fields:
            return None
        tuples: list[tuple[str, dict]] = []
        for e in live:
            part = e["data_file"].get("partition") or {}
            vals = {}
            for f, _ in bt_fields:
                if f["pname"] not in part:
                    return None  # sloppy foreign manifest: no pruning
                vals[f["src_name"]] = part[f["pname"]]
            tuples.append((
                str(self._local_data(
                    e["data_file"]["file_path"]).resolve()),
                vals,
            ))
        by_col: dict[str, tuple[dict, tuple[str, int]]] = {}
        for f, bt in bt_fields:
            by_col[f["src_name"]] = (f, bt)
            by_col.setdefault(f["phys"], (f, bt))

        import datetime as _dt

        def lit_ok(v: Any, tname: str) -> bool:
            if tname in ("integer", "long", "short", "byte"):
                return isinstance(v, int) and not isinstance(v, bool)
            if tname == "string":
                return isinstance(v, str)
            if tname == "date":
                return isinstance(v, _dt.date)
            return False

        def conj_hits(expr) -> set[str] | None:
            """hits_fn for conjunct_candidates: evaluates STRING
            conjuncts only (the Column probe returns None)."""
            if not isinstance(expr, str):
                return None
            parsed = parse_col_op_literal(expr)
            if parsed is None:
                return None
            col, op, lits = parsed
            ent = by_col.get(col)
            if ent is None:
                return None
            f, (kind, param) = ent
            tname = f["dt"].typeName()
            if not all(lit_ok(v, tname) for v in lits):
                return None
            hit: set[str] = set()
            if kind == "bucket":
                if op not in ("=", "in"):
                    return None
                targets = {py_bucket(v, f["dt"], param) for v in lits}
                if None in targets:
                    return None
                for fp, vals in tuples:
                    if vals[f["src_name"]] in targets:
                        hit.add(fp)
            elif tname == "string":
                if op not in ("=", "in"):
                    return None
                targets = {py_truncate(v, f["dt"], param) for v in lits}
                for fp, vals in tuples:
                    if vals[f["src_name"]] in targets:
                        hit.add(fp)
            else:  # truncate over int/long: order-preserving
                if op in ("=", "in"):
                    targets = {py_truncate(v, f["dt"], param)
                               for v in lits}
                    keep = lambda t: t in targets  # noqa: E731
                else:
                    v = lits[0]
                    keep = {
                        "<": lambda t: t < v,
                        "<=": lambda t: t <= v,
                        ">": lambda t: t + param - 1 > v,
                        ">=": lambda t: t + param - 1 >= v,
                    }[op]
                for fp, vals in tuples:
                    t = vals[f["src_name"]]
                    if t is not None and keep(t):
                        hit.add(fp)
            return hit

        hit, _ = conjunct_candidates(conj_hits, None, predicate_sql)
        return hit

    def _partition_ctx(self, op: str) -> dict | None:
        """Write context for the table's CURRENT partition spec (VERDICT
        r10 #2): None when unpartitioned; otherwise everything the write
        plane needs per field — the Column expression computing the
        partition value from the source column (physical name), the
        value's Spark/Avro types for the typed partition record, and the
        spec JSON for the manifest header — so commits publish the SAME
        spec the table declares instead of the spec-[] hazard. IDENTITY,
        the date family (year/month/day/hour — the reference's own
        `PARTITIONED BY (YEAR(fecha_ingreso))` spec,
        03.iceberg_primer.py:124; VERDICT r11 #3), and — since the
        spec-vector-verified murmur3 in iceberg_transforms.py —
        `bucket[N]` (int/long/date/timestamp/string/binary sources) and
        `truncate[W]` (int/long/string) are supported. Remaining
        refusals: bucket/truncate over types whose serialization this
        writer does not carry (decimal/uuid/ntz), void, and any unknown
        transform — a wrong tuple is silent data loss for every other
        engine, so unknowns never guess."""
        spec_id = self.meta.get("default-spec-id", 0)
        spec = next(
            (s for s in (self.meta.get("partition-specs") or [])
             if s.get("spec-id") == spec_id), None,
        )
        fields = (spec or {}).get("fields") or []
        if not fields:
            return None
        ice = next(
            s for s in self.meta["schemas"]
            if s["schema-id"] == self.meta["current-schema-id"]
        )
        by_id = {f["id"]: f for f in ice["fields"]}
        mapping = self.name_mapping()
        out = []
        from lakehouses_spark.tables.iceberg_transforms import (
            bucket_col,
            parse_spec_transform,
            truncate_col,
        )

        for pf in fields:
            tr = (pf.get("transform") or "").lower()
            bt = parse_spec_transform(tr)
            if tr != "identity" and tr not in _DATE_TRANSFORMS \
                    and bt is None:
                raise IcebergFormatError(
                    f"{op} on a partitioned external Iceberg table with "
                    f"transform {pf.get('transform')!r} is not supported "
                    "(identity, year/month/day/hour, bucket[N], "
                    "truncate[W] only — an unknown transform risks "
                    "wrong partition tuples)"
                )
            src = by_id.get(pf.get("source-id"))
            if src is None or isinstance(src.get("type"), dict):
                raise IcebergFormatError(
                    f"{op}: partition field {pf.get('name')!r} has no "
                    "resolvable primitive source column"
                )
            dt = _iceberg_type_to_spark(src["type"])
            phys = mapping.get(src["id"], src["name"])
            if tr == "identity":
                pcol, vdt = F.col(phys), dt
            elif bt is not None:
                kind, param = bt
                if kind == "bucket":
                    pcol = bucket_col(F.col(phys), dt, param)
                    vdt = T.IntegerType()
                else:
                    pcol = truncate_col(F.col(phys), dt, param)
                    vdt = T.LongType() if dt.typeName() == "long" else (
                        T.StringType() if dt.typeName() == "string"
                        else T.IntegerType())
                if pcol is None:
                    raise IcebergFormatError(
                        f"{op}: partition transform {tr!r} over source "
                        f"type {src['type']!r} is not supported for "
                        "external writes (serialization not carried)"
                    )
            else:
                pcol = _transform_col(tr, F.col(phys), dt)
                vdt = T.IntegerType()
                if pcol is None:
                    raise IcebergFormatError(
                        f"{op}: partition transform {tr!r} over source "
                        f"type {src['type']!r} is not supported for "
                        "external writes"
                    )
            avro_t = _PV_AVRO.get(vdt.typeName())
            if avro_t is None:
                raise IcebergFormatError(
                    f"{op}: identity partition source type "
                    f"{src['type']!r} is not supported for external "
                    "writes"
                )
            out.append({
                "pname": pf["name"],
                "field_id": pf.get("field-id", 1000),
                "phys": phys,
                "src_name": src["name"],
                "transform": "identity" if tr == "identity" else tr,
                "pcol": pcol,
                "dt": dt,
                "vdt": vdt,
                "avro": avro_t,
            })
        return {
            "spec_id": spec_id,
            "fields": out,
            "spec_json": json.dumps(fields),
        }

    def _cow_dml(self, op: str, predicate: str,
                 set_exprs: dict[str, str] | None, dry_run: bool) -> dict:
        """Shared COW rewrite over the external Iceberg metadata layer:
        plan affected files from ONE distributed scan keyed by
        `_metadata.file_path` (position/equality deletes already applied
        by the read), rewrite only those files, commit a snapshot that
        keeps every untouched file EXISTING at its original sequence
        number. O(affected) driver state; the rewrite is one distributed
        pass over affected data — never the table."""
        pctx = self._partition_ctx(op)
        live = self._live_data_entries()
        cur = self.meta.get("current-snapshot-id", -1)
        plan = {"candidate_files": len(live), "rewritten_files": 0,
                "snapshot_id": cur}
        if not live:
            return plan
        logical, ice, phys_of, fid_of_phys, dt_of_phys = self._phys_maps()
        if set_exprs:
            names = {f.name for f in logical.fields}
            for c in set_exprs:
                if c not in names:
                    raise ValueError(f"unknown SET column {c!r}")
        pred = F.expr(predicate)
        affected = self._plan_affected(pred, pctx, live, predicate)
        plan["rewritten_files"] = len(affected)
        if dry_run or not affected:
            return plan
        # the rewrite pass lists and scans ONLY the affected files
        sub = self.to_df(_with_path=True, _paths=set(affected))
        if op == "DELETE":
            # keep rows unless the predicate is TRUE — NULL-valued
            # predicates keep the row (same fix as the Delta twin:
            # engines filter kept rows on !(cond <=> true))
            new_rows = sub.where(
                ~pred.eqNullSafe(F.lit(True))).drop("__if_fp")
        else:
            new_rows = sub.withColumns({
                c: F.when(pred, F.expr(e)).otherwise(F.col(c))
                for c, e in (set_exprs or {}).items()
            }).drop("__if_fp")
        for f in logical.fields:  # files store PHYSICAL names
            if phys_of[f.name] != f.name:
                new_rows = new_rows.withColumnRenamed(
                    f.name, phys_of[f.name])
        new_rels = self._write_cow_files(new_rows, op.lower(), pctx=pctx)

        new_id, seq = self._next_ids()
        entries = self._added_entries(
            new_rels, new_id, seq, fid_of_phys, dt_of_phys)
        n_added = len(entries)  # zero-row partitions were dropped
        n_deleted = 0
        for e in live:
            ap = str(self._local_data(
                e["data_file"]["file_path"]).resolve())
            is_affected = ap in affected
            n_deleted += is_affected
            entries.append({
                "status": 2 if is_affected else 0,  # DELETED / EXISTING
                # spec: snapshot_id = snapshot that ADDED the file, or the
                # one that DELETED it when status is 2
                "snapshot_id": new_id if is_affected
                else e.get("snapshot_id"),
                "sequence_number": e.get("sequence_number"),
                "file_sequence_number": e.get("file_sequence_number"),
                "data_file": e["data_file"],
                "__spec_id": e.get("__spec_id"),
            })
        # live delete manifests carry over: their position deletes
        # target only paths (rewritten files' paths are gone — inert) and
        # their equality deletes bind by sequence number (< the rewritten
        # files' new seq — already applied in the rewrite)
        snap = self._snapshot()
        _, ml_rows = read_ocf_bytes(
            self._local(snap["manifest-list"]).read_bytes())
        carried = [r for r in ml_rows if int(r.get("content", 0) or 0) == 1]
        self._commit_snapshot(
            entries, ice, new_id, seq,
            operation="delete" if op == "DELETE" else "overwrite",
            summary={
                "added-data-files": str(n_added),
                "deleted-data-files": str(n_deleted),
                "total-data-files": str(len(live) - n_deleted + n_added),
                "lakehouses-predicate": predicate,
            },
            carried_ml_rows=carried,
            pctx=pctx,
        )
        plan["snapshot_id"] = new_id
        return plan

    def rewrite_manifests(self, dry_run: bool = False) -> dict:
        """Iceberg's rewriteManifests maintenance (Spark SQL
        `CALL catalog.system.rewrite_manifests(...)`): consolidate the
        current snapshot's DATA manifests into ONE manifest (entries
        relisted as EXISTING with their original sequence numbers — data
        files untouched) and commit a `replace` snapshot. Delete
        manifests pass through unchanged. After many commits a snapshot's
        manifest list grows O(commits); planning then opens every
        manifest — this collapses that to one open per scan.

        100 TB shape: metadata-only; cost O(live entries), no data read."""
        import time as _time

        pctx = self._partition_ctx("rewrite_manifests")
        live = self._live_data_entries()
        snap = self._snapshot()
        if snap is None:
            raise IcebergFormatError("table has no snapshots")
        _, ml_rows = read_ocf_bytes(
            self._local(snap["manifest-list"]).read_bytes()
        )
        data_manifests = [r for r in ml_rows if r.get("content", 0) == 0]
        delete_rows = [r for r in ml_rows if r.get("content", 0) == 1]
        plan = {
            "input_manifests": len(data_manifests),
            "output_manifests": 1,
            "live_entries": len(live),
        }
        if dry_run or len(data_manifests) <= 1:
            plan["rewritten"] = False
            return plan

        now_ms = int(_time.time() * 1000)
        snap_ids = [s["snapshot-id"] for s in self.meta.get("snapshots") or []]
        new_id = max(snap_ids) + 1
        seq = int(self.meta.get("last-sequence-number", 0)) + 1
        entries = [
            {
                "status": 0,  # EXISTING: same files, same sequence numbers
                "snapshot_id": e.get("snapshot_id"),
                "sequence_number": e.get("sequence_number"),
                "file_sequence_number": e.get("file_sequence_number"),
                "data_file": e["data_file"],
                "__spec_id": e.get("__spec_id"),
            }
            for e in live
        ]
        ice = next(
            s for s in self.meta["schemas"]
            if s["schema-id"] == self.meta["current-schema-id"]
        )
        m = _write_manifest(self.meta_dir, entries, json.dumps(ice),
                            new_id, seq, pctx=pctx)
        # EXISTING entries keep the min sequence across the live set
        m["ml_row"]["min_sequence_number"] = min(
            (e["sequence_number"] for e in entries
             if e["sequence_number"] is not None),
            default=seq,
        )
        location = self.meta["location"].rstrip("/")
        ml_name = f"snap-{new_id}-1-{uuid.uuid4()}.avro"
        (self.meta_dir / ml_name).write_bytes(
            write_ocf_bytes_with_meta(
                [m["ml_row"]] + delete_rows,
                _MANIFEST_LIST_SCHEMA,
                {
                    "format-version": str(FORMAT_VERSION),
                    "snapshot-id": str(new_id),
                    "sequence-number": str(seq),
                },
            )
        )
        snap_new = {
            "snapshot-id": new_id,
            "parent-snapshot-id": snap["snapshot-id"],
            "sequence-number": seq,
            "timestamp-ms": now_ms,
            "manifest-list": f"{location}/metadata/{ml_name}",
            "summary": {
                "operation": "replace",
                "manifests-replaced": str(len(data_manifests)),
                "manifests-created": "1",
                "total-data-files": str(len(entries)),
            },
            "schema-id": self.meta["current-schema-id"],
        }
        meta = dict(self.meta)
        meta["snapshots"] = list(self.meta.get("snapshots") or []) + [snap_new]
        meta["snapshot-log"] = list(self.meta.get("snapshot-log") or []) + [
            {"timestamp-ms": now_ms, "snapshot-id": new_id}
        ]
        meta["current-snapshot-id"] = new_id
        meta["last-sequence-number"] = seq
        refs = dict(meta.get("refs") or {})
        if "main" in refs:
            refs["main"] = {**refs["main"], "snapshot-id": new_id}
        meta["refs"] = refs
        self._commit_metadata(meta)
        plan["rewritten"] = True
        plan["snapshot_id"] = new_id
        return plan

    def changelog(self, from_seq: int | None = None,
                  to_seq: int | None = None) -> DataFrame:
        """Batch row-level CDC (Spark-Iceberg's `create_changelog_view`):
        INSERT/DELETE rows for the snapshots with sequence number in
        (``from_seq``, ``to_seq``] — defaults: the whole retained chain.
        Plans via the same incremental scan as the `icebergtable`
        changelog stream (ADDED entries → INSERT, DELETED entries →
        DELETE, position-delete manifests → the targeted rows as DELETE),
        then reads DISTRIBUTED: data-file groups as plain parquet scans
        with the change identity as literals, position-deleted rows via a
        broadcast (file, pos) semi-join on `_metadata.row_index` — the
        driver never materializes row data."""
        from lakehouses_spark.tables.iceberg_stream import (
            IcebergChangelogStreamReader,
        )

        snaps = sorted(
            (self.meta.get("snapshots") or []),
            key=lambda s: s["sequence-number"],
        )
        if not snaps:
            raise IcebergFormatError("table has no snapshots")
        lo = from_seq if from_seq is not None else -1
        hi = to_seq if to_seq is not None else snaps[-1]["sequence-number"]
        base = self.schema()
        out_schema = T.StructType(
            list(base.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_change_ordinal", T.IntegerType()),
                T.StructField("_commit_snapshot_id", T.LongType()),
            ]
        )
        planner = IcebergChangelogStreamReader(str(self.path), out_schema)
        slices = planner.partitions({"seq": lo}, {"seq": hi})
        slices = [s for s in slices if s.path]
        empty = self.spark.createDataFrame([], out_schema)
        if not slices:
            return empty

        def _stamp(df_, s):
            if s.rename:
                for phys, logical in s.rename.items():
                    if phys in df_.columns:
                        df_ = df_.withColumnRenamed(phys, logical)
            return df_.select(
                *[F.col(f.name).cast(f.dataType)
                  if f.name in df_.columns else
                  F.lit(None).cast(f.dataType).alias(f.name)
                  for f in base.fields],
                F.lit(s.change_type).alias("_change_type"),
                F.lit(s.ordinal).cast("int").alias("_change_ordinal"),
                F.lit(s.snapshot_id).alias("_commit_snapshot_id"),
            )

        parts: list[DataFrame] = []
        groups: dict[tuple, list] = {}
        for s in slices:
            groups.setdefault(
                (s.change_type, s.ordinal, s.snapshot_id, s.mode), []
            ).append(s)
        for (ct, ordinal, snap_id, mode), grp in sorted(
            groups.items(), key=lambda kv: (kv[0][1], kv[0][0] or "")
        ):
            if mode == "data":
                df_ = self.spark.read.parquet(*[s.path for s in grp])
                parts.append(_stamp(df_, grp[0]))
                continue
            # pos-delete: the slice paths are (file_path, pos) parquet;
            # the DELETE rows are the targets' rows at those ordinals.
            # Join on the FULL normalized path, not the basename —
            # rewrite/compaction outputs in different dirs may share a
            # basename (e.g. part-00000.parquet), and a basename join
            # would cross-match, deleting the same row index of every
            # colliding file. The stored-URI → local-path mapping is the
            # one already computed for the read targets.
            import os as _os

            pd_df = self.spark.read.parquet(*[s.path for s in grp])
            mapping = [
                (r.file_path,
                 _os.path.abspath(str(self._local_data(r.file_path))))
                for r in pd_df.select("file_path").distinct().collect()
            ]
            targets = [local for _, local in mapping]
            map_df = self.spark.createDataFrame(
                mapping, "file_path string, __fpath string"
            )
            keys = pd_df.join(F.broadcast(map_df), "file_path").select(
                F.col("__fpath"), F.col("pos").alias("__pos"),
            )
            data = self.spark.read.parquet(*targets).select(
                "*",
                # fs_path_col, not a bare scheme-strip: Spark reports
                # _metadata.file_path percent-encoded while the map side
                # is a raw os.path.abspath — a table rooted at a path
                # with a space/%/+ would otherwise match nothing and the
                # changelog would silently drop its delete rows
                fs_path_col().alias("__fpath"),
                F.col("_metadata.row_index").alias("__pos"),
            )
            joined = data.join(
                F.broadcast(keys), on=["__fpath", "__pos"], how="semi"
            ).drop("__fpath", "__pos")
            parts.append(_stamp(joined, grp[0]))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def remove_orphan_files(
        self, older_than_ms: int | None = None, dry_run: bool = False,
    ) -> dict:
        """Iceberg's removeOrphanFiles maintenance (Spark SQL
        `CALL catalog.system.remove_orphan_files(...)`): delete every file
        under the table location that NO metadata version references —
        leftovers of failed writes, interrupted expirations, or manual
        copies. The keep-set is every v*.metadata.json on disk plus every
        manifest list, manifest, and data/delete file reachable from any
        of their snapshots (entries of every status — a file an older
        retained snapshot still lists is not an orphan). ``older_than_ms``
        is an absolute epoch-millis cutoff; files modified at/after it are
        kept (default: now − 3 days, Iceberg's guard against deleting
        files of in-flight commits). Returns the orphan list + count;
        ``dry_run`` lists without deleting.

        100 TB shape: the keep-set is O(metadata) — manifests decode once
        each (memoized); the location walk is the same listing a real
        orphan sweep pays, and data files are unlinked, never read."""
        import time as _time

        cutoff = (
            older_than_ms if older_than_ms is not None
            else int(_time.time() * 1000) - 3 * 24 * 3600 * 1000
        )
        keep: set[Path] = {(self.meta_dir / "version-hint.text").resolve()}
        decoded: set[Path] = set()
        for mf in sorted(self.meta_dir.glob("v*.metadata.json")):
            keep.add(mf.resolve())
            m = json.loads(mf.read_text())
            for s in m.get("snapshots") or []:
                ml = self._local(s["manifest-list"])
                if not ml.exists():
                    continue
                keep.add(ml.resolve())
                if ml in decoded:
                    continue
                decoded.add(ml)
                _, rows = read_ocf_bytes(ml.read_bytes())
                for r_ in rows:
                    mp = self._local(r_["manifest_path"])
                    if not mp.exists():
                        continue
                    keep.add(mp.resolve())
                    if mp in decoded:
                        continue
                    decoded.add(mp)
                    _, entries = read_ocf_bytes(mp.read_bytes())
                    keep.update(
                        self._local_data(e["data_file"]["file_path"]).resolve()
                        for e in entries
                    )
        orphans = sorted(
            p for p in self.path.rglob("*")
            if p.is_file() and p.resolve() not in keep
            and int(p.stat().st_mtime * 1000) < cutoff
        )
        if not dry_run:
            for p in orphans:
                p.unlink(missing_ok=True)
        return {
            "orphans": [str(p.relative_to(self.path)) for p in orphans],
            "deleted": 0 if dry_run else len(orphans),
        }

    # -- snapshot refs (branches / tags) ---------------------------------- #
    def _commit_metadata(self, meta: dict) -> int:
        """Write ``meta`` as the next v{n+1}.metadata.json, append the
        outgoing current file to the metadata-log, flip version-hint, and
        adopt it as self.meta. Returns the new version number."""
        import time as _time

        cur_file = self._current_metadata_file()
        now_ms = int(_time.time() * 1000)
        meta["last-updated-ms"] = now_ms
        meta["metadata-log"] = (self.meta.get("metadata-log") or []) + [{
            "timestamp-ms": now_ms,
            "metadata-file":
                f"{self.meta['location']}/metadata/{cur_file.name}",
        }]
        new_v = int(cur_file.name.split(".")[0][1:]) + 1
        (self.meta_dir / f"v{new_v}.metadata.json").write_text(
            json.dumps(meta, indent=2)
        )
        (self.meta_dir / "version-hint.text").write_text(str(new_v))
        self.meta = meta
        return new_v

    def _resolve_ref(self, ref: str) -> int:
        r = (self.meta.get("refs") or {}).get(ref)
        if r is None:
            raise IcebergFormatError(f"ref {ref!r} not found")
        return r["snapshot-id"]

    def _create_ref(self, name: str, kind: str, snapshot_id: int | None,
                    extra: dict) -> dict:
        if not name or "/" in name:
            raise ValueError(f"invalid ref name: {name!r}")
        refs = dict(self.meta.get("refs") or {})
        if name in refs:
            raise IcebergFormatError(f"ref {name!r} already exists")
        snap = self._snapshot(snapshot_id)  # validates existence
        if snap is None:
            raise IcebergFormatError("table has no snapshots to reference")
        entry = {"snapshot-id": snap["snapshot-id"], "type": kind}
        entry.update({k: v for k, v in extra.items() if v is not None})
        refs[name] = entry
        meta = dict(self.meta)
        meta["refs"] = refs
        self._commit_metadata(meta)
        return entry

    def create_tag(self, name: str, snapshot_id: int | None = None,
                   max_ref_age_ms: int | None = None) -> dict:
        """Iceberg `ALTER TABLE ... CREATE TAG` (spec: refs map in table
        metadata): pin ``snapshot_id`` (default: current) under an immutable
        named ref. Tagged snapshots never expire until the tag is dropped.
        Commits a new metadata.json version — external readers see the ref."""
        return self._create_ref(
            name, "tag", snapshot_id, {"max-ref-age-ms": max_ref_age_ms}
        )

    def create_branch(self, name: str, snapshot_id: int | None = None,
                      max_ref_age_ms: int | None = None,
                      max_snapshot_age_ms: int | None = None,
                      min_snapshots_to_keep: int | None = None) -> dict:
        """Iceberg `ALTER TABLE ... CREATE BRANCH`: a movable named ref
        with optional branch-level retention fields (spec names
        `max-snapshot-age-ms` / `min-snapshots-to-keep`). Advance it with
        :meth:`fast_forward`."""
        return self._create_ref(
            name, "branch", snapshot_id,
            {"max-ref-age-ms": max_ref_age_ms,
             "max-snapshot-age-ms": max_snapshot_age_ms,
             "min-snapshots-to-keep": min_snapshots_to_keep},
        )

    def drop_ref(self, name: str) -> None:
        """Drop a branch or tag. `main` is protected (Iceberg refuses to
        remove the main branch). The referenced snapshot becomes eligible
        for the next expire_snapshots pass."""
        if name == "main":
            raise IcebergFormatError("cannot remove the main branch")
        refs = dict(self.meta.get("refs") or {})
        if name not in refs:
            raise IcebergFormatError(f"ref {name!r} not found")
        del refs[name]
        meta = dict(self.meta)
        meta["refs"] = refs
        self._commit_metadata(meta)

    def _ancestry(self, snapshot_id: int) -> list[int]:
        by_id = {s["snapshot-id"]: s for s in self.meta.get("snapshots") or []}
        chain, cur = [], snapshot_id
        while cur is not None and cur in by_id:
            chain.append(cur)
            cur = by_id[cur].get("parent-snapshot-id")
        return chain

    def fast_forward(self, branch: str, to: str | int | None = None
                     ) -> tuple[int, int]:
        """Spark-Iceberg `CALL system.fast_forward(branch, to)`: advance
        ``branch`` to ``to`` (a ref name or snapshot id; default: current
        snapshot) — refused unless the branch's current snapshot is an
        ancestor of the target, exactly the procedure's not-fast-forward
        guard. Returns (previous_snapshot_id, new_snapshot_id)."""
        refs = dict(self.meta.get("refs") or {})
        if branch not in refs:
            raise IcebergFormatError(f"ref {branch!r} not found")
        if refs[branch]["type"] != "branch":
            raise IcebergFormatError(f"ref {branch!r} is a tag, not a branch")
        if to is None:
            target = self.meta.get("current-snapshot-id", -1)
            if target == -1:
                raise IcebergFormatError("table has no current snapshot")
        elif isinstance(to, str):
            target = self._resolve_ref(to)
        else:
            target = self._snapshot(to)["snapshot-id"]
        old = refs[branch]["snapshot-id"]
        if target == old:
            return (old, old)
        if old not in self._ancestry(target):
            raise IcebergFormatError(
                f"cannot fast-forward {branch!r}: {old} is not an ancestor "
                f"of {target}"
            )
        refs[branch] = {**refs[branch], "snapshot-id": target}
        meta = dict(self.meta)
        meta["refs"] = refs
        if branch == "main":
            meta["current-snapshot-id"] = target
        self._commit_metadata(meta)
        return (old, target)

    def refs(self) -> DataFrame:
        """The `.refs` metadata table (same schema as Spark-Iceberg's):
        one row per branch/tag with its retention fields."""
        rows = [
            (
                name, r["type"], r["snapshot-id"],
                r.get("max-ref-age-ms"), r.get("min-snapshots-to-keep"),
                r.get("max-snapshot-age-ms"),
            )
            for name, r in sorted((self.meta.get("refs") or {}).items())
        ]
        return self.spark.createDataFrame(
            rows,
            "name string, type string, snapshot_id long, "
            "max_reference_age_in_ms long, min_snapshots_to_keep int, "
            "max_snapshot_age_in_ms long",
        )

    def snapshots(self) -> DataFrame:
        rows = [
            (
                s["timestamp-ms"], s["snapshot-id"],
                s.get("parent-snapshot-id"),
                s["summary"].get("operation"), s["manifest-list"],
            )
            for s in self.meta.get("snapshots") or []
        ]
        return self.spark.createDataFrame(
            rows,
            "committed_at_ms long, snapshot_id long, parent_id long, "
            "operation string, manifest_list string",
        )

    def manifests(self) -> DataFrame:
        snap = self._snapshot()
        rows = []
        if snap is not None:
            _, ml = read_ocf_bytes(self._local(snap["manifest-list"]).read_bytes())
            rows = [
                (
                    m["manifest_path"], m["manifest_length"],
                    m["partition_spec_id"], m["added_snapshot_id"],
                    m["added_files_count"], m["existing_files_count"],
                    m["deleted_files_count"],
                )
                for m in ml
            ]
        return self.spark.createDataFrame(
            rows,
            "path string, length long, partition_spec_id int, "
            "added_snapshot_id long, added_data_files_count int, "
            "existing_data_files_count int, deleted_data_files_count int",
        )

    def all_manifests(self) -> DataFrame:
        """The `.all_manifests` metadata table: the manifests of EVERY
        retained snapshot (deduplicated by path — manifest reuse means
        most appear under many snapshots), with the reference snapshot id
        each row was reached from."""
        rows = []
        seen: set[tuple] = set()
        for s in self.meta.get("snapshots") or []:
            _, ml = read_ocf_bytes(
                self._local(s["manifest-list"]).read_bytes()
            )
            for m in ml:
                key = (m["manifest_path"], s["snapshot-id"])
                if key in seen:
                    continue
                seen.add(key)
                rows.append((
                    m["manifest_path"], m["manifest_length"],
                    m.get("content", 0), m["added_snapshot_id"],
                    s["snapshot-id"],
                ))
        return self.spark.createDataFrame(
            rows,
            "path string, length long, content int, "
            "added_snapshot_id long, reference_snapshot_id long",
        )

    def entries(self, snapshot_id: int | None = None) -> DataFrame:
        """The `.entries` metadata table: raw manifest entries of the
        snapshot — status (0 EXISTING / 1 ADDED / 2 DELETED), snapshot id,
        sequence numbers, and the data file's path/format/counts."""
        snap = self._snapshot(snapshot_id)
        rows = []
        if snap is not None:
            data_entries, delete_entries = self._manifest_rows(snap)
            for e in data_entries + delete_entries:
                df_ = e["data_file"]
                rows.append((
                    e["status"], e.get("snapshot_id"),
                    e.get("sequence_number"), e.get("file_sequence_number"),
                    df_["file_path"], df_["file_format"],
                    df_.get("content", 0), df_["record_count"],
                    df_["file_size_in_bytes"],
                ))
        return self.spark.createDataFrame(
            rows,
            "status int, snapshot_id long, sequence_number long, "
            "file_sequence_number long, file_path string, "
            "file_format string, content int, record_count long, "
            "file_size_in_bytes long",
        )

    def metadata_log_entries(self) -> DataFrame:
        rows = [
            (m["timestamp-ms"], m["metadata-file"])
            for m in self.meta.get("metadata-log") or []
        ]
        return self.spark.createDataFrame(
            rows, "timestamp_ms long, file string"
        )

    def history(self) -> DataFrame:
        ancestors = set()
        cur = self._snapshot()
        by_id = {s["snapshot-id"]: s for s in self.meta.get("snapshots") or []}
        while cur is not None:
            ancestors.add(cur["snapshot-id"])
            cur = by_id.get(cur.get("parent-snapshot-id"))
        rows = [
            (
                e["timestamp-ms"], e["snapshot-id"],
                by_id.get(e["snapshot-id"], {}).get("parent-snapshot-id"),
                e["snapshot-id"] in ancestors,
            )
            for e in self.meta.get("snapshot-log") or []
        ]
        return self.spark.createDataFrame(
            rows,
            "made_current_at_ms long, snapshot_id long, parent_id long, "
            "is_current_ancestor boolean",
        )

    def files(self, snapshot_id: int | None = None) -> DataFrame:
        rows = [
            (
                f["file_path"], f["file_format"], f["record_count"],
                f["file_size_in_bytes"],
            )
            for f in self.live_files(snapshot_id)
        ]
        return self.spark.createDataFrame(
            rows,
            "file_path string, file_format string, record_count long, "
            "file_size_in_bytes long",
        )

    def partitions(self, snapshot_id: int | None = None) -> DataFrame:
        """The `.partitions` metadata table — the reference queries
        `empleados.partitions` (notebooks/01.formatos_ficheros/
        03.iceberg_primer.py:370); Spark-Iceberg's schema: per partition
        tuple, record/file counts and bytes over the snapshot's LIVE data
        entries, position/equality delete file+record counts over its live
        delete entries, and the latest snapshot that touched the
        partition. Unpartitioned tables (spec with no fields — every
        export of this repo) emit ONE row with an empty partition map.

        O(metadata): aggregates the already-decoded manifest entries
        driver-side — the same walk live_files() pays, no data read."""
        by_id = {
            s["snapshot-id"]: s for s in self.meta.get("snapshots") or []
        }

        def key(df_: dict) -> tuple:
            return tuple(sorted(
                (str(k), None if v is None else str(v))
                for k, v in (df_.get("partition") or {}).items()
            ))

        acc: dict[tuple, dict] = {}

        def bucket(k: tuple) -> dict:
            return acc.setdefault(k, {
                "record_count": 0, "file_count": 0, "bytes": 0,
                "pos_del_records": 0, "pos_del_files": 0,
                "eq_del_records": 0, "eq_del_files": 0,
                "last_snap": None, "last_ts": None,
            })

        for e in self._live_data_entries(snapshot_id):
            df_ = e["data_file"]
            b = bucket(key(df_))
            b["record_count"] += df_["record_count"]
            b["file_count"] += 1
            b["bytes"] += df_["file_size_in_bytes"]
            sid = e.get("snapshot_id")
            ts = (by_id.get(sid) or {}).get("timestamp-ms")
            if sid is not None and (
                b["last_ts"] is None or (ts or 0) >= (b["last_ts"] or 0)
            ):
                b["last_snap"], b["last_ts"] = sid, ts
        for e in self._live_delete_entries(snapshot_id):
            df_ = e["data_file"]
            b = bucket(key(df_))
            kind = "pos" if df_.get("content", 0) == 1 else "eq"
            b[f"{kind}_del_records"] += df_["record_count"]
            b[f"{kind}_del_files"] += 1
        spec_id = self.meta.get("default-spec-id", 0)
        rows = [
            (
                dict(k), spec_id, b["record_count"], b["file_count"],
                b["bytes"], b["pos_del_records"], b["pos_del_files"],
                b["eq_del_records"], b["eq_del_files"],
                b["last_ts"], b["last_snap"],
            )
            for k, b in sorted(acc.items())
        ]
        return self.spark.createDataFrame(
            rows,
            "partition map<string,string>, spec_id int, "
            "record_count long, file_count long, "
            "total_data_file_size_in_bytes long, "
            "position_delete_record_count long, "
            "position_delete_file_count long, "
            "equality_delete_record_count long, "
            "equality_delete_file_count long, "
            "last_updated_at_ms long, last_updated_snapshot_id long",
        )


def read_iceberg(
    spark: SparkSession, path: str | Path, snapshot_id: int | None = None
) -> DataFrame:
    """Read an Iceberg-format table (no Iceberg jar required)."""
    return IcebergMetadataReader(spark, path).to_df(snapshot_id)
