"""`icebergtable` — a Spark Python Data Source that streams an EXTERNAL
Iceberg v2 table by tailing its snapshot chain (the Iceberg analog of
`delta_stream.py`'s `deltatable`; Spark-Iceberg exposes the same capability
as `spark.readStream.format("iceberg")`).

Offsets are snapshot SEQUENCE NUMBERS (monotonic, survive snapshot-id
renumbering); each micro-batch is the set of data files the snapshots in
(start_seq, end_seq] ADDED — planned from their manifest lists by taking
manifests with `added_snapshot_id == snapshot-id` and entries with status
ADDED, Iceberg's own incremental-scan design. The INITIAL catch-up reads
the earliest available snapshot as a FULL snapshot (all live entries —
correct even when older snapshots were expired), then tails incrementally.

Semantics mirrored from the Iceberg Spark source:
- append snapshots stream their added files;
- delete/overwrite snapshots (row-level deletes or copy-on-write removes)
  break the append-only contract and fail fast unless `ignoreChanges=true`
  (then only added data files stream — may emit rows that were deleted);
- resuming into a sequence gap (an unprocessed snapshot was expired)
  fails loudly instead of silently dropping data;
- name-mapping physical parquet names rename to the logical schema names.

Scaling structure: one InputPartition per data file — executors open their
own parquet via Arrow, no per-row Python; per-batch planning decodes only
the manifests the new snapshots added, O(new files), never the whole table.
"""

from __future__ import annotations

import json
from pathlib import Path
from urllib.parse import urlparse

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
from pyspark.sql.types import StructType

_REPO_ROOT = str(Path(__file__).resolve().parents[2])

_STATUS_ADDED = 1
_STATUS_DELETED = 2


def _avro():
    try:
        from lakehouses_spark.functions import avro_py
    except ModuleNotFoundError:  # pathless planner worker (same machine)
        import sys

        sys.path.insert(0, _REPO_ROOT)
        from lakehouses_spark.functions import avro_py
    return avro_py


def _meta_dir(table_path: str) -> Path:
    return Path(table_path) / "metadata"


def _current_meta(table_path: str) -> dict:
    md = _meta_dir(table_path)
    hint = md / "version-hint.text"
    if hint.exists():
        cand = md / f"v{hint.read_text().strip()}.metadata.json"
        if cand.exists():
            return json.loads(cand.read_text())
    files = sorted(
        md.glob("v*.metadata.json"),
        key=lambda p: int(p.name.split(".")[0][1:]),
    )
    if not files:
        raise ValueError(f"not an iceberg table (no metadata json): {table_path}")
    return json.loads(files[-1].read_text())


def _local(table_path: str, meta: dict, uri: str) -> Path:
    marker = "/metadata/"
    if marker in uri:
        cand = _meta_dir(table_path) / uri.rsplit(marker, 1)[1]
        if cand.exists():
            return cand
    loc = meta["location"].rstrip("/")
    if uri.startswith(loc):
        return Path(table_path) / uri[len(loc):].lstrip("/")
    return Path(uri)


def _spark_schema(meta: dict) -> "StructType":
    # lazy import: keeps this helper usable in the planner worker
    try:
        from lakehouses_spark.tables.iceberg_meta import _iceberg_type_to_spark
    except ModuleNotFoundError:
        import sys

        sys.path.insert(0, _REPO_ROOT)
        from lakehouses_spark.tables.iceberg_meta import _iceberg_type_to_spark
    from pyspark.sql.types import StructField, StructType as ST

    ice = next(
        s for s in meta["schemas"]
        if s["schema-id"] == meta["current-schema-id"]
    )
    return ST([
        StructField(f["name"], _iceberg_type_to_spark(f["type"]), True)
        for f in ice["fields"]
    ])


def _rename_map(meta: dict) -> dict[str, str]:
    """physical (in-file, via name-mapping) -> logical schema name."""
    nm = json.loads(
        (meta.get("properties") or {}).get("schema.name-mapping.default", "[]")
    )
    by_id = {m["field-id"]: m["names"][0] for m in nm if m.get("names")}
    ice = next(
        s for s in meta["schemas"]
        if s["schema-id"] == meta["current-schema-id"]
    )
    return {
        by_id[f["id"]]: f["name"]
        for f in ice["fields"]
        if f["id"] in by_id and by_id[f["id"]] != f["name"]
    }


class IceSlice(InputPartition):
    def __init__(self, path: str, rename: dict[str, str]):
        self.path = path
        self.rename = rename


class IcebergTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "icebergtable"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError(
                "icebergtable source requires .option('path', <table dir>)"
            )
        if p.startswith("file:"):
            p = urlparse(p).path
        if not _meta_dir(p).is_dir():
            raise ValueError(f"not an iceberg table (no metadata/): {p}")
        return p

    def schema(self) -> StructType:
        return _spark_schema(_current_meta(self._path()))

    def reader(self, schema: StructType):
        raise ValueError(
            "icebergtable is a STREAMING source; for batch reads use "
            "lakehouses_spark.tables.iceberg_meta.read_iceberg"
        )

    def streamReader(self, schema: StructType):
        return IcebergStreamReader(
            self._path(),
            self.schema(),
            ignore_changes=str(
                self.options.get("ignorechanges", "false")
            ).lower() == "true",
        )


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, table_path: str, out_schema: StructType,
                 ignore_changes: bool = False):
        from pyspark.sql.pandas.types import to_arrow_schema

        self.table_path = table_path
        self.arrow_schema = to_arrow_schema(out_schema)
        self.ignore_changes = ignore_changes
        self.rename = _rename_map(_current_meta(table_path))

    def _snapshots(self) -> list[dict]:
        meta = _current_meta(self.table_path)
        return sorted(
            meta.get("snapshots") or [],
            key=lambda s: s["sequence-number"],
        )

    def initialOffset(self) -> dict:
        return {"seq": -1}

    def latestOffset(self) -> dict:
        snaps = self._snapshots()
        return {"seq": snaps[-1]["sequence-number"] if snaps else -1}

    def _manifest_rows(self, meta: dict, snap: dict) -> list[dict]:
        ml = _local(self.table_path, meta, snap["manifest-list"])
        _, rows = _avro().read_ocf_bytes(ml.read_bytes())
        return rows

    def _entries(self, meta: dict, manifest_row: dict) -> list[dict]:
        mp = _local(self.table_path, meta, manifest_row["manifest_path"])
        _, entries = _avro().read_ocf_bytes(mp.read_bytes())
        return entries

    def partitions(self, start: dict, end: dict):
        start_seq, end_seq = int(start["seq"]), int(end["seq"])
        meta = _current_meta(self.table_path)
        snaps = self._snapshots()
        in_range = [
            s for s in snaps if start_seq < s["sequence-number"] <= end_seq
        ]
        if start_seq >= 0 and in_range and \
                in_range[0]["sequence-number"] != start_seq + 1:
            raise RuntimeError(
                f"snapshot at sequence {start_seq + 1} was expired before "
                "this stream processed it — the feed has a gap; restart "
                "the stream with a fresh checkpoint"
            )
        slices: list[IceSlice] = []
        first_available = snaps[0]["sequence-number"] if snaps else -1
        for s in in_range:
            rows = self._manifest_rows(meta, s)
            full = (
                start_seq == -1 and s["sequence-number"] == first_available
            )
            has_deletes = any(r.get("content", 0) == 1 for r in rows) if full \
                else any(
                    r.get("content", 0) == 1
                    and r["added_snapshot_id"] == s["snapshot-id"]
                    for r in rows
                )
            op = (s.get("summary") or {}).get("operation", "append")
            breaking = has_deletes or (not full and op != "append")
            if breaking and not self.ignore_changes:
                raise RuntimeError(
                    f"snapshot {s['snapshot-id']} ({op}) removed or deleted "
                    "rows on the streamed table; set .option("
                    "'ignoreChanges', 'true') to stream only added data "
                    "files (may emit deleted rows)"
                )
            for r in rows:
                if r.get("content", 0) != 0:
                    continue  # delete manifest — gated above
                if not full and r["added_snapshot_id"] != s["snapshot-id"]:
                    continue  # manifest reuse: not this snapshot's adds
                for e in self._entries(meta, r):
                    if full:
                        keep = e["status"] != _STATUS_DELETED
                    else:
                        keep = e["status"] == _STATUS_ADDED
                    if keep:
                        slices.append(IceSlice(
                            str(_local(self.table_path, meta,
                                       e["data_file"]["file_path"])),
                            self.rename,
                        ))
        return slices or [IceSlice("", {})]

    def read(self, partition: IceSlice):
        if not partition.path:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        if partition.rename:
            table = table.rename_columns(
                [partition.rename.get(n, n) for n in table.column_names]
            )
        out = self.arrow_schema
        for batch in table.to_batches(max_chunksize=10_000):
            n = len(batch)
            names = set(batch.schema.names)
            cols = []
            for f in out:
                if f.name in names:
                    col = batch.column(f.name)
                    cols.append(col if col.type == f.type else col.cast(f.type))
                else:  # schema evolution: older files read NULL
                    cols.append(pa.nulls(n, f.type))
            yield pa.RecordBatch.from_arrays(cols, schema=out)

    def commit(self, end: dict) -> None:
        pass  # progress is durable in the sink checkpoint


def _register_pickle_by_value() -> None:
    """Ship this module's classes inside the pickle (same session-
    portability note as stream_source.py)."""
    import sys

    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass


_register_pickle_by_value()
