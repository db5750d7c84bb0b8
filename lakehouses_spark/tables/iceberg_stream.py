"""`icebergtable` — a Spark Python Data Source that streams an EXTERNAL
Iceberg v2 table by tailing its snapshot chain (the Iceberg analog of
`delta_stream.py`'s `deltatable`; Spark-Iceberg exposes the same capability
as `spark.readStream.format("iceberg")`).

Offsets are snapshot SEQUENCE NUMBERS (monotonic, survive snapshot-id
renumbering); each micro-batch is the set of data files the snapshots in
(start_seq, end_seq] ADDED — planned from their manifest lists by taking
manifests with `added_snapshot_id == snapshot-id` and entries with status
ADDED, Iceberg's own incremental-scan design. The INITIAL batch is the
CURRENT snapshot's live entries (the table's opening state — history may
contain any DML; expired history costs nothing), then the tail is
incremental.

Semantics mirrored from the Iceberg Spark source:
- a current snapshot with ACTIVE position/equality deletes fails fast at
  start unless `ignoreChanges=true` (whole-file reads would resurrect
  deleted rows; rewrite_data_files first);
- after the start, append snapshots stream their added files;
  delete/overwrite snapshots break the append-only contract and fail
  fast unless `ignoreChanges=true` (then only added data files stream —
  may emit rows that were deleted);
- `replace` snapshots (rewrite_data_files / rewrite_manifests) are
  SKIPPED — data is unchanged, only its layout; streaming their adds
  would duplicate the whole compacted table;
- planning and gap detection walk the MAIN-branch ancestry
  (parent-snapshot-id chain from the `main` ref), so branch/tag-only
  snapshots neither enter the feed nor trip the expiration check;
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
    def __init__(self, path: str, rename: dict[str, str],
                 change_type: str | None = None, ordinal: int = -1,
                 snapshot_id: int = -1, mode: str = "data"):
        self.path = path
        self.rename = rename
        # changelog fields (mode "data" = whole file; "pos-delete" = the
        # path is a position-delete parquet whose (file_path, pos) rows
        # select the deleted rows out of their target data files)
        self.change_type = change_type
        self.ordinal = ordinal
        self.snapshot_id = snapshot_id
        self.mode = mode


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

    def _changelog(self) -> bool:
        # Spark-Iceberg exposes CDC as a changelog scan; we accept the same
        # readChangeFeed spelling the Delta sources use
        return str(
            self.options.get("readchangefeed", "false")
        ).lower() == "true"

    def schema(self) -> StructType:
        from pyspark.sql.types import IntegerType, LongType, StringType, StructField

        base = _spark_schema(_current_meta(self._path()))
        if not self._changelog():
            return base
        return StructType(
            list(base.fields)
            + [
                StructField("_change_type", StringType()),
                StructField("_change_ordinal", IntegerType()),
                StructField("_commit_snapshot_id", LongType()),
            ]
        )

    def reader(self, schema: StructType):
        raise ValueError(
            "icebergtable is a STREAMING source; for batch reads use "
            "lakehouses_spark.tables.iceberg_meta.read_iceberg"
        )

    def streamReader(self, schema: StructType):
        cls = (
            IcebergChangelogStreamReader if self._changelog()
            else IcebergStreamReader
        )
        return cls(
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
        """Main-branch ancestry only, oldest first: walk the parent chain
        from the `main` ref (falling back to current-snapshot-id), like
        the Spark-Iceberg source. The global snapshots list also holds
        branch/tag-only snapshots (refs pin them); ordering THOSE by
        sequence number would open the stream on a branch head and tail
        branch commits into the main feed."""
        meta = _current_meta(self.table_path)
        by_id = {s["snapshot-id"]: s for s in meta.get("snapshots") or []}
        cur = (meta.get("refs") or {}).get("main", {}).get(
            "snapshot-id", meta.get("current-snapshot-id", -1)
        )
        chain: list[dict] = []
        while cur in by_id:
            s = by_id[cur]
            chain.append(s)
            cur = s.get("parent-snapshot-id")
        chain.reverse()
        return chain

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
        # gap check over the MAIN ancestry: if the snapshot we last
        # processed is still retained, the parent chain up from it is
        # contiguous by construction — branch commits may hold the skipped
        # sequence numbers, that's not a gap. Only when it was expired do
        # we require density (an expired UNPROCESSED ancestor is data loss).
        if start_seq >= 0 and in_range and \
                not any(s["sequence-number"] == start_seq for s in snaps) and \
                in_range[0]["sequence-number"] != start_seq + 1:
            raise RuntimeError(
                f"snapshot at sequence {start_seq + 1} was expired before "
                "this stream processed it — the feed has a gap; restart "
                "the stream with a fresh checkpoint"
            )
        slices: list[IceSlice] = []
        if start_seq == -1 and in_range:
            # INITIAL batch = the CURRENT snapshot at end_seq (the Iceberg
            # source's opening state is the table, not a replay of history
            # adds — delete/overwrite snapshots in history are fine); the
            # tail below then only sees sequences > end_seq
            s = in_range[-1]
            rows = self._manifest_rows(meta, s)
            if any(r.get("content", 0) == 1 for r in rows) \
                    and not self.ignore_changes:
                raise RuntimeError(
                    "the current snapshot has active position/equality "
                    "deletes; the stream source reads whole files — set "
                    ".option('ignoreChanges', 'true') to stream them "
                    "including deleted rows, or rewrite_data_files first"
                )
            for r in rows:
                if r.get("content", 0) != 0:
                    continue
                slices.extend(
                    IceSlice(
                        str(_local(self.table_path, meta,
                                   e["data_file"]["file_path"])),
                        self.rename,
                    )
                    for e in self._entries(meta, r)
                    if e["status"] != _STATUS_DELETED
                )
            return slices or [IceSlice("", {})]
        for s in in_range:
            op = (s.get("summary") or {}).get("operation", "append")
            if op == "replace":
                # rewrite_data_files / rewrite_manifests: the data is
                # unchanged, only its file layout — the Spark-Iceberg
                # source skips compaction snapshots (no slices, no error;
                # streaming their ADDED entries would re-emit the whole
                # compacted table as duplicates)
                continue
            rows = self._manifest_rows(meta, s)
            has_deletes = any(
                r.get("content", 0) == 1
                and r["added_snapshot_id"] == s["snapshot-id"]
                for r in rows
            )
            breaking = has_deletes or op != "append"
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
                if r["added_snapshot_id"] != s["snapshot-id"]:
                    continue  # manifest reuse: not this snapshot's adds
                slices.extend(
                    IceSlice(
                        str(_local(self.table_path, meta,
                                   e["data_file"]["file_path"])),
                        self.rename,
                    )
                    for e in self._entries(meta, r)
                    if e["status"] == _STATUS_ADDED
                )
        return slices or [IceSlice("", {})]

    def read(self, partition: IceSlice):
        if not partition.path:
            return
        import pyarrow.parquet as pq

        if partition.mode == "pos-delete":
            # the slice is a position-delete parquet; the DELETED rows are
            # the target files' rows at the listed ordinals
            import pyarrow as pa

            pd_tbl = pq.read_table(partition.path)
            by_file: dict[str, list[int]] = {}
            for fp, pos in zip(
                pd_tbl.column("file_path").to_pylist(),
                pd_tbl.column("pos").to_pylist(),
            ):
                by_file.setdefault(fp, []).append(pos)
            meta = _current_meta(self.table_path)
            for fp, positions in sorted(by_file.items()):
                data = pq.read_table(_local(self.table_path, meta, fp))
                yield from self._emit(
                    data.take(pa.array(sorted(positions))), partition
                )
            return
        yield from self._emit(pq.read_table(partition.path), partition)

    def _emit(self, table, partition: IceSlice):
        import pyarrow as pa

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
                if f.name == "_change_type" and f.name not in names:
                    cols.append(pa.array([partition.change_type] * n, f.type))
                elif f.name == "_change_ordinal" and f.name not in names:
                    cols.append(pa.array([partition.ordinal] * n, f.type))
                elif f.name == "_commit_snapshot_id" and f.name not in names:
                    cols.append(
                        pa.array([partition.snapshot_id] * n, f.type)
                    )
                elif f.name in names:
                    col = batch.column(f.name)
                    cols.append(col if col.type == f.type else col.cast(f.type))
                else:  # schema evolution: older files read NULL
                    cols.append(pa.nulls(n, f.type))
            yield pa.RecordBatch.from_arrays(cols, schema=out)

    def commit(self, end: dict) -> None:
        pass  # progress is durable in the sink checkpoint


class IcebergChangelogStreamReader(IcebergStreamReader):
    """Changelog mode (Spark-Iceberg's `create_changelog_view` semantics,
    streamed): per snapshot, ADDED data entries emit their rows as INSERT,
    DELETED data entries emit the removed file's rows as DELETE (a
    copy-on-write UPDATE is its DELETE+INSERT pair), and ADDED
    position-delete manifests emit the targeted rows as DELETE
    (merge-on-read). `_change_ordinal` is the snapshot's sequence number —
    monotone commit order; `_commit_snapshot_id` the snapshot id.

    The INITIAL catch-up emits the earliest retained snapshot's live rows
    as INSERTs (the stream's opening state, same contract as the plain
    tail). Snapshots whose semantics this scan cannot reproduce exactly —
    a DELETED data file that was itself under earlier position deletes
    (its dead rows would re-emit as DELETE), or an initial snapshot with
    active position deletes — fail loudly rather than emit a wrong feed."""

    def partitions(self, start: dict, end: dict):
        start_seq, end_seq = int(start["seq"]), int(end["seq"])
        meta = _current_meta(self.table_path)
        snaps = self._snapshots()
        in_range = [
            s for s in snaps if start_seq < s["sequence-number"] <= end_seq
        ]
        if start_seq >= 0 and in_range and \
                not any(s["sequence-number"] == start_seq for s in snaps) and \
                in_range[0]["sequence-number"] != start_seq + 1:
            raise RuntimeError(
                f"snapshot at sequence {start_seq + 1} was expired before "
                "this stream processed it — the changelog has a gap; "
                "restart the stream with a fresh checkpoint"
            )
        slices: list[IceSlice] = []
        first_available = snaps[0]["sequence-number"] if snaps else -1
        prior_deleted_targets: set[str] = set()  # files under earlier MOR deletes
        for s in snaps:
            seq = s["sequence-number"]
            if seq > end_seq:
                break
            full = start_seq == -1 and seq == first_available
            if not full and (
                (s.get("summary") or {}).get("operation") == "replace"
            ):
                # compaction: no semantic change, no changelog rows (the
                # initial catch-up still reads a replace snapshot's live
                # entries — that IS the opening state)
                continue
            rows = self._manifest_rows(meta, s)
            mine = lambda r: r["added_snapshot_id"] == s["snapshot-id"]  # noqa: E731
            # track MOR targets across ALL snapshots walked, so a later
            # COW remove of a partially-deleted file is detected
            new_pos_deletes = [
                r for r in rows if r.get("content", 0) == 1 and mine(r)
            ]
            emit = start_seq < seq  # only snapshots in range emit slices
            if not emit:
                # already-processed snapshot: only its MOR targets matter
                # (to detect a later COW remove of a partially-deleted
                # file); skip its data manifests entirely
                self._track_mor_targets(
                    meta, new_pos_deletes, prior_deleted_targets
                )
                continue
            if full:
                if any(r.get("content", 0) == 1 for r in rows):
                    raise RuntimeError(
                        "initial changelog snapshot has active position "
                        "deletes; expire/compact first or start the stream "
                        "before the deletes"
                    )
                for r in rows:
                    for e in self._entries(meta, r):
                        if e["status"] != _STATUS_DELETED:
                            slices.append(self._slice(
                                meta, e, "INSERT", seq, s["snapshot-id"]))
            else:
                for r in rows:
                    if r.get("content", 0) == 1:
                        continue  # handled via new_pos_deletes below
                    if not mine(r):
                        continue
                    for e in self._entries(meta, r):
                        fp = e["data_file"]["file_path"]
                        if e["status"] == _STATUS_ADDED:
                            slices.append(self._slice(
                                meta, e, "INSERT", seq, s["snapshot-id"]))
                        elif e["status"] == _STATUS_DELETED:
                            if fp in prior_deleted_targets:
                                raise RuntimeError(
                                    f"snapshot {s['snapshot-id']} removes "
                                    f"{fp}, which earlier position deletes "
                                    "already targeted — the DELETE row set "
                                    "is not reproducible from manifests "
                                    "alone; use the batch reader"
                                )
                            slices.append(self._slice(
                                meta, e, "DELETE", seq, s["snapshot-id"]))
                for r in new_pos_deletes:
                    for e in self._entries(meta, r):
                        slices.append(IceSlice(
                            str(_local(self.table_path, meta,
                                       e["data_file"]["file_path"])),
                            self.rename, "DELETE", seq,
                            s["snapshot-id"], mode="pos-delete",
                        ))
            self._track_mor_targets(
                meta, new_pos_deletes, prior_deleted_targets
            )
        return slices or [IceSlice("", {})]

    def _track_mor_targets(self, meta: dict, pos_delete_rows: list[dict],
                           targets: set[str]) -> None:
        import pyarrow.parquet as pq

        # memoized per reader: the historical walk re-runs every batch, but
        # a position-delete file's target list never changes once written
        cache = getattr(self, "_mor_target_cache", None)
        if cache is None:
            cache = self._mor_target_cache = {}
        for r in pos_delete_rows:
            for e in self._entries(meta, r):
                pd_path = _local(
                    self.table_path, meta, e["data_file"]["file_path"]
                )
                key = str(pd_path)
                if key not in cache:
                    cache[key] = set(
                        pq.read_table(
                            pd_path, columns=["file_path"]
                        ).column("file_path").to_pylist()
                    )
                targets.update(cache[key])

    def _slice(self, meta: dict, entry: dict, change_type: str, seq: int,
               snap_id: int) -> IceSlice:
        return IceSlice(
            str(_local(self.table_path, meta, entry["data_file"]["file_path"])),
            self.rename, change_type, seq, snap_id,
        )


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
