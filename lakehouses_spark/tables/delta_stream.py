"""`deltatable` — a Spark Python Data Source that streams an EXTERNAL
Delta-protocol table by tailing its `_delta_log` commit JSONs (the Delta
analog of `stream_source.py`'s `laketable`; reference scope:
02.delta_lake_primer.py:133-137 streams a Delta table with
spark.readStream).

Offsets are Delta versions; each micro-batch is exactly the file set the
commits in (start_version, end_version] added — Delta's own streaming-source
design: the log IS the changelog, no directory diffing, no state beyond one
integer in the sink checkpoint. Works against any Delta table with its
commit JSONs present: tables this repo exports (`export_delta_log`) or
tables written by real Delta writers.

Semantics mirrored from Delta's source:
- the INITIAL batch is the CURRENT snapshot (a stdlib replay of the
  commit JSONs to the live add set) — DML anywhere in history is fine;
  live files carrying deletion vectors fail fast unless
  `ignoreChanges=true` (whole-file reads would resurrect deleted rows);
- after the start, append commits stream their added files
  (`dataChange=false` rewrites — OPTIMIZE — are skipped); commits that
  REMOVE files or attach deletion vectors break the append-only contract
  and fail fast unless `ignoreChanges=true` (then only the (re-)added
  files stream — Delta documents the same may-see-duplicates caveat);
- `startingVersion=N` starts the tail at version N (skips the initial
  snapshot catch-up), exactly Delta's option;
- `readChangeFeed=true` streams the row-level change feed: native `cdc`
  actions when the commit recorded them, derived inserts for pure-append
  commits, fail-fast on unrecorded DML — with `_change_type` /
  `_commit_version` / `_commit_timestamp` stamped Arrow-side;
- column mapping (mode=name/id): physical parquet names rename to logical
  ones per the metaData schemaString;
- hive-partitioned tables: `add.partitionValues` stamp onto every row of
  the file as constant Arrow columns (partition values are NOT in the
  files).

Scaling structure: `partitions()` emits one InputPartition per file, so the
read side fans out across executors, each opening its own parquet via Arrow
and yielding RecordBatches — no per-row Python. Planning cost per batch is
O(actions of the commits in range): the driver never lists data
directories.
"""

from __future__ import annotations

import json
from pathlib import Path
from urllib.parse import unquote, urlparse

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

# -- stdlib-only log helpers (run in the pathless planner worker) ---------- #


def _log_dir(table_path: str) -> Path:
    return Path(table_path) / "_delta_log"


def _json_versions(table_path: str) -> list[int]:
    out = []
    for f in _log_dir(table_path).glob("*.json"):
        parts = f.name.split(".")
        if len(parts) == 2 and parts[0].isdigit():
            out.append(int(parts[0]))
    return sorted(out)


def _commit_actions(table_path: str, v: int) -> list[dict]:
    with open(_log_dir(table_path) / f"{v:020d}.json") as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _checkpoint_metadata(table_path: str) -> dict | None:
    """metaData from the newest checkpoint (classic single/multi-part
    parquet or v2 top-level json/parquet) — the fallback when every commit
    JSON carrying it was cleaned up."""
    import pyarrow.parquet as pq

    log = _log_dir(table_path)
    lc = log / "_last_checkpoint"
    if not lc.exists():
        return None
    v = json.loads(lc.read_text())["version"]
    classic = log / f"{v:020d}.checkpoint.parquet"
    candidates = [classic] if classic.exists() else sorted(
        p for p in log.glob(f"{v:020d}.checkpoint.*")
        if p.suffix in (".parquet", ".json")
    )
    for cand in candidates:
        if cand.suffix == ".json":
            with open(cand) as fh:
                for line in fh:
                    a = json.loads(line)
                    if "metaData" in a:
                        return a["metaData"]
            continue
        tbl = pq.read_table(cand)
        if "metaData" not in tbl.column_names:
            continue
        for row in tbl.column("metaData").to_pylist():
            if row is not None and row.get("schemaString"):
                return row
    return None


def _latest_metadata(table_path: str) -> dict:
    for v in reversed(_json_versions(table_path)):
        for a in _commit_actions(table_path, v):
            if "metaData" in a:
                return a["metaData"]
    meta = _checkpoint_metadata(table_path)
    if meta is None:
        raise ValueError(
            f"no metaData action found in the delta log at {table_path}"
        )
    return meta


def _rename_map(metadata: dict) -> dict[str, str]:
    """physical (in-file) name -> logical name, from the schemaString's
    column-mapping metadata; empty when mapping is off."""
    out: dict[str, str] = {}
    for f in json.loads(metadata["schemaString"]).get("fields", []):
        phys = (f.get("metadata") or {}).get(
            "delta.columnMapping.physicalName"
        )
        if phys and phys != f["name"]:
            out[phys] = f["name"]
    return out


def _commit_ts_ms(table_path: str, v: int, actions: list[dict]) -> int:
    for a in actions:
        if "commitInfo" in a and a["commitInfo"].get("timestamp"):
            return int(a["commitInfo"]["timestamp"])
    return int((_log_dir(table_path) / f"{v:020d}.json").stat().st_mtime * 1000)


class DeltaSlice(InputPartition):
    """One parquet file of a micro-batch, plus everything needed to emit
    spec-complete rows executor-side: partition values to stamp, the
    physical->logical rename map, and (CDF mode) the change identity."""

    def __init__(self, path: str, pv: dict, rename: dict[str, str],
                 change_type: str | None = None, version: int = -1,
                 ts_ms: int = 0):
        self.path = path
        self.pv = pv
        self.rename = rename
        self.change_type = change_type
        self.version = version
        self.ts_ms = ts_ms


def _emit_batches(partition: DeltaSlice, arrow_schema):
    """Executor-side: parquet file -> RecordBatches in the OUTPUT schema —
    physical names renamed, partition values stamped as constant columns,
    CDF identity columns filled, ns timestamps cast to µs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pq.read_table(partition.path)
    # under column mapping, partitionValues key by PHYSICAL name (spec);
    # the output schema speaks logical — normalize once (r12, found by
    # the cross-plane agreement test on the shared column-mapped fixture)
    pv = partition.pv
    if partition.rename:
        table = table.rename_columns(
            [partition.rename.get(n, n) for n in table.column_names]
        )
        pv = {partition.rename.get(k, k): v for k, v in pv.items()}
    for batch in table.to_batches(max_chunksize=10_000):
        n = len(batch)
        names = set(batch.schema.names)
        cols = []
        for f in arrow_schema:
            if f.name == "_change_type" and f.name not in names:
                cols.append(pa.array([partition.change_type] * n, f.type))
            elif f.name == "_commit_version" and f.name not in names:
                cols.append(pa.array([partition.version] * n, f.type))
            elif f.name == "_commit_timestamp" and f.name not in names:
                cols.append(pa.array(
                    [partition.ts_ms * 1000] * n,
                    pa.timestamp(f.type.unit, f.type.tz),
                ))
            elif f.name in names:
                col = batch.column(f.name)
                cols.append(col if col.type == f.type else col.cast(f.type))
            elif f.name in pv:
                raw = pv[f.name]
                if raw is None:
                    cols.append(pa.nulls(n, f.type))
                else:  # partition values serialize as strings in the log
                    cols.append(
                        pa.array([str(raw)] * n, pa.string()).cast(f.type)
                    )
            else:  # schema evolution: older files read NULL
                cols.append(pa.nulls(n, f.type))
        yield pa.RecordBatch.from_arrays(cols, schema=arrow_schema)


class DeltaTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "deltatable"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError(
                "deltatable source requires .option('path', <table dir>)"
            )
        if p.startswith("file:"):
            p = urlparse(p).path
        if not _log_dir(p).is_dir():
            raise ValueError(f"not a delta table (no _delta_log/): {p}")
        return p

    def _cdf(self) -> bool:
        return str(self.options.get("readchangefeed", "false")).lower() == "true"

    def schema(self) -> StructType:
        from pyspark.sql.types import (
            LongType, StringType, StructField, TimestampType,
        )

        meta = _latest_metadata(self._path())
        base = StructType.fromJson(json.loads(meta["schemaString"]))
        if not self._cdf():
            return base
        return StructType(
            list(base.fields)
            + [
                StructField("_change_type", StringType()),
                StructField("_commit_version", LongType()),
                StructField("_commit_timestamp", TimestampType()),
            ]
        )

    def reader(self, schema: StructType):
        raise ValueError(
            "deltatable is a STREAMING source; for batch reads use "
            "lakehouses_spark.tables.delta_log.read_delta"
        )

    def streamReader(self, schema: StructType):
        path = self._path()
        opts = {
            "ignore_changes":
                str(self.options.get("ignorechanges", "false")).lower()
                == "true",
            "starting_version": (
                int(self.options["startingversion"])
                if "startingversion" in self.options else None
            ),
        }
        if self._cdf():
            return DeltaChangeFeedStreamReader(path, self.schema(), **opts)
        return DeltaStreamReader(path, self.schema(), **opts)


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, table_path: str, out_schema: StructType,
                 ignore_changes: bool = False,
                 starting_version: int | None = None):
        from pyspark.sql.pandas.types import to_arrow_schema

        self.table_path = table_path
        self.arrow_schema = to_arrow_schema(out_schema)
        self.ignore_changes = ignore_changes
        self.starting_version = starting_version
        meta = _latest_metadata(table_path)
        self.rename = _rename_map(meta)
        versions = _json_versions(table_path)
        if starting_version is None and (not versions or versions[0] != 0):
            raise ValueError(
                "commit JSONs were cleaned up below version "
                f"{versions[0] if versions else '?'}; the initial snapshot "
                "cannot replay from the log tail — pass "
                ".option('startingVersion', N) to tail from N instead"
            )

    def initialOffset(self) -> dict:
        if self.starting_version is not None:
            return {"version": self.starting_version - 1}
        return {"version": -1}

    def latestOffset(self) -> dict:
        versions = _json_versions(self.table_path)
        return {"version": versions[-1] if versions else -1}

    def _snapshot_adds(self, upto_v: int) -> list[dict]:
        """Replay the commit JSONs 0..upto_v to the live add set —
        last-add-wins, removes pop — exactly the reader's snapshot but
        stdlib-only (the planner worker has no DeltaLogReader). Keys are
        UNQUOTED like the batch reader's replay (r12): the spec allows
        both percent-encoded and literal spellings of the same path, and
        a remove whose writer encoded differently from the add (e.g. a
        foreign `seg=A/...` add removed by this repo's quoted DML) must
        still pop the file, or the initial snapshot resurrects it."""
        files: dict[str, dict] = {}
        for v in _json_versions(self.table_path):
            if v > upto_v:
                break
            for a in _commit_actions(self.table_path, v):
                if "add" in a:
                    files[unquote(a["add"]["path"])] = a["add"]
                elif "remove" in a:
                    files.pop(unquote(a["remove"]["path"]), None)
        return list(files.values())

    def partitions(self, start: dict, end: dict):
        start_v, end_v = int(start["version"]), int(end["version"])
        slices: list[DeltaSlice] = []
        if start_v == -1 and self.starting_version is None:
            # INITIAL batch = the CURRENT snapshot at end_v (Delta's
            # source semantics: the opening state is the table, not a
            # replay of history adds — DML in history is fine); the tail
            # below then only sees versions > end_v
            adds = self._snapshot_adds(end_v)
            dv = [a for a in adds if a.get("deletionVector")]
            if dv and not self.ignore_changes:
                raise RuntimeError(
                    f"{len(dv)} live file(s) carry deletion vectors; the "
                    "stream source reads whole files — set .option("
                    "'ignoreChanges', 'true') to stream them including "
                    "deleted rows, or OPTIMIZE the table first"
                )
            slices.extend(DeltaSlice(
                str(Path(self.table_path) / unquote(a["path"])),
                a.get("partitionValues") or {},
                self.rename,
            ) for a in adds)
            return slices or [DeltaSlice("", {}, {})]
        for v in _json_versions(self.table_path):
            if not (start_v < v <= end_v):
                continue
            actions = _commit_actions(self.table_path, v)
            breaking = [
                a for a in actions
                if ("remove" in a and a["remove"].get("dataChange", True))
                or ("add" in a and a["add"].get("deletionVector"))
            ]
            if breaking and not self.ignore_changes:
                raise RuntimeError(
                    f"commit {v} removed files or attached deletion vectors "
                    "on the streamed table; set .option('ignoreChanges', "
                    "'true') to stream only (re-)added files "
                    "(Delta-source semantics, may emit duplicates)"
                )
            for a in actions:
                add = a.get("add")
                if add is None or not add.get("dataChange", True):
                    continue  # dataChange=false = OPTIMIZE rewrite: skip
                slices.append(DeltaSlice(
                    str(Path(self.table_path) / unquote(add["path"])),
                    add.get("partitionValues") or {},
                    self.rename,
                ))
        return slices or [DeltaSlice("", {}, {})]

    def read(self, partition: DeltaSlice):
        if not partition.path:
            return
        yield from _emit_batches(partition, self.arrow_schema)

    def commit(self, end: dict) -> None:
        pass  # progress is durable in the sink checkpoint


class DeltaChangeFeedStreamReader(DeltaStreamReader):
    """Streaming CDF over an external Delta log: per commit, native `cdc`
    actions (the change files carry `_change_type` themselves), derived
    inserts for pure-append commits, nothing for metadata-only commits,
    fail-fast on data-changing commits with no recorded change data —
    the same contract as `DeltaLogReader.table_changes` batch reads.

    Without `startingVersion`, the INITIAL batch is the current
    snapshot's live files emitted as derived INSERTs (Delta's streaming
    CDF default: latest snapshot first, then future changes) — NOT a
    replay of every commit from version 0 as change data, which would
    both duplicate history and fail-fast on any pre-CDF DML in the log."""

    def partitions(self, start: dict, end: dict):
        start_v, end_v = int(start["version"]), int(end["version"])
        slices: list[DeltaSlice] = []
        if start_v == -1 and self.starting_version is None:
            adds = self._snapshot_adds(end_v)
            dv = [a for a in adds if a.get("deletionVector")]
            if dv and not self.ignore_changes:
                raise RuntimeError(
                    f"{len(dv)} live file(s) carry deletion vectors; the "
                    "stream source reads whole files — set .option("
                    "'ignoreChanges', 'true') to stream them including "
                    "deleted rows, or OPTIMIZE the table first"
                )
            ts = _commit_ts_ms(
                self.table_path, end_v,
                _commit_actions(self.table_path, end_v),
            ) if end_v >= 0 else 0
            return [DeltaSlice(
                str(Path(self.table_path) / unquote(a["path"])),
                a.get("partitionValues") or {}, self.rename,
                "insert", end_v, ts,
            ) for a in adds] or [DeltaSlice("", {}, {})]
        for v in _json_versions(self.table_path):
            if not (start_v < v <= end_v):
                continue
            actions = _commit_actions(self.table_path, v)
            ts = _commit_ts_ms(self.table_path, v, actions)
            cdc = [a["cdc"] for a in actions if "cdc" in a]
            adds = [a["add"] for a in actions if "add" in a
                    and a["add"].get("dataChange", True)]
            removes = [a["remove"] for a in actions if "remove" in a
                       and a["remove"].get("dataChange", True)]
            dv_adds = [a for a in adds if a.get("deletionVector")]
            if cdc:
                slices.extend(DeltaSlice(
                    str(Path(self.table_path) / unquote(c["path"])),
                    c.get("partitionValues") or {}, self.rename,
                    None, v, ts,
                ) for c in cdc)
            elif adds and not removes and not dv_adds:
                slices.extend(DeltaSlice(
                    str(Path(self.table_path) / unquote(a["path"])),
                    a.get("partitionValues") or {}, self.rename,
                    "insert", v, ts,
                ) for a in adds)
            elif removes or dv_adds:
                raise RuntimeError(
                    f"change data not recorded for version {v}; enable "
                    "delta.enableChangeDataFeed before DML, or stream "
                    "without readChangeFeed"
                )
            # else: metadata-only commit — nothing changed
        return slices or [DeltaSlice("", {}, {})]


def _register_pickle_by_value() -> None:
    """Ship this module's classes inside the pickle (same session-
    portability note as stream_source.py: the planner worker's PYTHONPATH
    may not include the repo)."""
    import sys

    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass


_register_pickle_by_value()
