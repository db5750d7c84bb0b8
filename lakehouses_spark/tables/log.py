"""Transaction log for LakeTable.

Layout (mirrors the `_delta_log` the reference inspects at
01.parquet_primer.py:199-222, without copying its JSON shape):

    <table>/_tx_log/0000000000.json
    <table>/_tx_log/0000000001.json
    ...
    <table>/data/<commit-uuid>/part-*.parquet

One JSON document per commit:

    {"version": 3, "timestamp_ms": ..., "operation": "DELETE",
     "operation_parameters": {...},
     "schema": "<json-serialized StructType>",        # present if changed
     "partition_by": ["col"],                          # present on create
     "add": [{"path": "data/u/part-0.parquet", "num_records": 10,
              "size_bytes": 1234, "stats": {"col": {"min": .., "max": ..}}}],
     "remove": ["data/u/part-1.parquet"]}

Commit protocol: write to `_tx_log/.tmp-<uuid>`, fsync, then
`os.rename` to the next version number — atomic on POSIX, and the rename
fails if the destination exists, which is exactly the optimistic-concurrency
single-winner rule (Delta's "mutual exclusion on log entry" contract). On an
object store without atomic rename you'd swap this function for a
commit-service/conditional-put — the rest of the layer is unchanged.

The log is the scalability story too: state reconstruction is O(log size),
not O(data size); readers plan from file-level metadata (num_records,
min/max stats) without touching parquet footers.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path
from typing import Any

LOG_DIR = "_tx_log"
DATA_DIR = "data"

# Reader/writer protocol (Delta-style): bump READER_VERSION when a log
# feature changes what a correct reader must understand; older engines then
# fail fast instead of silently misreading the table.
READER_VERSION = 1


class ProtocolError(RuntimeError):
    """The table requires a newer reader than this engine implements."""


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first (optimistic conflict)."""


def log_dir(table_path: str | Path) -> Path:
    return Path(table_path) / LOG_DIR


def _version_file(table_path: str | Path, version: int) -> Path:
    return log_dir(table_path) / f"{version:010d}.json"


def list_versions(table_path: str | Path) -> list[int]:
    d = log_dir(table_path)
    if not d.is_dir():
        return []
    out = []
    for f in d.iterdir():
        if f.suffix == ".json" and f.stem.isdigit():
            out.append(int(f.stem))
    return sorted(out)


def read_commit(table_path: str | Path, version: int) -> dict[str, Any]:
    with open(_version_file(table_path, version)) as fh:
        return json.load(fh)


def try_commit(table_path: str | Path, version: int, actions: dict[str, Any]) -> None:
    """Atomically publish `actions` as commit `version` (single winner)."""
    d = log_dir(table_path)
    d.mkdir(parents=True, exist_ok=True)
    actions = {"version": version, "timestamp_ms": int(time.time() * 1000), **actions}
    tmp = d / f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(actions, fh)
        fh.flush()
        os.fsync(fh.fileno())
    dest = _version_file(table_path, version)
    if dest.exists():  # fast-path check; the rename below is the real gate
        tmp.unlink()
        raise ConcurrentWriteError(f"version {version} already committed at {dest}")
    try:
        # os.link + unlink = atomic create-if-absent on POSIX (rename would
        # silently overwrite an existing destination).
        os.link(tmp, dest)
    except FileExistsError as e:
        raise ConcurrentWriteError(f"version {version} already committed at {dest}") from e
    finally:
        tmp.unlink(missing_ok=True)


class TableState:
    """Log replay result: the set of live files + current schema."""

    def __init__(self, version: int, files: dict[str, dict], schema_json: str | None,
                 partition_by: list[str], commits: list[dict],
                 column_mapping: dict[str, str] | None = None,
                 constraints: dict[str, str] | None = None,
                 tombstones: list[dict] | None = None,
                 properties: dict[str, str] | None = None):
        self.version = version
        self.files = files  # rel path -> add action
        self.schema_json = schema_json
        self.partition_by = partition_by
        self.commits = commits
        # logical name -> physical (in-file) name; identity entries omitted
        self.column_mapping = column_mapping or {}
        # constraint name -> boolean SQL expr every row must satisfy
        self.constraints = constraints or {}
        # merge-on-read delete predicates: [{"predicate": str, "version": int}]
        self.tombstones = tombstones or []
        # TBLPROPERTIES (ALTER TABLE SET TBLPROPERTIES, 02.delta_lake_primer.py:238-242)
        self.properties = properties or {}

    @property
    def num_records(self) -> int:
        return sum(a.get("num_records") or 0 for a in self.files.values())

    @property
    def size_bytes(self) -> int:
        return sum(a.get("size_bytes") or 0 for a in self.files.values())


def write_checkpoint(table_path: str | Path, state: "TableState") -> None:
    """Snapshot full state so replay cost stays O(CHECKPOINT_INTERVAL) no
    matter how many commits accumulate (Delta's parquet checkpoint,
    01.parquet_primer.py:386)."""
    f = log_dir(table_path) / f"checkpoint-{state.version:010d}.json"
    tmp = log_dir(table_path) / f".tmp-ckpt-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(
            {
                "version": state.version,
                "files": state.files,
                "schema": state.schema_json,
                "partition_by": state.partition_by,
                "column_mapping": state.column_mapping,
                "constraints": state.constraints,
                "tombstones": state.tombstones,
                "properties": state.properties,
            },
            fh,
        )
        fh.flush()
        os.fsync(fh.fileno())  # a torn checkpoint must never become visible
    os.replace(tmp, f)  # checkpoints are derived data; last-writer-wins is fine


def list_checkpoints(table_path: str | Path) -> list[int]:
    """Versions of readable checkpoints on disk, ascending."""
    d = log_dir(table_path)
    out = []
    for f in d.glob("checkpoint-*.json"):
        try:
            with open(f) as fh:
                json.load(fh)
            out.append(int(f.stem.split("-")[1]))
        except (json.JSONDecodeError, OSError, ValueError):
            continue
    return sorted(out)


def _latest_checkpoint(table_path: str | Path, max_version: int) -> dict[str, Any] | None:
    d = log_dir(table_path)
    candidates = sorted(
        (int(f.stem.split("-")[1]), f)
        for f in d.glob("checkpoint-*.json")
        if int(f.stem.split("-")[1]) <= max_version
    )
    # Newest first; an unreadable (torn) checkpoint falls back to the previous
    # one rather than bricking every read.
    for _v, f in reversed(candidates):
        try:
            with open(f) as fh:
                return json.load(fh)
        except (json.JSONDecodeError, OSError):
            continue
    return None


def resolve_timestamp(table_path: str | Path, timestamp_ms: int) -> int:
    """Map a timestamp to the newest commit version at or before it (D6).

    Only surviving commit files can answer this; after `cleanup_log`
    truncation, timestamps older than the retention horizon are gone and we
    raise — the same contract VACUUM imposes on old data files. Resolving
    first (then replaying by version, which goes through the checkpoint
    path) is what keeps TIMESTAMP AS OF correct after log truncation."""
    best = -1
    for v in list_versions(table_path):
        c = read_commit(table_path, v)
        if c["timestamp_ms"] <= timestamp_ms:
            best = v
    if best < 0:
        raise ValueError(
            f"no commit at or before timestamp_ms={timestamp_ms} "
            f"(history may have been truncated by log cleanup)"
        )
    return best


def replay(
    table_path: str | Path,
    version: int | None = None,
    timestamp_ms: int | None = None,
) -> TableState:
    """Reconstruct table state as of a version / timestamp (D5/D6)."""
    versions = list_versions(table_path)
    if not versions:
        raise FileNotFoundError(f"not a lake table (no {LOG_DIR}): {table_path}")
    if timestamp_ms is not None:
        # Resolve to a version first so the replay below always goes through
        # the checkpoint path — replaying raw commits from an empty state
        # silently loses data once cleanup_log has truncated old commits.
        version = resolve_timestamp(table_path, timestamp_ms)
    if version is not None:
        if version not in versions:
            raise ValueError(f"version {version} does not exist; have {versions}")
        versions = [v for v in versions if v <= version]
    files: dict[str, dict] = {}
    schema_json: str | None = None
    partition_by: list[str] = []
    column_mapping: dict[str, str] = {}
    constraints: dict[str, str] = {}
    tombstones: list[dict] = []
    properties: dict[str, str] = {}
    commits: list[dict] = []
    effective = -1
    ckpt = _latest_checkpoint(table_path, versions[-1])
    if ckpt:
        files = dict(ckpt["files"])
        schema_json = ckpt["schema"]
        partition_by = ckpt["partition_by"]
        column_mapping = dict(ckpt.get("column_mapping") or {})
        constraints = dict(ckpt.get("constraints") or {})
        tombstones = list(ckpt.get("tombstones") or [])
        properties = dict(ckpt.get("properties") or {})
        effective = ckpt["version"]
        versions = [v for v in versions if v > ckpt["version"]]
    # Versions are dense integers (every commit is previous+1), so the commits
    # between the replay start point and the target must be contiguous. A gap
    # means cleanup/corruption removed a commit we need — fail loudly instead
    # of silently reconstructing a partial table.
    expected = list(range(effective + 1, (versions[-1] + 1) if versions else effective + 1))
    if versions != expected:
        missing = sorted(set(expected) - set(versions))
        raise RuntimeError(
            f"cannot replay {table_path} to version "
            f"{versions[-1] if versions else effective}: commit files "
            f"{missing} are missing below/after checkpoint v{effective}"
        )
    for v in versions:
        c = read_commit(table_path, v)
        commits.append(c)
        effective = v
        required = (c.get("protocol") or {}).get("min_reader", 1)
        if required > READER_VERSION:
            raise ProtocolError(
                f"table requires reader protocol {required}, this engine "
                f"implements {READER_VERSION} — upgrade before reading"
            )
        if c.get("schema"):
            schema_json = c["schema"]
        if c.get("partition_by") is not None:
            partition_by = c["partition_by"]
        if c.get("column_mapping") is not None:
            column_mapping = dict(c["column_mapping"])
        if c.get("constraints") is not None:
            constraints = dict(c["constraints"])
        if c.get("properties") is not None:
            properties = dict(c["properties"])
        if c.get("tombstone"):
            tombstones.append({"predicate": c["tombstone"], "version": v})
        if c.get("clear_tombstones"):
            tombstones = []
        if c.get("set_tombstones") is not None:
            # full replacement with explicit per-tombstone versions (RESTORE
            # re-establishing the target snapshot's merge-on-read deletes)
            tombstones = [dict(t) for t in c["set_tombstones"]]
        for rel in c.get("remove", []):
            files.pop(rel, None)
        for add in c.get("add", []):
            # remember which commit added each file: tombstones only apply to
            # files that existed when the tombstone was committed. RESTORE
            # re-adds old files with their ORIGINAL add version so the
            # restored tombstones keep applying to them.
            files[add["path"]] = {**add, "__v": add.get("add_version", v)}
    return TableState(effective, files, schema_json, partition_by, commits,
                      column_mapping, constraints, tombstones, properties)


def new_data_subdir(table_path: str | Path) -> tuple[Path, str]:
    """Fresh unique directory for one commit's part-files."""
    rel = f"{DATA_DIR}/{uuid.uuid4().hex}"
    abs_dir = Path(table_path) / rel
    return abs_dir, rel
