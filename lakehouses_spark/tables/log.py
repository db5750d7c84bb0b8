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
                 tombstones: list[dict] | None = None):
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
            },
            fh,
        )
    os.replace(tmp, f)  # checkpoints are derived data; last-writer-wins is fine


def _latest_checkpoint(table_path: str | Path, max_version: int) -> dict[str, Any] | None:
    d = log_dir(table_path)
    best = None
    for f in d.glob("checkpoint-*.json"):
        v = int(f.stem.split("-")[1])
        if v <= max_version and (best is None or v > best[0]):
            best = (v, f)
    if best is None:
        return None
    with open(best[1]) as fh:
        return json.load(fh)


def replay(
    table_path: str | Path,
    version: int | None = None,
    timestamp_ms: int | None = None,
) -> TableState:
    """Reconstruct table state as of a version / timestamp (D5/D6)."""
    versions = list_versions(table_path)
    if not versions:
        raise FileNotFoundError(f"not a lake table (no {LOG_DIR}): {table_path}")
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
    commits: list[dict] = []
    effective = -1
    if timestamp_ms is None:
        ckpt = _latest_checkpoint(table_path, versions[-1])
        if ckpt:
            files = dict(ckpt["files"])
            schema_json = ckpt["schema"]
            partition_by = ckpt["partition_by"]
            column_mapping = dict(ckpt.get("column_mapping") or {})
            constraints = dict(ckpt.get("constraints") or {})
            tombstones = list(ckpt.get("tombstones") or [])
            effective = ckpt["version"]
            versions = [v for v in versions if v > ckpt["version"]]
    for v in versions:
        c = read_commit(table_path, v)
        if timestamp_ms is not None and c["timestamp_ms"] > timestamp_ms:
            break
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
        if c.get("tombstone"):
            tombstones.append({"predicate": c["tombstone"], "version": v})
        if c.get("clear_tombstones"):
            tombstones = []
        for rel in c.get("remove", []):
            files.pop(rel, None)
        for add in c.get("add", []):
            # remember which commit added each file: tombstones only apply to
            # files that existed when the tombstone was committed
            files[add["path"]] = {**add, "__v": v}
    if timestamp_ms is not None and effective < 0:
        raise ValueError(f"no commit at or before timestamp_ms={timestamp_ms}")
    return TableState(effective, files, schema_json, partition_by, commits,
                      column_mapping, constraints, tombstones)


def new_data_subdir(table_path: str | Path) -> tuple[Path, str]:
    """Fresh unique directory for one commit's part-files."""
    rel = f"{DATA_DIR}/{uuid.uuid4().hex}"
    abs_dir = Path(table_path) / rel
    return abs_dir, rel
