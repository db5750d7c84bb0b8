"""LakeCatalog — database/table namespace over LakeTable (SURVEY §2.10 D10).

The reference uses the Hive metastore's 3-level naming
(hive_metastore.bronze.retail_sales_orders — 02…/03.ingesta_incremental_v2
[json].py:202,221-228). Here the catalog is a warehouse directory:

    <warehouse>/<database>/<table>/_tx_log/...

CREATE/DROP DATABASE|TABLE, SHOW DATABASES|TABLES, and name→LakeTable
resolution; `register(...)` exposes any table (optionally a time-travel
snapshot) as a Spark temp view so the full spark.sql surface works on it.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from lakehouses_spark.tables import log as txlog
from lakehouses_spark.tables.table import LakeTable


class LakeCatalog:
    def __init__(self, spark: SparkSession, warehouse_dir: str | Path):
        self.spark = spark
        self.warehouse = Path(warehouse_dir)
        self.warehouse.mkdir(parents=True, exist_ok=True)
        self._published: set[str] = set()  # names with a live catalog view

    # --- databases ---------------------------------------------------- #
    def create_database(self, name: str, if_not_exists: bool = True) -> None:
        d = self.warehouse / name
        if d.exists() and not if_not_exists:
            raise FileExistsError(f"database exists: {name}")
        d.mkdir(parents=True, exist_ok=True)

    def drop_database(self, name: str, cascade: bool = False) -> None:
        d = self.warehouse / name
        if not d.exists():
            return
        if any(d.iterdir()) and not cascade:
            raise ValueError(f"database {name} is not empty (use cascade=True)")
        shutil.rmtree(d)

    def databases(self) -> list[str]:
        return sorted(p.name for p in self.warehouse.iterdir() if p.is_dir())

    # --- tables -------------------------------------------------------- #
    def table_path(self, name: str) -> Path:
        db, _, tbl = name.rpartition(".")
        slot = self.warehouse / (db or "default") / tbl
        # external table (CREATE TABLE ... LOCATION '<path>', S19): the
        # catalog slot holds a pointer file to the real location
        ptr = slot.parent / f"{slot.name}.location"
        if ptr.exists():
            return Path(ptr.read_text().strip())
        return slot

    def create_table(
        self, name: str, df: DataFrame, partition_by: list[str] | None = None,
        mode: str = "error", location: str | Path | None = None,
    ) -> LakeTable:
        """CREATE TABLE; `location` makes it external (data lives at the
        explicit path, the catalog keeps only a pointer — the reference's
        `CREATE TABLE ... USING delta LOCATION '/tmp/...'` at
        02.delta_lake_primer.py:93-99 / saveAsTable-with-path S19)."""
        db, _, tbl = name.rpartition(".")
        slot = self.warehouse / (db or "default") / tbl
        slot.parent.mkdir(parents=True, exist_ok=True)
        if location is not None:
            ptr = slot.parent / f"{slot.name}.location"
            ptr.write_text(str(location))
            return LakeTable.create(
                self.spark, location, df, partition_by=partition_by, mode=mode
            )
        return LakeTable.create(self.spark, slot, df, partition_by=partition_by, mode=mode)

    def table(self, name: str) -> LakeTable:
        p = self.table_path(name)
        if not txlog.list_versions(p):
            raise FileNotFoundError(f"table not found: {name} ({p})")
        return LakeTable(self.spark, p)

    def drop_table(self, name: str) -> None:
        """DROP TABLE. External tables (a `.location` pointer exists) drop
        only the catalog pointer — the data at the user's LOCATION survives,
        matching Delta/Spark external-table semantics. Managed tables
        (data lives in the warehouse slot) are deleted."""
        db, _, tbl = name.rpartition(".")
        key = f"{db or 'default'}.{tbl}"
        if key in self._published:
            self.spark.sql(f"DROP VIEW IF EXISTS `{db or 'default'}`.`{tbl}`")
            self._published.discard(key)
        ptr = self.warehouse / (db or "default") / f"{tbl}.location"
        if ptr.exists():
            ptr.unlink()
            return
        slot = self.warehouse / (db or "default") / tbl
        if slot.exists():
            shutil.rmtree(slot)

    def tables(self, database: str = "default") -> list[str]:
        d = self.warehouse / database
        if not d.is_dir():
            return []
        out = [p.name for p in d.iterdir() if txlog.list_versions(p)]
        out += [p.stem for p in d.glob("*.location")]
        return sorted(set(out))

    # --- SQL bridge ---------------------------------------------------- #
    def register(self, name: str, view_name: str | None = None,
                 version: int | None = None, timestamp_ms: int | None = None) -> str:
        """Expose a (possibly time-travel) snapshot as a temp view for
        spark.sql — the S4/D5 'query a table by name' surface."""
        view = view_name or name.replace(".", "_")
        self.table(name).read(version=version, timestamp_ms=timestamp_ms) \
            .createOrReplaceTempView(view)
        return view

    # --- session-catalog publication ----------------------------------- #
    # The reference resolves 3-level names through the Hive metastore
    # (02…/03.ingesta_incremental_v2 [json].py:202,221-228:
    # spark.sql("SELECT … FROM bronze.retail_sales_orders") with no view
    # setup). publish() reproduces that: the table becomes a catalog VIEW
    # over its CURRENT snapshot — plain-SQL self-contained (a glob scan of
    # the table's data dir pinned to the live file set via
    # _metadata.file_path, with column mapping and merge-on-read tombstones
    # expressed inline), so with a persistent metastore
    # (session.get_spark(hive_metastore_dir=…), Derby-backed) it resolves in
    # a FRESH session with no attach step at all. LakeSQL republishes after
    # DML so the view always reflects the latest committed snapshot.

    def publish(self, name: str) -> str:
        t = self.table(name)
        st = t.state()
        db, _, tbl = name.rpartition(".")
        db = db or "default"
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{db}`")
        self.spark.sql(
            f"CREATE OR REPLACE VIEW `{db}`.`{tbl}` AS {self._snapshot_sql(t, st)}"
        )
        self._published.add(f"{db}.{tbl}")
        return f"{db}.{tbl}"

    def publish_all(self) -> dict[str, str]:
        """Publish every table in the warehouse; returns {name: status}
        ('ok' or the error message — one unexpressible table must not block
        the rest)."""
        out: dict[str, str] = {}
        for db in self.databases():
            for tbl in self.tables(db):
                name = f"{db}.{tbl}"
                try:
                    self.publish(name)
                    out[name] = "ok"
                except Exception as ex:  # noqa: BLE001 — report, don't block
                    out[name] = f"{type(ex).__name__}: {ex}"
        return out

    def republish_if_published(self, name: str) -> None:
        """Refresh the catalog view after DML (no-op for unpublished tables)."""
        db, _, tbl = name.rpartition(".")
        if f"{db or 'default'}.{tbl}" in self._published:
            self.publish(name)

    def _snapshot_sql(self, t: LakeTable, st) -> str:
        return snapshot_sql(t, st)


def snapshot_sql(t: LakeTable, st) -> str:
    """A LakeTable's current snapshot as one self-contained SQL statement
    (mirrors LakeTable._snapshot: pinned live files, logical column
    mapping, per-file-group tombstone filters). Usable as a catalog VIEW
    body — shared by LakeCatalog.publish and IngestionEngine.publish."""
    import json as _json

    from pyspark.sql.types import StructType

    schema = StructType.fromJson(_json.loads(st.schema_json))
    if not st.files:
        cols = ", ".join(
            f"CAST(NULL AS {f.dataType.simpleString()}) AS `{f.name}`"
            for f in schema.fields
        )
        return f"SELECT {cols} WHERE 1 = 0"
    proj = ", ".join(
        f"`{st.column_mapping.get(f.name, f.name)}` AS `{f.name}`"
        if st.column_mapping
        else f"`{f.name}`"
        for f in schema.fields
    )
    glob = f"{t.path}/data/*/*.parquet"
    # group live files by their applicable tombstone set (a tombstone only
    # filters files that existed when it was committed) — same grouping as
    # LakeTable._snapshot
    groups: dict[tuple[str, ...], list[str]] = {}
    for rel, a in sorted(st.files.items()):
        preds = tuple(
            tb["predicate"]
            for tb in st.tombstones
            if a.get("__v", 0) < tb["version"]
        )
        groups.setdefault(preds, []).append(f"file:{t.path / rel}")
    parts = []
    # Spark reports _metadata.file_path URI-encoded; the pinned list holds
    # raw paths — decode the column (pre-escaping '+', which url_decode
    # would otherwise turn into a space) so spaced/%-paths still match.
    fp_expr = "url_decode(replace(_metadata.file_path, '+', '%2B'))"
    for preds, paths in groups.items():
        in_list = ", ".join("'{}'".format(p.replace("'", "''")) for p in paths)
        where = [f"{fp_expr} IN ({in_list})"]
        where += [f"NOT ({p})" for p in preds]
        parts.append(
            f"SELECT {proj} FROM parquet.`{glob}` WHERE " + " AND ".join(where)
        )
    return " UNION ALL ".join(parts)
