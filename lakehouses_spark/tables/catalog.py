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
