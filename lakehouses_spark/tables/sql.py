"""LakeSQL — SQL statement surface for the lakehouse layer (SURVEY §2.10,
§3.1).

The reference drives DML through `%sql` cells (MERGE INTO at
02.delta_lake_primer.py:312-320, DELETE :213, UPDATE :252, time travel
:404-421, VACUUM :442). Plain OSS Spark can't parse those statements without
Delta's parser extension, so this module provides the statement router:
SELECT (and anything else Spark parses) goes straight to `spark.sql` over
registered snapshot views; the Delta-specific statement shapes are parsed
here and dispatched to the LakeTable API.

Grammar (case-insensitive; multiple `;`-separated statements per call — the
reference's %sql cells batch statements, e.g. 03.iceberg_primer.py:67-70):

    CREATE DATABASE|SCHEMA [IF NOT EXISTS] <db> / DROP DATABASE|SCHEMA [IF EXISTS] <db> [CASCADE]
    CREATE TABLE <t> (col type, ...) [USING fmt] [PARTITIONED BY (expr, ...)]
    CREATE TABLE <t> [USING fmt] [PARTITIONED BY (...)] [LOCATION '<path>'] AS SELECT ...
    CREATE TABLE delta.`/p`|iceberg.`/p` [PARTITIONED BY (...)] AS SELECT ...
        (path-table CTAS = format-NATIVE unmanaged table via
         write_delta_table / write_iceberg_table, r11 —
         03.iceberg_primer.py:114-124 without the jar)
    DROP TABLE [IF EXISTS] <t>
    USE <db> / SHOW CATALOGS / SHOW DATABASES / SHOW TABLES [IN db] / DESCRIBE SCHEMA <db>
    INSERT INTO <table> VALUES (...), (...)
    DELETE FROM <table> WHERE <predicate>
    DELETE FROM delta.`/p`|iceberg.`/p` WHERE <predicate>   (external COW, r11)
    UPDATE <table> SET c1 = e1, c2 = e2 [WHERE <predicate>]
    UPDATE delta.`/p`|iceberg.`/p` SET ... [WHERE ...]      (external COW, r11)
    INSERT INTO delta.`/p`|iceberg.`/p` VALUES (...)        (external append, r11)
    INSERT OVERWRITE fmt.`/p` SELECT…|VALUES…               (full overwrite, r12)
    INSERT INTO fmt.`/p` [REPLACE WHERE p] SELECT…|VALUES…  (replaceWhere / append)
    ALTER TABLE fmt.`/p` SET|UNSET TBLPROPERTIES (...)      (metadata-only, r12)
    ALTER TABLE delta.`/p` ADD CONSTRAINT n CHECK (...) / DROP CONSTRAINT n
    ALTER TABLE iceberg.`/p` ADD|DROP PARTITION FIELD <spelling>  (evolution)
    VACUUM delta.`/p` [RETAIN n HOURS]                      (external vacuum, r11)
    OPTIMIZE delta.`/p` [ZORDER BY (...)] / OPTIMIZE iceberg.`/p`
    DESCRIBE HISTORY delta.`/p`|iceberg.`/p`
    SELECT ... FROM delta.`/p` | iceberg.`/p` | parquet.`/p` ...
    MERGE INTO <table> [AS] <ta> USING <view | (subquery)> [AS] <sa> ON <cond>
        [WHEN MATCHED THEN UPDATE SET *] [WHEN MATCHED THEN DELETE]
        [WHEN NOT MATCHED THEN INSERT *]
    ALTER TABLE <t> ADD COLUMN[S] <col> <type> / DROP COLUMN <col>
        / RENAME COLUMN <a> TO <b> / SET TBLPROPERTIES ('k' = 'v', ...)
        / ADD CONSTRAINT <n> CHECK (<expr>) / DROP CONSTRAINT <n>
    DESCRIBE HISTORY|DETAIL|EXTENDED <table>
    VACUUM <table> [RETAIN <n> VERSIONS]
    OPTIMIZE <table> [ZORDER BY (c1, c2)]
    RESTORE TABLE <t> TO VERSION AS OF <n>
    SELECT ... FROM <table> [VERSION AS OF n | TIMESTAMP AS OF 'ts' | @v<n>] ...

Predicates/expressions inside the statements are NOT re-parsed — they pass
through to Spark expression parsing, so the full Catalyst expression grammar
works. Only the statement skeleton is matched here, with exact errors on
anything outside the grammar.

Name resolution mirrors the metastore's 3-level convention
(hive_metastore.bronze.orders): the last two components are (database,
table); a bare table name resolves in the current database (`USE`).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from lakehouses_spark.tables.catalog import LakeCatalog


class LakeSQLError(ValueError):
    pass


_WS = r"\s+"
_ID = r"[A-Za-z_][A-Za-z0-9_.]*"


def _m(pattern: str, stmt: str) -> re.Match | None:
    return re.match(pattern, stmt.strip(), re.IGNORECASE | re.DOTALL)


class LakeSQL:
    """Statement router bound to a LakeCatalog."""

    def __init__(self, catalog: LakeCatalog):
        self.catalog = catalog
        self.spark: SparkSession = catalog.spark
        self.current_db = "default"
        self._touched: set[str] = set()  # tables resolved by the current stmt

    def sql(self, statement: str) -> DataFrame:
        """Run one or more `;`-separated statements; returns the last
        statement's result (the reference's %sql cell behavior)."""
        out: DataFrame | None = None
        for s in _split_statements(_strip_comments(statement)):
            out = self._one(s)
        if out is None:
            raise LakeSQLError("empty statement")
        return out

    def _one(self, s: str) -> DataFrame:
        mutators = {
            self._ddl, self._alter, self._insert, self._delete,
            self._update, self._merge, self._optimize, self._restore,
        }
        for handler in (
            self._use, self._ddl, self._alter, self._insert, self._delete,
            self._update, self._merge, self._describe, self._vacuum,
            self._optimize, self._restore, self._select,
        ):
            self._touched: set[str] = set()
            out = handler(s)
            if out is not None:
                if handler in mutators:
                    # keep published catalog views in sync with the new
                    # snapshot (no-op for unpublished tables)
                    for name in self._touched:
                        self.catalog.republish_if_published(name)
                return out
        raise LakeSQLError(
            f"unsupported statement (see lakehouses_spark.tables.sql grammar): {s[:80]}"
        )

    # --- name resolution ------------------------------------------------ #
    def _qualify(self, name: str) -> str:
        """Last two dotted components are (db, table); bare names resolve in
        the current database. `hive_metastore.bronze.orders` → `bronze.orders`."""
        parts = name.split(".")
        if len(parts) == 1:
            return f"{self.current_db}.{parts[0]}"
        return ".".join(parts[-2:])

    def _table(self, name: str):
        q = self._qualify(name)
        self._touched.add(q)
        return self.catalog.table(q)

    def _use(self, s: str) -> DataFrame | None:
        m = _m(rf"USE{_WS}({_ID})$", s)
        if not m:
            return None
        name = m.group(1).split(".")[-1]
        # USE <catalog> (03.iceberg_primer.py:90) keeps the db; USE <db> sets it
        if name in self.catalog.databases() or name == "default":
            self.current_db = name
        return self._result(ok=1)

    # --- DDL (D10) ------------------------------------------------------ #
    def _ddl(self, s: str) -> DataFrame | None:
        m = _m(rf"CREATE{_WS}(?:DATABASE|SCHEMA)(?:{_WS}IF{_WS}NOT{_WS}EXISTS)?{_WS}({_ID})$", s)
        if m:
            self.catalog.create_database(
                m.group(1).split(".")[-1],
                if_not_exists="IF NOT EXISTS" in s.upper(),
            )
            return self._result(created=1)
        m = _m(rf"DROP{_WS}(?:DATABASE|SCHEMA)(?:{_WS}IF{_WS}EXISTS)?{_WS}({_ID})(?:{_WS}(CASCADE))?$", s)
        if m:
            self.catalog.drop_database(m.group(1).split(".")[-1], cascade=bool(m.group(2)))
            return self._result(dropped=1)
        # CREATE TABLE delta.`/p` | iceberg.`/p` [PARTITIONED BY (...)]
        # AS SELECT ... — Spark's PATH-TABLE CTAS: a format-NATIVE
        # unmanaged table lands at the path via write_delta_table /
        # write_iceberg_table (hive-partitioned _delta_log /
        # identity-partitioned Iceberg v2 — the reference's `USING
        # iceberg PARTITIONED BY` surface, 03.iceberg_primer.py:114-124,
        # jar-free). Query/mutate it via the `fmt.`/p`` SELECT and DML
        # spellings; `USING fmt LOCATION` below keeps its established
        # catalog-managed semantics (the by-name lifecycle).
        m = _m(
            rf"CREATE{_WS}TABLE{_WS}(delta|iceberg)\.`([^`]+)`"
            rf"(?:{_WS}PARTITIONED{_WS}BY{_WS}?\(((?:[^()]|\([^()]*\))+)\))?"
            rf"{_WS}AS{_WS}((?:SELECT|WITH).+)$",
            s,
        )
        if m:
            fmt, location, part, select = m.groups()
            partition_by = (
                [p.strip() for p in _split_top_level(part)] if part else None
            )
            df = self._select(select)
            if fmt.lower() == "delta":
                from lakehouses_spark.tables.delta_log import (
                    write_delta_table,
                )
                write_delta_table(
                    self.spark, df, location, partition_by=partition_by)
            else:
                from lakehouses_spark.tables.iceberg_meta import (
                    write_iceberg_table,
                )
                write_iceberg_table(
                    self.spark, df, location, partition_by=partition_by)
            return self._result(rows=df.count())
        # CREATE TABLE t [USING fmt] [PARTITIONED BY (...)] [LOCATION 'p']
        # AS SELECT ... (managed/external-by-pointer CTAS,
        # 02.delta_lake_primer.py:93-99)
        m = _m(
            rf"CREATE{_WS}TABLE{_WS}({_ID})"
            rf"(?:{_WS}USING{_WS}\w+)?"
            rf"(?:{_WS}PARTITIONED{_WS}BY{_WS}?\(((?:[^()]|\([^()]*\))+)\))?"
            rf"(?:{_WS}LOCATION{_WS}'([^']+)')?"
            rf"{_WS}AS{_WS}((?:SELECT|WITH).+)$",
            s,
        )
        if m:
            name, part, location, select = m.groups()
            partition_by = (
                [p.strip() for p in _split_top_level(part)] if part else None
            )
            df = self._select(select)
            self.catalog.create_table(
                self._qualify(name), df, location=location,
                partition_by=partition_by,
            )
            return self._result(rows=df.count())
        # CREATE TABLE t2 [SHALLOW|DEEP] CLONE t1 [VERSION AS OF n]
        # [LOCATION 'p'] — Delta's CLONE command (zero-copy dev snapshot /
        # deep archival copy); see LakeTable.clone for semantics
        m = _m(
            rf"CREATE{_WS}TABLE{_WS}({_ID})"
            rf"{_WS}(SHALLOW|DEEP){_WS}CLONE{_WS}({_ID})"
            rf"(?:{_WS}VERSION{_WS}AS{_WS}OF{_WS}(\d+))?"
            rf"(?:{_WS}LOCATION{_WS}'([^']+)')?$",
            s,
        )
        if m:
            name, kind, src_name, ver, location = m.groups()
            src = self._table(src_name)
            qual = self._qualify(name)
            db, _, tbl = qual.rpartition(".")
            slot = self.catalog.warehouse / (db or "default") / tbl
            slot.parent.mkdir(parents=True, exist_ok=True)
            if location is not None:
                (slot.parent / f"{slot.name}.location").write_text(str(location))
                target = location
            else:
                target = slot
            t = src.clone(
                target,
                shallow=kind.upper() == "SHALLOW",
                version=int(ver) if ver else None,
            )
            return self._result(cloned=1, n_files=len(t.state().files))
        # CREATE TABLE t (col type, ...) [USING fmt] [PARTITIONED BY (...)]
        # (explicit schema + partition transforms, 03.iceberg_primer.py:114-124)
        m = _m(
            rf"CREATE{_WS}TABLE{_WS}({_ID}){_WS}?\((.+?)\)"
            rf"(?:{_WS}USING{_WS}\w+)?"
            rf"(?:{_WS}LOCATION{_WS}'([^']+)')?"
            rf"(?:{_WS}PARTITIONED{_WS}BY{_WS}?\((.+)\))?$",
            s,
        )
        if m:
            name, cols_ddl, location, part = m.groups()
            empty = self.spark.createDataFrame([], cols_ddl)
            partition_by = (
                [p.strip().lower() for p in _split_top_level(part)] if part else None
            )
            self.catalog.create_table(
                self._qualify(name), empty,
                partition_by=partition_by, location=location,
            )
            return self._result(created=1)
        m = _m(rf"DROP{_WS}TABLE(?:{_WS}IF{_WS}EXISTS)?{_WS}({_ID})$", s)
        if m:
            self.catalog.drop_table(self._qualify(m.group(1)))
            return self._result(dropped=1)
        m = _m(r"SHOW\s+CATALOGS$", s)
        if m:
            return self.spark.createDataFrame(
                [("spark_catalog",), (self.catalog.warehouse.name,)], "catalog string"
            )
        m = _m(r"SHOW\s+(?:DATABASES|SCHEMAS)$", s)
        if m:
            return self.spark.createDataFrame(
                [(d,) for d in self.catalog.databases()] or [(None,)],
                "database string",
            ).where("database IS NOT NULL")
        m = _m(rf"SHOW{_WS}TABLES(?:{_WS}IN{_WS}({_ID}))?$", s)
        if m:
            db = (m.group(1) or self.current_db).split(".")[-1]
            return self.spark.createDataFrame(
                [(db, t) for t in self.catalog.tables(db)] or [(None, None)],
                "database string, table string",
            ).where("table IS NOT NULL")
        m = _m(rf"DESCRIBE{_WS}(?:DATABASE|SCHEMA){_WS}({_ID})$", s)
        if m:
            db = m.group(1).split(".")[-1]
            if db not in self.catalog.databases() and db != "default":
                raise LakeSQLError(f"database not found: {db}")
            return self.spark.createDataFrame(
                [(db, str(self.catalog.warehouse / db))],
                "database string, location string",
            )
        return None

    # --- ALTER TABLE (D9) ----------------------------------------------- #
    def _alter(self, s: str) -> DataFrame | None:
        # path-target ALTER (r12 continuation): SET/UNSET TBLPROPERTIES
        # on both formats, ADD/DROP CONSTRAINT on Delta — metadata-only
        # commits through the external readers, no catalog entry
        m = _m(
            rf"ALTER{_WS}TABLE{_WS}(delta|iceberg)\.`([^`]+)`"
            rf"{_WS}(.+)$", s,
        )
        if m:
            r = self._path_reader(m.group(1), m.group(2))
            rest = m.group(3)
            m2 = _m(rf"SET{_WS}TBLPROPERTIES{_WS}?\((.+)\)$", rest)
            if m2:
                props = {}
                for part in _split_top_level(m2.group(1)):
                    k, _, v = part.partition("=")
                    props[k.strip().strip("'\"")] = v.strip().strip("'\"")
                r.set_properties(props)
                return self._result(ok=len(props))
            m2 = _m(rf"UNSET{_WS}TBLPROPERTIES{_WS}?\((.+)\)$", rest)
            if m2:
                r.set_properties({
                    p.strip().strip("'\""): None
                    for p in _split_top_level(m2.group(1))})
                return self._result(ok=1)
            m2 = _m(rf"ADD{_WS}CONSTRAINT{_WS}(\w+){_WS}CHECK"
                    rf"{_WS}?\((.+)\)$", rest)
            if m2 and m.group(1).lower() == "delta":
                r.add_constraint(m2.group(1), m2.group(2))
                return self._result(ok=1)
            m2 = _m(rf"DROP{_WS}CONSTRAINT{_WS}(\w+)$", rest)
            if m2 and m.group(1).lower() == "delta":
                r.drop_constraint(m2.group(1))
                return self._result(ok=1)
            # Iceberg partition evolution (Spark-Iceberg's SQL
            # extensions): ADD/DROP PARTITION FIELD <spelling>
            m2 = _m(rf"(ADD|DROP){_WS}PARTITION{_WS}FIELD{_WS}(.+)$",
                    rest)
            if m2 and m.group(1).lower() == "iceberg":
                cur = self._spec_spellings(r)
                ent = m2.group(2).strip()
                if m2.group(1).upper() == "ADD":
                    res = r.update_spec(cur + [ent])
                else:
                    canon = ent.replace(" ", "").lower()
                    kept = [s for s in cur
                            if s.replace(" ", "").lower() != canon]
                    if len(kept) == len(cur):
                        raise LakeSQLError(
                            f"partition field {ent!r} not in the "
                            f"current spec {cur}")
                    res = r.update_spec(kept)
                return self._result(ok=1, spec_id=res["spec_id"])
            raise LakeSQLError(
                f"unsupported path-target ALTER clause: {rest[:60]}")
        m = _m(rf"ALTER{_WS}TABLE{_WS}({_ID}){_WS}(.+)$", s)
        if not m:
            return None
        t = self._table(m.group(1))
        rest = m.group(2)
        m2 = _m(rf"ADD{_WS}COLUMNS?{_WS}\(?\s*(\w+){_WS}([^),]+)\)?$", rest)
        if m2:
            t.alter_add_column(m2.group(1), m2.group(2).strip())
            return self._result(ok=1)
        m2 = _m(rf"DROP{_WS}COLUMN{_WS}(\w+)$", rest)
        if m2:
            t.alter_drop_column(m2.group(1))
            return self._result(ok=1)
        m2 = _m(rf"RENAME{_WS}COLUMN{_WS}(\w+){_WS}TO{_WS}(\w+)$", rest)
        if m2:
            t.alter_rename_column(m2.group(1), m2.group(2))
            return self._result(ok=1)
        m2 = _m(rf"SET{_WS}TBLPROPERTIES{_WS}?\((.+)\)$", rest)
        if m2:
            props = {}
            for part in _split_top_level(m2.group(1)):
                k, _, v = part.partition("=")
                props[k.strip().strip("'\"")] = v.strip().strip("'\"")
            t.set_properties(props)
            return self._result(ok=len(props))
        m2 = _m(rf"UNSET{_WS}TBLPROPERTIES{_WS}?\((.+)\)$", rest)
        if m2:
            keys = [p.strip().strip("'\"") for p in _split_top_level(m2.group(1))]
            t.unset_properties(keys)
            return self._result(ok=len(keys))
        m2 = _m(rf"ADD{_WS}CONSTRAINT{_WS}(\w+){_WS}CHECK{_WS}?\((.+)\)$", rest)
        if m2:
            t.add_constraint(m2.group(1), m2.group(2))
            return self._result(ok=1)
        m2 = _m(rf"DROP{_WS}CONSTRAINT{_WS}(\w+)$", rest)
        if m2:
            t.drop_constraint(m2.group(1))
            return self._result(ok=1)
        raise LakeSQLError(f"unsupported ALTER TABLE clause: {rest[:60]}")

    def _restore(self, s: str) -> DataFrame | None:
        m = _m(rf"RESTORE{_WS}TABLE{_WS}({_ID}){_WS}TO{_WS}VERSION{_WS}AS{_WS}OF{_WS}(\d+)$", s)
        if not m:
            return None
        res = self._table(m.group(1)).restore(int(m.group(2)))
        return self._result(**res)

    # --- DML ----------------------------------------------------------- #
    def _insert(self, s: str) -> DataFrame | None:
        # INSERT OVERWRITE fmt.`/p` SELECT…|VALUES… (full overwrite) and
        # INSERT INTO fmt.`/p` REPLACE WHERE <pred> SELECT…|VALUES…
        # (Delta's replaceWhere / Iceberg's dynamic overwrite) — one
        # atomic commit through the external readers (r12 continuation)
        m = _m(
            rf"INSERT{_WS}(?:OVERWRITE(?:{_WS}TABLE)?|INTO){_WS}"
            rf"(delta|iceberg)\.`([^`]+)`"
            rf"(?:{_WS}REPLACE{_WS}WHERE{_WS}(.+?))?"
            rf"{_WS}((?:SELECT|WITH|VALUES).+)$", s,
        )
        if m:
            from pyspark.sql import functions as F

            fmt, p, pred, body = m.groups()
            r = self._path_reader(fmt, p)
            schema = (r.snapshot().schema if fmt.lower() == "delta"
                      else r.schema())
            if body.upper().startswith("VALUES"):
                df = self.spark.sql(
                    f"SELECT * FROM {body}").toDF(*schema.names)
            else:
                df = self._select(body)
            df = df.select(
                *[F.col(c).cast(schema[c].dataType)
                  for c in df.columns if c in schema.names])
            if pred or s.upper().lstrip().startswith("INSERT OVERWRITE"):
                r.overwrite(df, replace_where=pred)
            else:
                r.append(df)  # INSERT INTO fmt.`/p` SELECT … = append
            return self._result(rows_affected=df.count())
        # INSERT INTO delta.`/p`|iceberg.`/p` VALUES ... — external blind
        # append through the format reader (r11 write plane)
        m = _m(
            rf"INSERT{_WS}INTO{_WS}(delta|iceberg)\.`([^`]+)`"
            rf"{_WS}VALUES{_WS}?(.+)$", s,
        )
        if m:
            from pyspark.sql import functions as F

            r = self._path_reader(m.group(1), m.group(2))
            schema = (
                r.snapshot().schema if m.group(1).lower() == "delta"
                else r.schema()
            )
            df = self.spark.sql(
                f"SELECT * FROM VALUES {m.group(3)}").toDF(*schema.names)
            df = df.select(
                *[F.col(f.name).cast(f.dataType) for f in schema.fields])
            r.append(df)
            return self._result(rows_affected=df.count())
        m = _m(rf"INSERT{_WS}INTO{_WS}({_ID}){_WS}VALUES{_WS}?(.+)$", s)
        if not m:
            return None
        table, values = m.group(1), m.group(2)
        t = self._table(table)
        schema = t.schema()
        # let Spark parse the VALUES clause — full literal/expression grammar.
        # Literals come back at their own types (60000.0 → DECIMAL(6,1) under
        # ANSI); conform them to the declared column types like a real INSERT.
        from pyspark.sql import functions as F

        df = self.spark.sql(f"SELECT * FROM VALUES {values}").toDF(*schema.names)
        df = df.select(*[F.col(f.name).cast(f.dataType) for f in schema.fields])
        t.append(df)
        return self._result(rows_affected=df.count())

    @staticmethod
    def _spec_spellings(r) -> list[str]:
        """The current default Iceberg spec as CTAS spellings (the
        inverse of parse_partition_by) — so ADD/DROP PARTITION FIELD
        can edit it field-by-field."""
        meta = r.meta
        spec = next(s for s in meta["partition-specs"]
                    if s["spec-id"] == meta.get("default-spec-id", 0))
        ice = next(s for s in meta["schemas"]
                   if s["schema-id"] == meta["current-schema-id"])
        name_of = {f["id"]: f["name"] for f in ice["fields"]}
        out = []
        for f in spec.get("fields") or []:
            tr, col = f["transform"], name_of[f["source-id"]]
            if tr == "identity":
                out.append(col)
            elif tr.startswith("bucket["):
                out.append(f"bucket({tr[7:-1]}, {col})")
            elif tr.startswith("truncate["):
                out.append(f"truncate({tr[9:-1]}, {col})")
            else:
                out.append(f"{tr}({col})")
        return out

    def _path_reader(self, fmt: str, p: str):
        """External reader for a format-qualified path target — the
        write-side twin of the `fmt.`path`` SELECT support: DML routed
        straight through DeltaLogReader / IcebergMetadataReader."""
        if fmt.lower() == "delta":
            from lakehouses_spark.tables.delta_log import DeltaLogReader

            return DeltaLogReader(self.spark, p)
        from lakehouses_spark.tables.iceberg_meta import (
            IcebergMetadataReader,
        )

        return IcebergMetadataReader(self.spark, p)

    def _delete(self, s: str) -> DataFrame | None:
        # WHERE is optional in Delta SQL — `DELETE FROM t` means delete
        # everything (ADVICE r11: the mandatory-WHERE regex made the
        # path-target spelling fall through as unrecognized). Predicate
        # defaults to 'true'.
        m = _m(
            rf"DELETE{_WS}FROM{_WS}(delta|iceberg)\.`([^`]+)`"
            rf"(?:{_WS}WHERE{_WS}(.+))?$", s,
        )
        if m:
            res = self._path_reader(m.group(1), m.group(2)).delete(
                m.group(3) or "true")
            return self._result(
                rewritten_files=res["rewritten_files"])
        m = _m(rf"DELETE{_WS}FROM{_WS}({_ID})(?:{_WS}WHERE{_WS}(.+))?$", s)
        if not m:
            return None
        res = self._table(m.group(1)).delete(m.group(2) or "true")
        return self._result(**res)

    def _update(self, s: str) -> DataFrame | None:
        m = _m(
            rf"UPDATE{_WS}(delta|iceberg)\.`([^`]+)`{_WS}SET{_WS}(.+)$", s,
        )
        if m:
            set_clause, where = _split_on_keyword(m.group(3), "WHERE")
            sets: dict[str, str] = {}
            for part in _split_top_level(set_clause):
                col, _, expr = part.partition("=")
                col = col.strip()
                if not expr.strip() or not re.fullmatch(_ID, col):
                    raise LakeSQLError(
                        f"bad SET clause: {part!r} (expected col = expr)")
                sets[col] = expr.strip()
            res = self._path_reader(m.group(1), m.group(2)).update(
                sets, where=where or "true")
            return self._result(
                rewritten_files=res["rewritten_files"])
        m = _m(rf"UPDATE{_WS}({_ID}){_WS}SET{_WS}(.+)$", s)
        if not m:
            return None
        # split SET/WHERE quote-aware: a literal like 'x WHERE y' in the SET
        # clause must not be taken for the real WHERE keyword
        table = m.group(1)
        set_clause, where = _split_on_keyword(m.group(2), "WHERE")
        where = where or "true"
        sets: dict[str, str] = {}
        for part in _split_top_level(set_clause):
            col, _, expr = part.partition("=")
            col = col.strip()
            if not expr.strip() or not re.fullmatch(_ID, col):
                raise LakeSQLError(f"bad SET clause: {part!r} (expected col = expr)")
            sets[col] = expr.strip()
        res = self._table(table).update(sets, where=where)
        return self._result(**res)

    def _merge(self, s: str) -> DataFrame | None:
        # arbitrary target/source aliases (the reference uses d/m at
        # 02.delta_lake_primer.py:312-320 and t/s at 03.iceberg_primer.py:205);
        # source is a view name or a parenthesized subquery
        m = _m(
            rf"MERGE{_WS}INTO{_WS}({_ID})(?:{_WS}AS)?{_WS}(\w+){_WS}"
            rf"USING{_WS}(\((?:.+)\)|{_ID})(?:{_WS}AS)?{_WS}(\w+){_WS}ON{_WS}(.+)$",
            s,
        )
        if not m:
            if _m(rf"MERGE{_WS}", s):
                raise LakeSQLError(
                    "MERGE shape: MERGE INTO <table> [AS] <ta> USING "
                    "<view | (subquery)> [AS] <sa> ON <cond> [WHEN ...]"
                )
            return None
        table, t_alias, source, s_alias, tail = m.groups()
        # ON condition ends at the first top-level WHEN (quote-aware — a
        # quoted 'WHEN' inside the condition is data, not a clause)
        on, when_tail = _split_on_keyword(tail, "WHEN")
        clauses = f" WHEN {when_tail}" if when_tail is not None else ""
        if t_alias == s_alias:
            raise LakeSQLError(f"MERGE target and source share alias {t_alias!r}")
        if source.startswith("("):
            src_df = self._select(source[1:-1].strip())
            if src_df is None:
                raise LakeSQLError(f"bad MERGE source subquery: {source[:60]}")
        else:
            src_df = self.spark.table(source)
        # LakeTable.merge's expression namespace is t (target) / s (source);
        # rewrite the statement's aliases onto it. Single-pass alternation so a
        # user alias that is literally "t" or "s" can't be rewritten twice
        # (e.g. MERGE INTO tgt AS m USING v AS t: sequential subs would turn
        # m.id -> t.id and then t.id -> s.id).
        def realias(expr: str) -> str:
            repl = {t_alias: "t.", s_alias: "s."}
            pat = rf"\b({re.escape(t_alias)}|{re.escape(s_alias)})\."
            return re.sub(pat, lambda mm: repl[mm.group(1)], expr)

        on = realias(on)
        matched_update = "all" if _m(rf".*WHEN{_WS}MATCHED{_WS}THEN{_WS}UPDATE{_WS}SET{_WS}\*", clauses) else None
        matched_delete = bool(_m(rf".*WHEN{_WS}MATCHED{_WS}THEN{_WS}DELETE", clauses))
        insert = "all" if _m(rf".*WHEN{_WS}NOT{_WS}MATCHED(?:{_WS}THEN)?{_WS}(?:THEN{_WS})?INSERT{_WS}\*", clauses) else None
        if not (matched_update or matched_delete or insert):
            matched_update, insert = "all", "all"  # bare MERGE = full upsert
        res = self._table(table).merge(
            src_df,
            on,
            when_matched_update=matched_update,
            when_not_matched_insert=insert,
            when_matched_delete=matched_delete,
        )
        return self._result(**res)

    # --- maintenance / metadata ---------------------------------------- #
    def _describe(self, s: str) -> DataFrame | None:
        m = _m(
            rf"DESCRIBE{_WS}HISTORY{_WS}(delta|iceberg)\.`([^`]+)`$", s,
        )
        if m:
            r = self._path_reader(m.group(1), m.group(2))
            if m.group(1).lower() == "delta":
                return r.describe_history()
            return r.history()  # Iceberg's .history metadata table
        m = _m(rf"DESCRIBE{_WS}(HISTORY|DETAIL|EXTENDED){_WS}({_ID})$", s)
        if not m:
            return None
        t = self._table(m.group(2))
        if m.group(1).upper() == "HISTORY":
            return t.history()
        d = t.detail()  # DETAIL and EXTENDED share the detail surface
        return self.spark.createDataFrame([{k: str(v) for k, v in d.items()}])

    def _vacuum(self, s: str) -> DataFrame | None:
        # VACUUM delta.`/p` [RETAIN n HOURS] — Delta's external vacuum
        # (retention keyed on remove-action deletionTimestamp)
        m = _m(
            rf"VACUUM{_WS}delta\.`([^`]+)`"
            rf"(?:{_WS}RETAIN{_WS}(\d+){_WS}HOURS)?$", s,
        )
        if m:
            res = self._path_reader("delta", m.group(1)).vacuum(
                retention_hours=float(m.group(2) or 168))
            return self._result(files_removed=res["deleted"])
        m = _m(rf"VACUUM{_WS}({_ID})(?:{_WS}RETAIN{_WS}(\d+){_WS}VERSIONS)?$", s)
        if not m:
            return None
        removed = self._table(m.group(1)).vacuum(
            retain_versions=int(m.group(2) or 0)
        )
        return self._result(files_removed=len(removed))

    def _optimize(self, s: str) -> DataFrame | None:
        # OPTIMIZE delta.`/p` [ZORDER BY (...)] / OPTIMIZE iceberg.`/p`
        # — external compaction (Delta OPTIMIZE / Iceberg
        # rewrite_data_files) straight over the path
        m = _m(
            rf"OPTIMIZE{_WS}(delta|iceberg)\.`([^`]+)`"
            rf"(?:{_WS}ZORDER{_WS}BY{_WS}\(([^)]+)\))?$", s,
        )
        if m:
            r = self._path_reader(m.group(1), m.group(2))
            if m.group(1).lower() == "delta":
                zcols = ([c.strip() for c in m.group(3).split(",")]
                         if m.group(3) else None)
                res = r.optimize(zorder_by=zcols)
            else:
                if m.group(3):
                    raise LakeSQLError(
                        "OPTIMIZE iceberg.`path` does not take ZORDER "
                        "(use rewrite_data_files sort orders)")
                res = r.rewrite_data_files()
            return self._result(**{
                k: v for k, v in res.items() if isinstance(v, (int, bool))})
        m = _m(
            rf"OPTIMIZE{_WS}({_ID})(?:{_WS}ZORDER{_WS}BY{_WS}\(([^)]+)\))?$", s
        )
        if not m:
            return None
        t = self._table(m.group(1))
        if m.group(2):
            cols = [c.strip() for c in m.group(2).split(",")]
            res = t.optimize_zorder(cols)
        else:
            res = t.optimize()
        return self._result(**res)

    # --- queries (time travel + passthrough) --------------------------- #
    _TRAVEL = (
        rf"(?P<table>{_ID}){_WS}(?:VERSION{_WS}AS{_WS}OF{_WS}(?P<v>\d+)"
        rf"|TIMESTAMP{_WS}AS{_WS}OF{_WS}'(?P<ts>[^']+)')"
    )

    def _select(self, s: str) -> DataFrame | None:
        if not _m(r"(SELECT|WITH)\b", s):
            return None
        # `tbl@v3` shorthand (02.delta_lake_primer.py:457) → VERSION AS OF
        s = re.sub(
            rf"\b({_ID})@v(\d+)\b", r"\1 VERSION AS OF \2", s, flags=re.IGNORECASE
        )

        # rewrite `tbl VERSION AS OF n` / `TIMESTAMP AS OF 'ts'` into
        # registered snapshot views, then hand the statement to Spark
        def replace(m: re.Match) -> str:
            name = self._qualify(m.group("table"))
            if m.group("v") is not None:
                return self.catalog.register(
                    name, f"_v{m.group('v')}_{name.replace('.', '_')}",
                    version=int(m.group("v")),
                )
            from datetime import datetime, timezone

            ts = datetime.fromisoformat(m.group("ts")).replace(tzinfo=timezone.utc)
            return self.catalog.register(
                name, f"_ts_{name.replace('.', '_')}",
                timestamp_ms=int(ts.timestamp() * 1000),
            )

        rewritten = re.sub(self._TRAVEL, replace, s, flags=re.IGNORECASE)
        # Iceberg-style metadata-table references: <table>.snapshots /
        # .files / .partitions / .history (03.iceberg_primer.py:322-402)
        def meta_replace(m: re.Match) -> str:
            name, kind = m.group(1), m.group(2).lower()
            try:
                t = self._table(name)
            except FileNotFoundError:
                return m.group(0)
            view = f"_meta_{kind}_{self._qualify(name).replace('.', '_')}"
            getattr(t, kind)().createOrReplaceTempView(view)
            return view

        rewritten = re.sub(
            r"\b([A-Za-z_][A-Za-z0-9_.]*?)\.(snapshots|files|partitions|history)\b",
            meta_replace, rewritten, flags=re.IGNORECASE,
        )

        # Spark's format-qualified path tables: SELECT ... FROM
        # delta.`/path` / iceberg.`/path` / parquet.`/path` — resolved
        # through the in-repo external readers, no jar
        # (02.delta_lake_primer.py path reads, S4 sql-over-path)
        def path_replace(m: re.Match) -> str:
            import hashlib

            fmt, p = m.group(1).lower(), m.group(2)
            view = f"_path_{fmt}_" + hashlib.md5(
                p.encode()).hexdigest()[:10]
            if fmt == "delta":
                from lakehouses_spark.tables.delta_log import read_delta

                read_delta(self.spark, p).createOrReplaceTempView(view)
            elif fmt == "iceberg":
                from lakehouses_spark.tables.iceberg_meta import (
                    read_iceberg,
                )

                read_iceberg(self.spark, p).createOrReplaceTempView(view)
            else:
                self.spark.read.parquet(p).createOrReplaceTempView(view)
            return view

        # literal-aware: a 'delta.`x`' inside a quoted string is DATA,
        # not a table reference — substitute only outside literals
        # (r11 review: the eager read during substitution would otherwise
        # raise FileNotFoundError on a query plain Spark runs fine)
        rewritten = _sub_outside_literals(
            r"\b(delta|iceberg|parquet)\.`([^`]+)`",
            path_replace, rewritten, flags=re.IGNORECASE,
        )
        # register dotted table references that exist in the catalog
        for name in set(re.findall(rf"\b({_ID}\.{_ID})\b", rewritten)):
            try:
                q = self._qualify(name)
                view = q.replace(".", "_")
                self.catalog.register(q, view)
                rewritten = re.sub(rf"\b{re.escape(name)}\b", view, rewritten)
            except FileNotFoundError:
                pass  # not a lake table — leave for Spark to resolve
        # register bare names that are tables in the current database
        for tbl in self.catalog.tables(self.current_db):
            if re.search(rf"\b{re.escape(tbl)}\b", rewritten):
                self.catalog.register(f"{self.current_db}.{tbl}", tbl)
        return self.spark.sql(rewritten)

    def _result(self, **kv) -> DataFrame:
        return self.spark.createDataFrame([{k: int(v) for k, v in kv.items()}])


def _sub_outside_literals(pattern: str, repl, text: str, flags=0) -> str:
    """`re.sub` applied only OUTSIDE single-quoted string literals
    (SQL-style '' escaping honored) — pattern rewrites must never touch
    quoted data."""
    out: list[str] = []
    i, n, seg_start = 0, len(text), 0
    while i < n:
        if text[i] == "'":
            out.append(re.sub(pattern, repl, text[seg_start:i], flags=flags))
            j = i + 1
            while j < n:
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(text[i:min(j + 1, n)])
            i = j + 1
            seg_start = i
        else:
            i += 1
    out.append(re.sub(pattern, repl, text[seg_start:], flags=flags))
    return "".join(out)


def _strip_comments(text: str) -> str:
    """Remove `-- line` and `/* block */` comments OUTSIDE string literals
    (a quoted '--' or '/*' is data, and a ';' inside a comment must not
    split statements)."""
    out, i, n, quote = [], 0, len(text), None
    while i < n:
        ch = text[i]
        if quote:
            if ch == quote:
                quote = None
            out.append(ch)
            i += 1
        elif ch in "'\"":
            quote = ch
            out.append(ch)
            i += 1
        elif text.startswith("--", i):
            j = text.find("\n", i)
            i = n if j < 0 else j  # keep the newline as whitespace
        elif text.startswith("/*", i):
            j = text.find("*/", i + 2)
            if j < 0:
                raise LakeSQLError("unterminated /* comment")
            out.append(" ")
            i = j + 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _split_on_keyword(s: str, keyword: str) -> tuple[str, str | None]:
    """Split at the FIRST occurrence of a keyword that sits outside string
    literals and parens (so `SET note = 'x WHERE y'` is never split at the
    quoted WHERE). Returns (before, after) or (s, None)."""
    depth, quote, i, n = 0, None, 0, len(s)
    kw, kn = keyword.lower(), len(keyword)
    while i < n:
        ch = s[i]
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and s[i : i + kn].lower() == kw
            and (i == 0 or not s[i - 1].isalnum() and s[i - 1] != "_")
            and (i + kn >= n or not s[i + kn].isalnum() and s[i + kn] != "_")
        ):
            return s[:i].rstrip(), s[i + kn :].lstrip()
        i += 1
    return s, None


def _split_statements(text: str) -> list[str]:
    """Split a %sql cell into statements on `;` outside quotes/parens."""
    parts, depth, buf, quote = [], 0, [], None
    for ch in text:
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == ";" and depth == 0:
            parts.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def _split_top_level(clause: str) -> list[str]:
    """Split on commas not nested in parens/quotes (SET a = f(x, y), b = 2)."""
    parts, depth, buf, quote = [], 0, [], None
    for ch in clause:
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    if buf:
        parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]
