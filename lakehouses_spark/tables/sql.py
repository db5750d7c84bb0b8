"""LakeSQL — SQL statement surface for the lakehouse layer (SURVEY §2.10,
§3.1).

The reference drives DML through `%sql` cells (MERGE INTO at
02.delta_lake_primer.py:312-320, DELETE :213, UPDATE :252, time travel
:404-421, VACUUM :442). Plain OSS Spark can't parse those statements without
Delta's parser extension, so this module provides the statement router:
SELECT (and anything else Spark parses) goes straight to `spark.sql` over
registered snapshot views; the Delta-specific statement shapes are parsed
here and dispatched to the LakeTable API.

Grammar (case-insensitive, one statement per call):

    INSERT INTO <table> VALUES (...), (...)
    DELETE FROM <table> WHERE <predicate>
    UPDATE <table> SET c1 = e1, c2 = e2 [WHERE <predicate>]
    MERGE INTO <table> [AS] t USING <view> [AS] s ON <cond>
        [WHEN MATCHED THEN UPDATE SET *] [WHEN MATCHED THEN DELETE]
        [WHEN NOT MATCHED THEN INSERT *]
    DESCRIBE HISTORY <table>
    DESCRIBE DETAIL <table>
    VACUUM <table> [RETAIN <n> VERSIONS]
    OPTIMIZE <table> [ZORDER BY (c1, c2)]
    SELECT ... FROM <table> [VERSION AS OF n | TIMESTAMP AS OF 'ts'] ...

Predicates/expressions inside the statements are NOT re-parsed — they pass
through to Spark expression parsing, so the full Catalyst expression grammar
works. Only the statement skeleton is matched here, with exact errors on
anything outside the grammar.
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

    def sql(self, statement: str) -> DataFrame:
        s = statement.strip().rstrip(";")
        for handler in (
            self._ddl, self._insert, self._delete, self._update, self._merge,
            self._describe, self._vacuum, self._optimize, self._select,
        ):
            out = handler(s)
            if out is not None:
                return out
        raise LakeSQLError(
            f"unsupported statement (see lakehouses_spark.tables.sql grammar): {s[:80]}"
        )

    # --- DDL (D10) ------------------------------------------------------ #
    def _ddl(self, s: str) -> DataFrame | None:
        m = _m(rf"CREATE{_WS}(?:DATABASE|SCHEMA)(?:{_WS}IF{_WS}NOT{_WS}EXISTS)?{_WS}({_ID})$", s)
        if m:
            self.catalog.create_database(m.group(1), if_not_exists="IF NOT EXISTS" in s.upper())
            return self._result(created=1)
        m = _m(rf"DROP{_WS}(?:DATABASE|SCHEMA){_WS}({_ID})(?:{_WS}(CASCADE))?$", s)
        if m:
            self.catalog.drop_database(m.group(1), cascade=bool(m.group(2)))
            return self._result(dropped=1)
        m = _m(rf"CREATE{_WS}TABLE{_WS}({_ID}){_WS}AS{_WS}(SELECT.+)$", s)
        if m:
            df = self._select(m.group(2))
            self.catalog.create_table(m.group(1), df)
            return self._result(rows=df.count())
        m = _m(rf"DROP{_WS}TABLE(?:{_WS}IF{_WS}EXISTS)?{_WS}({_ID})$", s)
        if m:
            self.catalog.drop_table(m.group(1))
            return self._result(dropped=1)
        m = _m(r"SHOW\s+(?:DATABASES|SCHEMAS)$", s)
        if m:
            return self.spark.createDataFrame(
                [(d,) for d in self.catalog.databases()] or [(None,)],
                "database string",
            ).where("database IS NOT NULL")
        m = _m(rf"SHOW{_WS}TABLES(?:{_WS}IN{_WS}({_ID}))?$", s)
        if m:
            db = m.group(1) or "default"
            return self.spark.createDataFrame(
                [(db, t) for t in self.catalog.tables(db)] or [(None, None)],
                "database string, table string",
            ).where("table IS NOT NULL")
        return None

    # --- DML ----------------------------------------------------------- #
    def _insert(self, s: str) -> DataFrame | None:
        m = _m(rf"INSERT{_WS}INTO{_WS}({_ID}){_WS}VALUES{_WS}?(.+)$", s)
        if not m:
            return None
        table, values = m.group(1), m.group(2)
        t = self.catalog.table(table)
        schema = t.schema()
        # let Spark parse the VALUES clause — full literal/expression grammar.
        # Literals come back at their own types (60000.0 → DECIMAL(6,1) under
        # ANSI); conform them to the declared column types like a real INSERT.
        from pyspark.sql import functions as F

        df = self.spark.sql(f"SELECT * FROM VALUES {values}").toDF(*schema.names)
        df = df.select(*[F.col(f.name).cast(f.dataType) for f in schema.fields])
        t.append(df)
        return self._result(rows_affected=df.count())

    def _delete(self, s: str) -> DataFrame | None:
        m = _m(rf"DELETE{_WS}FROM{_WS}({_ID}){_WS}WHERE{_WS}(.+)$", s)
        if not m:
            return None
        res = self.catalog.table(m.group(1)).delete(m.group(2))
        return self._result(**res)

    def _update(self, s: str) -> DataFrame | None:
        m = _m(rf"UPDATE{_WS}({_ID}){_WS}SET{_WS}(.+?)(?:{_WS}WHERE{_WS}(.+))?$", s)
        if not m:
            return None
        table, set_clause, where = m.group(1), m.group(2), m.group(3) or "true"
        sets: dict[str, str] = {}
        for part in _split_top_level(set_clause):
            col, _, expr = part.partition("=")
            col = col.strip()
            if not expr.strip() or not re.fullmatch(_ID, col):
                raise LakeSQLError(f"bad SET clause: {part!r} (expected col = expr)")
            sets[col] = expr.strip()
        res = self.catalog.table(table).update(sets, where=where)
        return self._result(**res)

    def _merge(self, s: str) -> DataFrame | None:
        m = _m(
            rf"MERGE{_WS}INTO{_WS}({_ID})(?:{_WS}AS)?{_WS}t{_WS}"
            rf"USING{_WS}({_ID})(?:{_WS}AS)?{_WS}s{_WS}ON{_WS}(.+?)"
            rf"((?:{_WS}WHEN{_WS}.+)?)$",
            s,
        )
        if not m:
            if _m(rf"MERGE{_WS}", s):
                raise LakeSQLError(
                    "MERGE must use aliases t (target) and s (source): "
                    "MERGE INTO <table> t USING <view> s ON <cond> ..."
                )
            return None
        table, source_view, on, clauses = m.groups()
        matched_update = "all" if _m(rf".*WHEN{_WS}MATCHED{_WS}THEN{_WS}UPDATE{_WS}SET{_WS}\*", clauses) else None
        matched_delete = bool(_m(rf".*WHEN{_WS}MATCHED{_WS}THEN{_WS}DELETE", clauses))
        insert = "all" if _m(rf".*WHEN{_WS}NOT{_WS}MATCHED{_WS}THEN{_WS}INSERT{_WS}\*", clauses) else None
        if not (matched_update or matched_delete or insert):
            matched_update, insert = "all", "all"  # bare MERGE = full upsert
        res = self.catalog.table(table).merge(
            self.spark.table(source_view),
            on,
            when_matched_update=matched_update,
            when_not_matched_insert=insert,
            when_matched_delete=matched_delete,
        )
        return self._result(**res)

    # --- maintenance / metadata ---------------------------------------- #
    def _describe(self, s: str) -> DataFrame | None:
        m = _m(rf"DESCRIBE{_WS}(HISTORY|DETAIL){_WS}({_ID})$", s)
        if not m:
            return None
        t = self.catalog.table(m.group(2))
        if m.group(1).upper() == "HISTORY":
            return t.history()
        d = t.detail()
        return self.spark.createDataFrame([{k: str(v) for k, v in d.items()}])

    def _vacuum(self, s: str) -> DataFrame | None:
        m = _m(rf"VACUUM{_WS}({_ID})(?:{_WS}RETAIN{_WS}(\d+){_WS}VERSIONS)?$", s)
        if not m:
            return None
        removed = self.catalog.table(m.group(1)).vacuum(
            retain_versions=int(m.group(2) or 0)
        )
        return self._result(files_removed=len(removed))

    def _optimize(self, s: str) -> DataFrame | None:
        m = _m(
            rf"OPTIMIZE{_WS}({_ID})(?:{_WS}ZORDER{_WS}BY{_WS}\(([^)]+)\))?$", s
        )
        if not m:
            return None
        t = self.catalog.table(m.group(1))
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
        # rewrite `tbl VERSION AS OF n` / `TIMESTAMP AS OF 'ts'` into
        # registered snapshot views, then hand the statement to Spark
        def replace(m: re.Match) -> str:
            name = m.group("table")
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
        # register plain table references that exist in the catalog
        for name in set(re.findall(rf"\b({_ID}\.{_ID})\b", rewritten)):
            try:
                view = name.replace(".", "_")
                self.catalog.register(name, view)
                rewritten = re.sub(rf"\b{re.escape(name)}\b", view, rewritten)
            except FileNotFoundError:
                pass  # not a lake table — leave for Spark to resolve
        return self.spark.sql(rewritten)

    def _result(self, **kv) -> DataFrame:
        return self.spark.createDataFrame([{k: int(v) for k, v in kv.items()}])


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
