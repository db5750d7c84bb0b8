"""Local replica of the driver's DuckDB-oracle comparison.

Used by tests/test_oracle.py so every registered query is verified exactly the
way the driver will verify it: row-count, column names, and order-insensitive
value comparison (here: full value equality after canonical sort, which is
strictly stronger than the driver's hash).
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    """Canonicalize one cell for cross-engine comparison."""
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # collapse -0.0 (DuckDB keeps the sign, Spark doesn't)
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v)
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return str(v) if v is not None else None


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, x) for x in r))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Raise AssertionError with a readable diff if spark_df != oracle."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row-count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    cs = _canon_rows(s_cols, s_rows)
    cd = _canon_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        raise AssertionError(
            f"value mismatch ({sum(1 for a, b in zip(cs, cd) if a != b)} rows differ); "
            f"first diffs (spark, duckdb): {diffs}; cols={sorted(s_cols)}"
        )
