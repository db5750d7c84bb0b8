"""Property-based scalar-function parity vs DuckDB (SURVEY §5 item 5).

Hypothesis generates value batches; each batch becomes both a Spark DataFrame
and a DuckDB table, the same expression battery runs on both, results must
agree canonically. Examples are kept few (each costs Spark jobs) but each
example carries many values.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from tests.oracle import _canon_rows

SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)
safe_strings = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="'\"\\\x00"),
    min_size=0, max_size=20,
)


def _compare(spark, rows, schema_ddl, spark_exprs, duck_sql_body):
    sdf = spark.createDataFrame(rows, schema_ddl).selectExpr(*spark_exprs)
    con = duckdb.connect()
    cols = [c.split()[0] for c in schema_ddl.split(",")]
    ddl_duck = ", ".join(
        f"{name} {'DOUBLE' if 'double' in typ else 'BIGINT' if ('long' in typ or 'int' in typ) else 'VARCHAR'}"
        for name, typ in (c.strip().split(" ", 1) for c in schema_ddl.split(","))
    )
    con.execute(f"CREATE TABLE t ({ddl_duck})")
    con.executemany(
        f"INSERT INTO t VALUES ({', '.join('?' for _ in cols)})", [list(r) for r in rows]
    )
    res = con.execute(f"SELECT {duck_sql_body} FROM t")
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    s_rows = [tuple(r) for r in sdf.collect()]
    assert _canon_rows(sdf.columns, s_rows) == _canon_rows(d_cols, d_rows)


@given(vals=st.lists(finite_doubles, min_size=1, max_size=50))
@SET
def test_math_function_parity(spark, vals):
    rows = [(i, v) for i, v in enumerate(vals)]
    _compare(
        spark, rows, "id long, x double",
        [
            "id",
            "round(abs(x), 4) AS f_abs",
            "round(floor(x) + ceil(x), 1) AS f_fc",
            "round(sqrt(abs(x)), 6) AS f_sqrt",
            "CAST(sign(x) AS DOUBLE) AS f_sign",
            "round(ln(abs(x) + 1.0), 6) AS f_ln",
            "greatest(x, 0.0) AS f_max0",
        ],
        "id, round(abs(x), 4) AS f_abs, round(floor(x) + ceil(x), 1) AS f_fc, "
        "round(sqrt(abs(x)), 6) AS f_sqrt, CAST(sign(x) AS DOUBLE) AS f_sign, "
        "round(ln(abs(x) + 1.0), 6) AS f_ln, greatest(x, 0.0) AS f_max0",
    )


@given(vals=st.lists(safe_strings, min_size=1, max_size=50))
@SET
def test_string_function_parity(spark, vals):
    rows = [(i, v) for i, v in enumerate(vals)]
    _compare(
        spark, rows, "id long, s string",
        [
            "id",
            "upper(s) AS f_upper",
            "lower(s) AS f_lower",
            "length(s) AS f_len",
            "substring(s, 2, 3) AS f_sub",
            "reverse(s) AS f_rev",
            "concat(s, '_x') AS f_cat",
            "trim(s) AS f_trim",
        ],
        "id, upper(s) AS f_upper, lower(s) AS f_lower, CAST(length(s) AS BIGINT) AS f_len, "
        "substring(s, 2, 3) AS f_sub, reverse(s) AS f_rev, concat(s, '_x') AS f_cat, "
        "trim(s) AS f_trim",
    )


@given(vals=st.lists(st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=50))
@SET
def test_integer_function_parity(spark, vals):
    rows = [(i, v) for i, v in enumerate(vals)]
    _compare(
        spark, rows, "id long, n long",
        [
            "id",
            "pmod(n, 7) AS f_pmod",
            "CAST(n / 3 AS DOUBLE) IS NOT NULL AS f_div_ok",
            "abs(n) AS f_abs",
            "CAST(n AS STRING) AS f_str",
            "greatest(n, 0) AS f_ge0",
            "least(n, 100) AS f_le100",
        ],
        "id, ((n % 7) + 7) % 7 AS f_pmod, CAST(n / 3 AS DOUBLE) IS NOT NULL AS f_div_ok, "
        "abs(n) AS f_abs, CAST(n AS VARCHAR) AS f_str, greatest(n, 0) AS f_ge0, "
        "least(n, 100) AS f_le100",
    )


@given(
    vals=st.lists(
        st.tuples(st.integers(min_value=0, max_value=4), finite_doubles),
        min_size=1, max_size=60,
    )
)
@SET
def test_aggregate_parity(spark, vals):
    """Grouped aggregates agree regardless of partitioning/summation order
    (rounding absorbs the float-order noise, as in the oracle contract)."""
    rows = [(k, v) for k, v in vals]
    import duckdb as dk

    con = dk.connect()
    con.execute("CREATE TABLE t (k INTEGER, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [list(r) for r in rows])
    want = con.execute(
        "SELECT k, count(*) AS n, round(sum(v), 3) AS s, round(min(v), 6) AS lo, "
        "round(max(v), 6) AS hi FROM t GROUP BY k"
    ).fetchall()
    from pyspark.sql import functions as F

    got = (
        spark.createDataFrame(rows, "k int, v double")
        .repartition(8)  # force multi-partition partial aggregation
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("v"), 3).alias("s"),
            F.round(F.min("v"), 6).alias("lo"),
            F.round(F.max("v"), 6).alias("hi"),
        )
        .collect()
    )
    assert _canon_rows(["k", "n", "s", "lo", "hi"], [tuple(r) for r in got]) == _canon_rows(
        ["k", "n", "s", "lo", "hi"], want
    )
