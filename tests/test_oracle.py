"""Oracle-differential tests: every registered query vs DuckDB at sf0.01 —
the exact check the driver runs (SURVEY §5 strategy item 1)."""

from __future__ import annotations

import pytest

from lakehouses_spark.registry import load_all_queries
from tests.conftest import SF_ORACLE
from tests.oracle import compare, duckdb_connection

REGISTRY = load_all_queries()
WITH_ORACLE = sorted(name for name, rq in REGISTRY.items() if rq.oracle)
ROWS_ONLY = sorted(name for name, rq in REGISTRY.items() if not rq.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    rq = REGISTRY[name]
    df = rq.fn(spark, SF_ORACLE)
    compare(df, duck, rq.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    rq = REGISTRY[name]
    df = rq.fn(spark, SF_ORACLE)
    n = df.count()
    assert n >= 0
    assert df.columns  # stable, non-empty schema
