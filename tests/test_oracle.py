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


def test_no_oracle_emits_hugeint_or_decimal(duck):
    """Registry-wide guard for the r3 driver-failure class: DuckDB widens
    sum() over INTEGER to HUGEINT (int128) and decimal literals to DECIMAL,
    and the driver's value hasher is type-sensitive — 4 value-correct r3
    queries hash-failed solely because of this. Every oracle's OUTPUT types
    must stay in the hash-safe set (cast with ::BIGINT / ::DOUBLE).

    This scan needs no Spark session and no query execution (DuckDB binds
    and types the relation lazily), so it guards oracle authoring even when
    the per-query parity test is skipped. The full spark-dtype <-> duckdb
    mapping is asserted per query inside tests.oracle.compare()."""
    bad = []
    for name, rq in REGISTRY.items():
        if not rq.oracle:
            continue
        rel = duck.sql(rq.oracle)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if "HUGEINT" in t or "DECIMAL" in t:
                bad.append((name, col, t))
    assert not bad, f"hash-unsafe oracle output columns: {bad}"


def test_sweep_priority_covers_never_swept_queries():
    """Driver-budget guard: the correctness sweep walks the registry in
    order and stops at 50 entries, so every query without a row in ANY
    prior round's CORRECTNESS file must sit inside the first 50 — a newly
    registered query that silently lands outside the window would never
    get a driver row."""
    import glob
    import json
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    swept: set[str] = set()
    for f in glob.glob(str(repo / "CORRECTNESS_r*.json")):
        swept |= set(json.load(open(f)))
    if not swept:
        pytest.skip("no driver CORRECTNESS artifacts yet")
    from lakehouses_spark.registry import SWEEP_DEFERRED_TO_NEXT_ROUND

    order = list(load_all_queries())
    first_budget = set(order[:50])
    missed = [
        n
        for n in order
        if n not in swept
        and n not in first_budget
        and n not in SWEEP_DEFERRED_TO_NEXT_ROUND
    ]
    assert not missed, (
        "queries with no driver row outside the 50-entry sweep window and "
        f"not declared in SWEEP_DEFERRED_TO_NEXT_ROUND: {missed}"
    )
    # deferral is for queries that arrived after the budget filled, not an
    # excuse to bump earlier never-swept entries out of the window
    bumped = [n for n in order[:50] if n in SWEEP_DEFERRED_TO_NEXT_ROUND]
    assert not bumped, f"deferred queries displacing budgeted ones: {bumped}"
    # deferral expires: once a deferred query HAS a driver row the entry is
    # stale and must be deleted (next round's priority re-tune), so the list
    # can never become a standing exemption that hides a silently-unswept
    # query forever
    stale = [n for n in SWEEP_DEFERRED_TO_NEXT_ROUND if n in swept]
    assert not stale, (
        f"SWEEP_DEFERRED_TO_NEXT_ROUND entries already swept — remove them: {stale}"
    )
