"""Query/oracle registry — the driver-contract surface.

Every implemented operator from SURVEY §2 registers here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible,
the equivalent ANSI SQL that DuckDB runs on the same parquet as an oracle.
``__spark_entry__.py`` re-exports this registry to the driver.

Column-name parity rule: every computed/aggregate column is aliased to the
same name in both the Spark plan and the oracle SQL (the driver's comparator
sorts columns by name before hashing values).

Float parity rule: aggregate outputs over doubles are rounded (in BOTH
engines) so summation-order differences between Spark's parallel partial
aggregates and DuckDB's don't flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check


QUERIES: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = RegisteredQuery(name, fn, oracle)
        return fn

    return deco


def load_all_queries() -> dict[str, RegisteredQuery]:
    """Import every query module (side effect: registration) and return the
    registry."""
    # Imports deferred so `import lakehouses_spark` stays cheap.
    #
    # REGISTRATION ORDER MATTERS: the driver's correctness sweep walks the
    # registry in insertion order and may stop on a time budget. Modules
    # whose queries had no driver-oracle row in round 1 (windows, timeseries,
    # text, similarity, the scalar tails) register FIRST so the hard signal
    # covers them; round-1-verified relational/dedup/extensions and the
    # expensive rows-only advanced queries come last.
    from lakehouses_spark.queries import (  # noqa: F401
        windows,
        timeseries,
        text,
        similarity,
        scalar,
        relational,
        dedup,
        extensions,
        advanced,
    )

    return QUERIES
