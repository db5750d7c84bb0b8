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


# The driver's correctness sweep walks the registry in insertion order and
# stops on a budget (round 1: exactly the first 50 entries). Queries that
# still lack a driver-oracle CORRECTNESS row — no row in round 1, or
# upgraded from rows-only to a real oracle since — are listed here to be
# emitted FIRST, so the hard signal lands on them; everything already
# driver-verified in round 1 follows in registration order.
_SWEEP_PRIORITY = [
    # Round-5 rotation, sized to the 50-entry budget exactly:
    #   1. the 21 round-4 additions that were deferred past the r4 budget
    #      (SWEEP_DEFERRED_TO_NEXT_ROUND, now cleared) — FIRST driver row,
    #   2. all 11 remaining r1-only rows (8 oracle-checked stable shapes
    #      + the 3 rows-only-by-design queries) — after this rotation no
    #      driver row in the registry is older than round 2,
    #   3. new round-5 queries — first driver row, registered into free
    #      budget slots so the deferral queue stays empty,
    #   4. oldest round-2 rows (headline TPC-H, lakehouse DML, streaming
    #      drains, then the longest-untouched families) to fill to 50.
    # --- 1. round-4 deferred: first driver row (21) ---
    "dedup_containment", "fn_trig_family", "fn_regexp_family",
    "curation_domain_cap", "dedup_url_canonical", "sim_maxsim_multivector",
    "join_salted_skew", "ts_asof_tolerance", "window_distinct_rolling",
    "fn_interval_family", "graph_triangles", "curation_pipeline_report",
    "fn_pad_family", "multimodal_tar_shards", "curation_length_profile",
    "window_rolling_median", "ts_cross_correlation", "window_streaks",
    "subquery_not_in_null_trap", "streaming_session_drain",
    "lake_clone_isolation",
    # --- 2. r1-only refresh: the final 11 (zero r1 rows remain after) ---
    "project_rename_derive", "filter_between_in", "distinct_projection",
    "sort_limit_topk", "set_except", "set_intersect", "union_by_name",
    "sql_over_path", "agg_approx_distinct", "random_split_sample",
    "gold_als_recommendations",
    # --- 3. new round-5 queries: first driver row ---
    "dedup_incremental_minhash", "sim_filtered_knn",
    "ts_interval_overlap_join", "lake_cdc_apply", "streaming_cdc_apply",
    "join_lateral_topk", "curation_mix_weights",
    # --- 4. oldest r2 rows, refreshed (fills to exactly 50) ---
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "lake_dml_roundtrip", "streaming_windowed_drain",
    "streaming_stateful_totals", "avro_file_roundtrip", "ts_asof_join",
    "ts_sessionize", "sim_knn_cosine", "sim_ann_lsh",
]

# Queries registered after the current round's 50-entry sweep budget
# filled, knowingly waiting for their first driver row until the next
# rotation (the in-repo oracle replica in tests/test_oracle.py verifies
# them with the driver's exact comparison in the meantime). The sweep-window
# guard asserts any never-swept query outside the 50-entry window appears
# HERE, so a new query can never silently fall outside the rotation.
# Round 5 registers new queries directly into free budget slots (tier 3
# above), so the queue is EMPTY — the r3/r4 pattern of rolling deferrals
# stops here.
SWEEP_DEFERRED_TO_NEXT_ROUND: list[str] = []
_SWEEP_PRIORITY += SWEEP_DEFERRED_TO_NEXT_ROUND


def load_all_queries() -> dict[str, RegisteredQuery]:
    """Import every query module (side effect: registration) and return the
    registry, sweep-priority entries first."""
    # Imports deferred so `import lakehouses_spark` stays cheap.
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
        curation,
        tpch,
        graph,
    )

    ordered = {n: QUERIES[n] for n in _SWEEP_PRIORITY if n in QUERIES}
    ordered.update(QUERIES)
    return ordered
