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
    # Round-10 rotation (VERDICT r9 #1), sized to the 50-entry budget:
    #   1. new round-10 queries — FIRST driver row,
    #   2. the 4 queries deferred from round 9 — first driver row,
    #   3. 43 of the 50 rows whose latest driver row is round 5 (the
    #      cohort the r9 rotation missed). The 7 left for round 11 —
    #      distinct_projection, filter_between_in, project_rename_derive,
    #      set_except, set_intersect, union_by_name, window_streaks —
    #      are the simplest single-operator relational/window queries in
    #      that cohort (replica-green every session); they lead the
    #      round-11 rotation.
    # --- 1. new round-10 queries: first driver row ---
    "lake_iceberg_pruned_read", "lake_external_delta_dml",
    "lake_external_iceberg_dml",
    # --- 2. deferred from round 9: first driver row ---
    "streaming_delta_tail", "streaming_iceberg_tail",
    "streaming_iceberg_changelog", "lake_rewrite_compaction",
    # --- 3. 44 of the 50 r5-stale rows ---
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "agg_approx_distinct", "avro_file_roundtrip", "curation_domain_cap",
    "curation_length_profile", "curation_mix_weights",
    "curation_pipeline_report", "dedup_containment",
    "dedup_incremental_minhash", "dedup_url_canonical", "fn_interval_family",
    "fn_pad_family", "fn_regexp_family", "fn_trig_family",
    "gold_als_recommendations", "graph_triangles", "join_lateral_topk",
    "join_salted_skew", "lake_cdc_apply", "lake_clone_isolation",
    "lake_dml_roundtrip", "multimodal_tar_shards", "random_split_sample",
    "sim_ann_lsh", "sim_filtered_knn", "sim_knn_cosine",
    "sim_maxsim_multivector", "sort_limit_topk", "sql_over_path",
    "streaming_cdc_apply", "streaming_session_drain",
    "streaming_stateful_totals", "streaming_windowed_drain",
    "subquery_not_in_null_trap", "ts_asof_join", "ts_asof_tolerance",
    "ts_cross_correlation", "ts_interval_overlap_join", "ts_sessionize",
    "window_distinct_rolling", "window_rolling_median",
]

# Queries registered after the current round's 50-entry sweep budget
# filled, knowingly waiting for their first driver row until the next
# rotation (the in-repo oracle replica in tests/test_oracle.py verifies
# them with the driver's exact comparison in the meantime). The sweep-window
# guard asserts any never-swept query outside the 50-entry window appears
# HERE, so a new query can never silently fall outside the rotation.
# Round 10's budget: 3 new + 4 previously-deferred + 43 r5-stale = 50;
# every query registered so far fits, so nothing is deferred.
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
