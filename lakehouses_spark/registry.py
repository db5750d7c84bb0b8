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
    # Round-6 rotation (VERDICT r5 #2), sized to the 50-entry budget:
    #   1. new round-6 queries — FIRST driver row, registered straight into
    #      budget slots (deferral queue stays empty),
    #   2. ALL 37 rows whose latest driver row is round 2 (the oldest hard
    #      external signal in the registry) — after this rotation no row is
    #      older than round 3,
    #   3. oldest round-3 rows to fill to exactly 50.
    # --- 1. new round-6 queries: first driver row ---
    "lake_delta_log_export", "lake_scd2_build", "sim_range_search",
    "sim_ann_incremental", "join_bloom_prefilter", "join_bucketed_colocated",
    "ts_asof_nearest",
    # --- 2. the 37 r2-stale rows ---
    "join_inner_agg", "join_left_outer", "join_full_outer", "join_semi",
    "fn_string_family", "fn_date_family", "fn_array_family", "fn_json_family",
    "window_topk_per_group", "window_running_sum", "window_lag_delta",
    "window_rank_dense", "window_lead_ntile", "window_dedup_keep_latest",
    "ts_range_join", "ts_tumbling_window", "ts_sliding_window",
    "ts_daily_rollup", "ts_retention_cohorts", "ts_funnel",
    "text_token_stats", "text_quality_score", "text_langid",
    "text_bpe_token_count", "text_fingerprint", "text_bigram_topk",
    "fn_cast_family", "fn_math_conditional", "fn_map_family",
    "fn_struct_expand", "sim_pairs_threshold", "sim_centroids",
    "sim_ann_ivf", "pivot_status_by_priority", "unpivot_measures",
    "lateral_tokens_posexplode", "curation_keeplist",
    # --- 3. oldest r3 rows, refreshed (fills to exactly 50;
    #     q9_product_profit / q7_nation_volume / q8_market_share /
    #     q6_forecast_revenue displaced by the 4th-7th new r6 queries —
    #     each keeps its green r3 row and rotates next round) ---
    "multimodal_metadata", "dedup_minhash_lsh", "dedup_simhash",
    "multimodal_image_pipeline", "q2_best_supplier", "q4_priority_check",
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
