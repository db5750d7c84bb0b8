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
    # Round-13 rotation (VERDICT r12 next-round #1), sized to the 50-entry
    # budget:
    #   1. the 4 never-swept lake arcs from SWEEP_DEFERRED_TO_NEXT_ROUND —
    #      lake_mor_delete and lake_bucket_transform_dml lead so the hard
    #      signal lands on the single-pass MOR/DV DML rewrite of the r12
    #      snapshot commit (VERDICT r12 what's-wrong #1),
    #   2. the 9 remaining rows whose latest driver row is round 8 (the
    #      scalar/window tail the r12 rotation left),
    #   3. 37 of the 50 rows whose latest driver row is round 9 (now the
    #      oldest cohort). The 13 left for round 14 — fn_array_family,
    #      fn_cast_family, fn_date_family, fn_json_family, fn_map_family,
    #      fn_math_conditional, fn_string_family, fn_struct_expand,
    #      join_full_outer, join_inner_agg, join_left_outer, join_semi,
    #      pivot_status_by_priority — are the simplest single-operator
    #      scalar/join shapes in that cohort (replica-green every session);
    #      they lead the r14 rotation.
    # After r13: r13:50, r12:50, r11:50, r10:50, r9:13 — no row older than r9.
    # --- 1. never-swept: first driver rows land here ---
    "lake_mor_delete", "lake_bucket_transform_dml",
    "lake_generated_identity_dml", "lake_insert_overwrite",
    # --- 2. the 9 r8-stale rows ---
    "fn_conv_family", "fn_encode_family", "fn_hash_family",
    "fn_levenshtein_family", "fn_url_family", "window_lag_delta",
    "window_rank_dense", "window_running_sum", "window_zscore",
    # --- 3. 37 of the 50 r9-stale rows ---
    "curation_keeplist", "dedup_minhash_lsh", "dedup_simhash",
    "join_bloom_prefilter", "join_bucketed_colocated", "lake_cdf_read",
    "lake_delta_log_export", "lake_delta_v2_checkpoint",
    "lake_expire_snapshots", "lake_iceberg_refs", "lake_scd2_build",
    "lake_uniform_export", "lateral_tokens_posexplode",
    "multimodal_image_pipeline", "multimodal_metadata", "q2_best_supplier",
    "q4_priority_check", "sim_ann_incremental", "sim_ann_ivf",
    "sim_centroids", "sim_pairs_threshold", "sim_range_search",
    "streaming_cdf_drain", "text_bigram_topk", "text_bpe_token_count",
    "text_fingerprint", "text_langid", "text_quality_score",
    "text_token_stats", "ts_asof_nearest", "ts_daily_rollup", "ts_funnel",
    "ts_range_join", "ts_retention_cohorts", "ts_sliding_window",
    "ts_tumbling_window", "unpivot_measures",
]

# Queries registered after the current round's 50-entry sweep budget
# filled, knowingly waiting for their first driver row until the next
# rotation (the in-repo oracle replica in tests/test_oracle.py verifies
# them with the driver's exact comparison in the meantime). The sweep-window
# guard asserts any never-swept query outside the 50-entry window appears
# HERE, so a new query can never silently fall outside the rotation.
# Round 13's budget: 4 never-swept + 9 r8-stale + 37 r9-stale = 50. All
# previously deferred lake arcs rotated into the head of the r13 window;
# round 13 is an optimization round and registers no new queries, so
# nothing waits here.
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
