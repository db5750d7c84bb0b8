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
    # Round-12 rotation (VERDICT r11 #1), sized to the 50-entry budget:
    #   1. the 2 never-swept queries — the r11-deferred partitioned-DML
    #      flagship and round 12's new transform+evolution arc — so the
    #      hard signal lands on them first,
    #   2. the 7 remaining rows whose latest driver row is round 7 (the
    #      tail of the r7 cohort the r11 rotation worked down),
    #   3. 41 of the 50 rows whose latest driver row is round 8 (now the
    #      oldest cohort). The 9 left for round 13 — fn_conv_family,
    #      fn_encode_family, fn_hash_family, fn_levenshtein_family,
    #      fn_url_family, window_lag_delta, window_rank_dense,
    #      window_running_sum, window_zscore — are the simplest
    #      single-operator scalar/window shapes in that cohort
    #      (replica-green every session); they lead the r13 rotation.
    # After r12: r12:50, r11:50, r10:50, r9:50, r8:9 — no row older than r8.
    # --- 1. never-swept: first driver rows land here ---
    "lake_partitioned_external_dml", "lake_transform_evolution_dml",
    # --- 2. the 7 r7-stale rows ---
    "agg_corr_stats", "agg_filtered", "agg_histogram", "agg_mode",
    "fn_bitwise_family", "fn_variant_family", "window_cume_dist",
    # --- 3. 41 of the 50 r8-stale rows ---
    "agg_bool_family", "agg_count_by_key", "agg_cube", "agg_entropy_gini",
    "agg_global_scalars", "agg_grouping_sets", "agg_having_topk",
    "agg_percentiles", "agg_rollup", "agg_skew_kurtosis", "agg_string_agg",
    "agg_sum_all_numeric", "agg_weighted_median", "dedup_clusters",
    "dedup_embedding_cosine", "dedup_exact", "dedup_ngram_jaccard",
    "join_anti", "join_broadcast_dims", "join_count_distribution",
    "lake_delta_pruned_read", "pack_sequences", "q12_priority_split",
    "set_except_intersect_all", "sim_ann_drift_recall", "sim_knn_batch",
    "subquery_correlated_min", "subquery_exists",
    "subquery_exists_not_exists", "subquery_in_having",
    "subquery_not_exists_avg", "subquery_scalar", "text_repetition_filter",
    "ts_seasonal_decompose", "udaf_weighted_avg", "udtf_tokenize",
    "window_dedup_keep_latest", "window_lead_ntile", "window_nth_value",
    "window_range_frame", "window_topk_per_group",
]

# Queries registered after the current round's 50-entry sweep budget
# filled, knowingly waiting for their first driver row until the next
# rotation (the in-repo oracle replica in tests/test_oracle.py verifies
# them with the driver's exact comparison in the meantime). The sweep-window
# guard asserts any never-swept query outside the 50-entry window appears
# HERE, so a new query can never silently fall outside the rotation.
# Round 12's budget: 2 never-swept + 7 r7-stale + 41 r8-stale = 50. The
# merge-on-read DELETE arc and the bucket/truncate-transform arc
# registered after it filled wait here for their first driver rows; they
# join the 9 remaining r8 rows at the head of the round-13 rotation.
SWEEP_DEFERRED_TO_NEXT_ROUND: list[str] = [
    "lake_mor_delete",
    "lake_bucket_transform_dml",
    "lake_generated_identity_dml",
    "lake_insert_overwrite",
]
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
