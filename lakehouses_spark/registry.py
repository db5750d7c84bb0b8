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
    # Round-4 rotation, sized to the 50-entry budget exactly:
    #   1. the 23 queries deferred from round 3 (registered after that
    #      round's budget filled) — their FIRST driver row,
    #   2. the 2 r1/r2-row queries whose code the round-3 hashed-shingle
    #      rewrite touched (dedup_ngram_jaccard, dedup_clusters),
    #   3. the 4 round-3 hash-fails — all value-correct, oracle HUGEINT
    #      type artifact, oracles now CAST(... AS BIGINT) — re-swept to
    #      turn their rows green (q12, embedding-cosine, pack, repetition),
    #   4. 21 of the 33 r1-only rows (oracle-checked ones first; the 8
    #      simplest stable shapes + 3 rows-only-by-design wait for r5).
    # --- 1. round-3 deferred: first driver row ---
    "graph_pagerank", "window_cume_dist", "fn_bitwise_family", "agg_mode",
    "ts_ewma", "ts_rolling_stats", "ts_interpolate_linear", "agg_filtered",
    "agg_weighted_median", "fn_url_family", "agg_string_agg",
    "window_range_frame", "agg_bool_family", "fn_conv_family",
    "sim_knn_batch", "set_except_intersect_all", "agg_skew_kurtosis",
    "fn_encode_family", "window_nth_value", "ts_seasonal_decompose",
    "agg_entropy_gini", "fn_levenshtein_family", "fn_hash_family",
    # --- 2. code rewritten in r3, driver rows stale ---
    "dedup_ngram_jaccard", "dedup_clusters",
    # --- 3. r3 hash-fails, oracle type-cast fixed this round ---
    "q12_priority_split", "dedup_embedding_cosine", "pack_sequences",
    "text_repetition_filter",
    # --- 4. r1-only refresh (21 of 33; oldest oracle-checked rows) ---
    "agg_count_by_key", "agg_cube", "agg_global_scalars",
    "agg_grouping_sets", "agg_having_topk", "agg_percentiles",
    "agg_rollup", "agg_sum_all_numeric", "dedup_exact", "join_anti",
    "join_broadcast_dims", "join_count_distribution",
    "subquery_correlated_min", "subquery_exists",
    "subquery_exists_not_exists", "subquery_in_having",
    "subquery_not_exists_avg", "subquery_scalar", "udaf_weighted_avg",
    "udtf_tokenize", "window_zscore",
    # --- first overflow (position 51+): remaining r1-only, heads round 5 ---
    "project_rename_derive", "filter_between_in", "distinct_projection",
    "sort_limit_topk", "set_except", "set_intersect", "union_by_name",
    "sql_over_path",
]

# Queries registered AFTER the round-4 sweep budget filled (the 50 slots
# above are the round-3 deferrals, rewrite-stale rows, fixed hash-fails and
# oldest r1-only refreshes, which must not be displaced). These knowingly
# wait for their first driver row until the round-5 rotation — the in-repo
# oracle replica (tests/test_oracle.py) verifies them with the driver's
# exact comparison every round in the meantime. The sweep-window guard
# (test_oracle.py) asserts any never-swept query outside the 50-entry
# window appears HERE, so a new query can still never silently fall
# outside the rotation.
SWEEP_DEFERRED_TO_NEXT_ROUND: list[str] = [
    # round-4 additions (registered after the r4 budget filled)
    "dedup_containment",
    "fn_trig_family",
    "fn_regexp_family",
    "curation_domain_cap",
    "dedup_url_canonical",
    "sim_maxsim_multivector",
    "join_salted_skew",
    "ts_asof_tolerance",
    "window_distinct_rolling",
    "fn_interval_family",
    "graph_triangles",
    "curation_pipeline_report",
    "fn_pad_family",
    "multimodal_tar_shards",
    "curation_length_profile",
    "window_rolling_median",
    "ts_cross_correlation",
    "window_streaks",
    "subquery_not_in_null_trap",
    "streaming_session_drain",
    "lake_clone_isolation",
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
