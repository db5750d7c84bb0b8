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
    # Round-11 rotation (VERDICT r10 #1), sized to the 50-entry budget:
    #   1. the 7 remaining rows whose latest driver row is round 5 —
    #      the tail of the r5 cohort the r9/r10 rotations worked down,
    #   2. 43 of the 50 rows whose latest driver row is round 7 (now
    #      the oldest cohort). The 7 left for round 12 — agg_corr_stats,
    #      agg_filtered, agg_histogram, agg_mode, fn_bitwise_family,
    #      fn_variant_family, window_cume_dist — are the simplest
    #      single-operator agg/scalar shapes in that cohort
    #      (replica-green every session); they lead the r12 rotation.
    # After r11: r11:50, r10:50, r9:50, r8:50, r7:7 — no row older than r7.
    # --- 1. the 7 r5-stale rows: hard signal lands here first ---
    "distinct_projection", "filter_between_in", "project_rename_derive",
    "set_except", "set_intersect", "union_by_name", "window_streaks",
    # --- 2. 43 of the 50 r7-stale rows ---
    "dedup_common_substring", "dedup_incremental", "graph_pagerank",
    "lake_iceberg_export", "multimodal_audio_stats",
    "multimodal_frame_manifest", "multimodal_manifest_probe",
    "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
    "q9_product_profit", "q10_returned_items", "q11_value_concentration",
    "q14_promo_effect", "q15_top_supplier", "q16_supplier_part_count",
    "q17_small_quantity_revenue", "q19_disjunctive_revenue",
    "q20_volume_suppliers", "q21_waiting_suppliers", "q22_dormant_customers",
    "sample_hash_split", "sample_stratified", "sample_temperature",
    "sim_ann_ivfpq", "sim_pairs_blocked", "streaming_dedup_drain",
    "streaming_matview_rollup", "streaming_minhash_dedup",
    "streaming_stream_join", "text_boilerplate_ngrams", "text_chunk_overlap",
    "text_decontaminate", "text_perplexity_proxy", "text_pii_scrub",
    "text_tfidf_terms", "text_word_entropy", "ts_anomaly_mad", "ts_ewma",
    "ts_gap_fill", "ts_interpolate_linear", "ts_ohlc", "ts_rolling_stats",
]

# Queries registered after the current round's 50-entry sweep budget
# filled, knowingly waiting for their first driver row until the next
# rotation (the in-repo oracle replica in tests/test_oracle.py verifies
# them with the driver's exact comparison in the meantime). The sweep-window
# guard asserts any never-swept query outside the 50-entry window appears
# HERE, so a new query can never silently fall outside the rotation.
# Round 11's budget: 7 r5-stale + 43 r7-stale = 50. The query registered
# after it filled waits here for its first driver row (the in-repo oracle
# replica verifies it with the driver's exact comparison every session);
# it joins the 7 remaining r7 rows at the head of the round-12 rotation.
SWEEP_DEFERRED_TO_NEXT_ROUND: list[str] = [
    "lake_partitioned_external_dml",
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
