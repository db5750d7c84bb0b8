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
    # Round-7 rotation (VERDICT r6 #1), sized to the 50-entry budget:
    #   1. new round-7 queries — FIRST driver row, registered straight into
    #      budget slots (deferral queue stays empty),
    #   2. ALL 40 rows whose latest driver row is round 3 (the oldest hard
    #      external signal in the registry) — after this rotation no row is
    #      older than round 4,
    #   3. oldest round-4 rows to fill to exactly 50.
    # --- 1. new round-7 queries: first driver row ---
    "lake_iceberg_export", "streaming_minhash_dedup",
    # --- 2. the 40 r3-stale rows ---
    "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
    "q9_product_profit", "q10_returned_items", "q11_value_concentration",
    "q14_promo_effect", "q15_top_supplier", "q16_supplier_part_count",
    "q17_small_quantity_revenue", "q19_disjunctive_revenue",
    "q20_volume_suppliers", "q21_waiting_suppliers", "q22_dormant_customers",
    "text_pii_scrub", "sim_pairs_blocked", "multimodal_manifest_probe",
    "text_decontaminate", "sample_stratified", "sample_hash_split",
    "streaming_matview_rollup", "text_boilerplate_ngrams",
    "text_perplexity_proxy", "sample_temperature", "multimodal_frame_manifest",
    "dedup_incremental", "text_word_entropy", "fn_variant_family",
    "dedup_common_substring", "text_chunk_overlap", "streaming_stream_join",
    "streaming_dedup_drain", "multimodal_audio_stats", "text_tfidf_terms",
    "ts_gap_fill", "ts_ohlc", "ts_anomaly_mad", "agg_corr_stats",
    "agg_histogram", "sim_ann_ivfpq",
    # --- 3. oldest r4 rows, refreshed (fills to exactly 50) ---
    "graph_pagerank", "window_cume_dist", "fn_bitwise_family", "agg_mode",
    "ts_ewma", "ts_rolling_stats", "ts_interpolate_linear", "agg_filtered",
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
