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
    # Round-3 rotation, sized to the 50-entry budget exactly:
    #   1. all 46 NEVER-swept queries (no row in r1 ∪ r2) — every new round-3
    #      operator gets its first driver row,
    #   2. the 4 queries UPGRADED from rows-only to a real oracle since their
    #      last driver row.
    # That fills the budget. Positions 51-52 (the first to overflow) are the
    # r1-only queries whose code the round-3 hashed-shingle rewrite touched
    # (dedup_ngram_jaccard and, via it, dedup_clusters); they and the ~28
    # other r1-only rows rotate to the FRONT of round 4's sweep. The in-repo
    # oracle replica re-verifies EVERY registered query locally each
    # round, so nothing goes unchecked in the meantime.
    # --- 1. never-swept: round-3 TPC-H shape family ---
    "q2_best_supplier", "q4_priority_check", "q6_forecast_revenue",
    "q7_nation_volume", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_value_concentration", "q12_priority_split",
    "q14_promo_effect", "q15_top_supplier", "q16_supplier_part_count",
    "q17_small_quantity_revenue", "q19_disjunctive_revenue",
    "q20_volume_suppliers", "q21_waiting_suppliers", "q22_dormant_customers",
    # --- 1. never-swept: round-3 curation/dedup/multimodal/streaming ---
    "text_pii_scrub",
    "sim_pairs_blocked", "multimodal_manifest_probe",
    "dedup_embedding_cosine",
    "text_decontaminate", "sample_stratified",
    "sample_hash_split", "streaming_matview_rollup",
    "pack_sequences", "text_boilerplate_ngrams",
    "text_perplexity_proxy", "sample_temperature",
    "multimodal_frame_manifest", "dedup_incremental",
    "text_repetition_filter", "text_word_entropy",
    "fn_variant_family",
    "dedup_common_substring", "text_chunk_overlap", "streaming_stream_join",
    "streaming_dedup_drain", "multimodal_audio_stats", "text_tfidf_terms",
    # --- 1. never-swept: round-3 continuation (gap-fill/OHLC/MAD, stats
    #        aggregates, IVF-PQ) ---
    "ts_gap_fill", "ts_ohlc", "ts_anomaly_mad",
    "agg_corr_stats", "agg_histogram", "sim_ann_ivfpq",
    # --- 2. upgraded to a real oracle since their last driver row ---
    "dedup_minhash_lsh", "dedup_simhash",           # twin-injection oracles
    "multimodal_metadata", "multimodal_image_pipeline",  # manifest formulas
    # --- first overflow (position 51+): r1-only refresh, heads round 4 ---
    "dedup_ngram_jaccard", "dedup_clusters",
]

# Queries registered AFTER the round-3 sweep budget filled (the 50 slots
# above are all never-swept or oracle-upgraded entries that must not be
# displaced). These knowingly wait for their first driver row until the
# round-4 rotation — the in-repo oracle replica (tests/test_oracle.py)
# verifies them with the driver's exact comparison every round in the
# meantime. The sweep-window guard (test_oracle.py) asserts any never-swept
# query outside the 50-entry window appears HERE, so a new query can still
# never silently fall outside the rotation.
SWEEP_DEFERRED_TO_NEXT_ROUND = [
    "graph_pagerank",
    "window_cume_dist",
    "fn_bitwise_family",
    "agg_mode",
    "ts_ewma",
    "ts_rolling_stats",
    "ts_interpolate_linear",
    "agg_filtered",
    "agg_weighted_median",
    "fn_url_family",
    "agg_string_agg",
    "window_range_frame",
    "agg_bool_family",
    "fn_conv_family",
    "sim_knn_batch",
    "set_except_intersect_all",
    "agg_skew_kurtosis",
    "fn_encode_family",
    "window_nth_value",
    "ts_seasonal_decompose",
    "agg_entropy_gini",
    "fn_levenshtein_family",
    "fn_hash_family",
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
