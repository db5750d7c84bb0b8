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
    # round-3 rotation: queries UPGRADED to a real oracle this round first
    # (rows-only → twin-injection hash checks), then brand-new queries, then
    # the 36 queries whose latest driver row is round 1 (CORRECTNESS_r01 ∖
    # r02) — so no query's most recent driver verification is ever more than
    # two rounds old. Everything already driver-verified in round 2 follows
    # in registration order and fills the rest of the 50-entry budget.
    "dedup_minhash_lsh", "dedup_simhash",           # upgraded (twin oracles)
    "multimodal_metadata",                          # upgraded (manifest formula)
    "multimodal_image_pipeline",                    # upgraded (manifest formula)
    "sim_pairs_blocked", "multimodal_manifest_probe",  # new in round 3
    "dedup_embedding_cosine",                          # new in round 3
    "text_decontaminate", "sample_stratified",         # new in round 3
    "sample_hash_split", "streaming_matview_rollup",   # new in round 3
    "pack_sequences", "text_boilerplate_ngrams",       # (curation family)
    "text_perplexity_proxy", "sample_temperature",     # (curation family)
    "multimodal_frame_manifest", "dedup_incremental", # new in round 3
    "text_repetition_filter", "text_word_entropy",     # (quality filters)
    # the 34 remaining r1-only queries
    "agg_count_by_key", "agg_sum_all_numeric", "agg_global_scalars",
    "agg_having_topk", "agg_rollup", "agg_cube", "agg_grouping_sets",
    "agg_percentiles", "agg_approx_distinct",
    "dedup_exact", "dedup_ngram_jaccard",
    "join_anti", "join_broadcast_dims", "join_count_distribution",
    "subquery_scalar", "subquery_exists", "subquery_exists_not_exists",
    "subquery_in_having", "subquery_not_exists_avg", "subquery_correlated_min",
    "project_rename_derive", "distinct_projection", "filter_between_in",
    "sort_limit_topk", "set_intersect", "set_except", "union_by_name",
    "window_zscore", "udaf_weighted_avg", "udtf_tokenize",
    "sql_over_path", "gold_als_recommendations", "random_split_sample",
]


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
    )

    ordered = {n: QUERIES[n] for n in _SWEEP_PRIORITY if n in QUERIES}
    ordered.update(QUERIES)
    return ordered
