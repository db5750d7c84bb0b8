"""Plan-shape regression tests (SURVEY §5: the reference asserts plan
properties in prose at 01.parquet_primer.py:149-165,293-319 — here they are
executable). These pin the 100 TB discipline: pushdown reaches the scan,
small dims broadcast, top-k never global-sorts, column pruning works, and
engine paths stay inside whole-stage codegen."""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from lakehouses_spark.io import load_table
from lakehouses_spark.registry import load_all_queries

SF = "/root/testdata/sf0.01"
REGISTRY = load_all_queries()


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    """The negative rule from the reference: a filter absent from
    PushedFilters means Spark filters after the read — inefficient."""
    df = REGISTRY["q1_pricing_summary"].fn(spark, SF)
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(l_shipdate" in plan


def test_partition_like_pruning_via_filters(spark):
    p = plan_of(
        load_table(spark, SF, "lineitem").where(F.col("l_quantity") > 30)
        .select("l_orderkey")
    )
    assert "GreaterThan(l_quantity,30" in p


def test_column_pruning(spark):
    """A 2-column projection must not read all 11 lineitem columns."""
    p = plan_of(load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity"))
    assert "ReadSchema" in p
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema and "l_comment" not in read_schema


def test_dim_joins_broadcast(spark):
    plan = plan_of(REGISTRY["join_broadcast_dims"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # nothing this small should SMJ


def test_topk_plans_take_ordered(spark):
    """orderBy+limit must plan TakeOrderedAndProject, not a global Sort."""
    plan = plan_of(REGISTRY["sort_limit_topk"].fn(spark, SF), "simple")
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_strategies(spark):
    for name, wanted in (("join_semi", "LeftSemi"), ("join_anti", "LeftAnti")):
        plan = plan_of(REGISTRY[name].fn(spark, SF), "simple")
        assert wanted in plan, f"{name} should plan a {wanted} join"


def test_exists_subquery_decorrelates(spark):
    """Correlated EXISTS must become a semi join, not a per-row subquery."""
    plan = plan_of(REGISTRY["subquery_exists"].fn(spark, SF), "simple")
    assert "LeftSemi" in plan


def test_whole_stage_codegen_on_hot_path(spark):
    """AQE finalizes the plan at execution — check the executed plan."""
    df = REGISTRY["q1_pricing_summary"].fn(spark, SF)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # codegen stages print as `*(N) Operator` in the final adaptive plan
    assert "*(1)" in executed and "partial_sum" in executed


def test_asof_join_is_single_shuffle_window(spark):
    """The as-of join must be the union+window merge — exactly one shuffle
    on user_id and zero join nodes with inequality conditions."""
    plan = plan_of(REGISTRY["ts_asof_join"].fn(spark, SF), "simple")
    assert "Window" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_no_python_udf_in_relational_paths(spark):
    """Core relational/text queries stay JVM-side (BatchEvalPython /
    ArrowEvalPython nodes would mean a Python boundary crossing)."""
    for name in ("q1_pricing_summary", "text_quality_score", "text_bigram_topk",
                 "sim_knn_cosine", "ts_sessionize", "fn_variant_family",
                 "sample_hash_split"):
        plan = plan_of(REGISTRY[name].fn(spark, SF), "simple")
        assert "EvalPython" not in plan, f"{name} crosses into Python"


def test_hive_partition_pruning(spark, tmp_path):
    """S2 + §4: a hive-partitioned write, read back with a partition filter,
    must prune at the directory level (PartitionFilters, not PushedFilters —
    01.parquet_primer.py:285-298)."""
    load_table(spark, SF, "orders").write.partitionBy("o_orderstatus") \
        .parquet(str(tmp_path / "p"))
    df = spark.read.parquet(str(tmp_path / "p")).where(F.col("o_orderstatus") == "F")
    plan = plan_of(df)
    assert "PartitionFilters" in plan
    pf_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "o_orderstatus" in pf_line
    # the partition predicate must NOT appear as a data-file filter (the
    # PushedFilters line may be absent entirely — also correct)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert not pushed or "o_orderstatus" not in pushed[0]


def test_partial_aggregation_before_shuffle(spark):
    """Map-side partial aggregation (HashAggregate appears before and after
    the exchange) — the property that keeps groupBy shuffle volume
    proportional to groups, not rows."""
    plan = plan_of(REGISTRY["agg_count_by_key"].fn(spark, SF), "simple")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_blocked_matmul_plan_shape(spark):
    """sim_pairs_blocked: the only Python boundary is the Arrow-batched
    tile matmul (MapInPandas), fed by BLOCK-aggregated rows — the raw
    vector rows must never meet in a row-level cartesian."""
    plan = plan_of(REGISTRY["sim_pairs_blocked"].fn(spark, SF), "simple")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    # per-block collect_list aggregation happens BEFORE the block-pair join
    assert "ObjectHashAggregate" in plan or "SortAggregate" in plan
    assert "CartesianProduct" not in plan


def test_simhash_candidate_join_is_bucket_keyed(spark):
    """dedup_simhash: candidate generation must be an equi-join on the
    block bucket (shuffle/broadcast hash join), never a nested loop over
    documents; the popcount filter rides inside the join."""
    plan = plan_of(REGISTRY["dedup_simhash"].fn(spark, SF), "simple")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "bit_count" in plan


def test_decontaminate_broadcasts_benchmark_grams(spark):
    """text_decontaminate: the benchmark gram set must broadcast (training
    grams probe it in place — no shuffle of the exploded training stream
    except the final per-doc count)."""
    plan = plan_of(REGISTRY["text_decontaminate"].fn(spark, SF), "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_boilerplate_topk_broadcasts_back(spark):
    """text_boilerplate_ngrams: heavy-hitter cut is TakeOrdered (never a
    global sort) and the K-row top set broadcasts over the gram stream."""
    plan = plan_of(REGISTRY["text_boilerplate_ngrams"].fn(spark, SF), "simple")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_pack_sequences_window_is_partitioned(spark):
    """pack_sequences: the running-offset window must be partitioned by
    source (hashpartitioning, not a single global sort partition)."""
    plan = plan_of(REGISTRY["pack_sequences"].fn(spark, SF))
    assert "hashpartitioning(source" in plan
    assert "SinglePartition" not in plan


def test_perplexity_vocab_broadcasts(spark):
    """text_perplexity_proxy: the unigram log-prob table (vocabulary-sized)
    must broadcast back over the token stream — the corpus-sized side never
    shuffles on the token."""
    plan = plan_of(REGISTRY["text_perplexity_proxy"].fn(spark, SF), "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_temperature_quota_broadcasts(spark):
    """sample_temperature: the stratum quota table joins by broadcast; the
    only corpus shuffle is the rank window partitioned on the stratum."""
    plan = plan_of(REGISTRY["sample_temperature"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(lang" in plan


def test_per_row_quality_filters_have_no_hash_shuffle(spark):
    """text_repetition_filter / text_word_entropy: per-row higher-order
    array computation — the only exchange allowed is the deterministic
    output ordering (range partitioning), never a hash shuffle."""
    for name in ("text_repetition_filter", "text_word_entropy"):
        plan = plan_of(REGISTRY[name].fn(spark, SF))
        assert "Exchange hashpartitioning" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_q6_filters_all_pushed(spark):
    """q6: every predicate (shipdate range, discount band, quantity cap)
    must reach the parquet scan — the canonical pushdown probe."""
    plan = plan_of(REGISTRY["q6_forecast_revenue"].fn(spark, SF))
    assert "PushedFilters" in plan
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24",
    ):
        assert frag in plan, f"missing pushed filter: {frag}"


def test_q19_disjunction_stays_hash_join(spark):
    """q19: Catalyst must extract the common l_partkey=p_partkey conjunct
    from the OR clauses — a nested-loop join here is the classic failure."""
    plan = plan_of(REGISTRY["q19_disjunctive_revenue"].fn(spark, SF), "simple")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q16_exclusion_is_anti_join(spark):
    plan = plan_of(REGISTRY["q16_supplier_part_count"].fn(spark, SF), "simple")
    assert "LeftAnti" in plan


def test_q22_dormancy_is_anti_join(spark):
    plan = plan_of(REGISTRY["q22_dormant_customers"].fn(spark, SF), "simple")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan  # scalar threshold broadcasts


def test_q2_correlation_is_single_window_shuffle(spark):
    """q2: the correlated max must plan as a window over the derived pair
    relation — no per-row subquery re-execution, no nested loop."""
    plan = plan_of(REGISTRY["q2_best_supplier"].fn(spark, SF), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pii_scrub_is_jvm_side_single_scan(spark):
    """text_pii_scrub: injection + regexp redaction must stay inside
    whole-stage codegen — no Python evaluation, no hash shuffle."""
    plan = plan_of(REGISTRY["text_pii_scrub"].fn(spark, SF))
    assert "BatchEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_common_substring_plan_is_hash_join_jvm_side(spark):
    """The substring-dedup self-join must be a hash/sort-merge equi-join on
    the window hash (never a nested-loop/cartesian product) and stay
    JVM-side end to end."""
    plan = plan_of(REGISTRY["dedup_common_substring"].fn(spark, SF), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_overlap_plan_is_single_narrow_stage(spark):
    """Chunking is a per-row map: no join, no aggregation exchange — the
    only Exchange allowed is the final presentation sort's range partition."""
    plan = plan_of(REGISTRY["text_chunk_overlap"].fn(spark, SF), "simple")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    import re as _re

    exchanges = _re.findall(r"Exchange (\w+)", plan)
    assert all(e == "rangepartitioning" for e in exchanges), exchanges


def test_ohlc_is_pure_hash_aggregate(spark):
    """ts_ohlc: ordered open/close via min_by/max_by must plan as ONE hash
    aggregation with map-side partial_min_by — never a Window (which would
    sort every row) and never a second hash exchange."""
    df = REGISTRY["ts_ohlc"].fn(spark, SF)
    plan = plan_of(df)
    assert "Window" not in plan
    assert "partial_min_by" in plan and "partial_max_by" in plan
    simple = plan_of(df, "simple")
    assert simple.count("Exchange hashpartitioning") == 1, simple


def test_anomaly_mad_broadcasts_stats(spark):
    """ts_anomaly_mad: both per-type stats tables (median, MAD) are tiny and
    must join back by BROADCAST — a sort-merge join would shuffle the whole
    corpus for a handful of stat rows. Three broadcast joins: the dev
    relation (corpus ⋈ median) appears twice in the DAG (once feeding the
    MAD aggregate, once as the output spine) — recomputing a cheap scan-side
    join beats materializing it."""
    plan = plan_of(REGISTRY["ts_anomaly_mad"].fn(spark, SF), "simple")
    assert plan.count("BroadcastHashJoin") == 3, plan
    assert "SortMergeJoin" not in plan


def test_gap_fill_windows_reuse_join_partitioning(spark):
    """ts_gap_fill: the grid join and LOCF window both key on user_id; the
    plan must not pay a cartesian or nested-loop for the per-key grid
    (sequence+explode is a narrow map over spans)."""
    plan = plan_of(REGISTRY["ts_gap_fill"].fn(spark, SF), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stats_aggregates_partial_aggregate_map_side(spark):
    """agg_corr_stats / agg_histogram: one-pass moment aggregations must
    partial-aggregate before the exchange (constant state per group)."""
    for name in ("agg_corr_stats", "agg_histogram"):
        plan = plan_of(REGISTRY[name].fn(spark, SF))
        assert "partial_" in plan, name
        assert "Window" not in plan, name


def test_ivfpq_candidate_stage_scans_codes_not_vectors(spark):
    """sim_ann_ivfpq: the in-cell candidate scan must run over PQ codes via
    the grouped-pandas LUT kernel (FlatMapGroupsInPandas), and the exact
    re-rank must be equi-joins on vec ids — no nested loop anywhere after
    the bounded centroid assignment."""
    plan = plan_of(REGISTRY["sim_ann_ivfpq"].fn(spark, SF), "simple")
    assert "FlatMapGroupsInPandas" in plan
    # the only BroadcastNestedLoopJoin allowed is the k-centroid assignment
    # crossJoin (bounded: cells × corpus, centroid table broadcast)
    joins = plan.count("BroadcastNestedLoopJoin")
    assert joins <= 2, plan  # seed-assign + probe-assign
    assert "CartesianProduct" not in plan


def test_salted_join_is_hash_join_with_salt_dropped(spark):
    """join_salted_skew: salting must turn the join into a plain hash/SMJ
    on (jk, _salt) — no nested loop — and the salt column must not survive
    into the output schema."""
    df = REGISTRY["join_salted_skew"].fn(spark, SF)
    plan = plan_of(df, "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "_salt" not in df.columns


def test_maxsim_query_tokens_broadcast(spark):
    """sim_maxsim_multivector: the bounded query-token set must BROADCAST
    (BroadcastNestedLoopJoin over a BroadcastExchange — the corpus never
    shuffles for candidate generation), and the per-token max / per-pair
    sum must partial-aggregate map-side."""
    plan = plan_of(REGISTRY["sim_maxsim_multivector"].fn(spark, SF), "simple")
    assert "BroadcastExchange" in plan
    assert "partial_" in plan
    assert "BatchEvalPython" not in plan  # pure JVM higher-order fns


def test_domain_cap_single_exchange_on_source(spark):
    """curation_domain_cap: the count window and the rank window share the
    source partitioning — ONE hash exchange on source serves both."""
    plan = plan_of(REGISTRY["curation_domain_cap"].fn(spark, SF), "simple")
    assert plan.count("hashpartitioning(source") == 1, plan


def test_containment_uses_hashed_inverted_index(spark):
    """dedup_containment: candidate generation must join on the 8-byte
    shingle hash (long), never shingle strings, and verification must be
    equi-joins on doc ids — no nested loop, no Python."""
    plan = plan_of(REGISTRY["dedup_containment"].fn(spark, SF), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_asof_tolerance_single_shuffle_window(spark):
    """ts_asof_tolerance: same discipline as ts_asof_join — the union+window
    merge must be windows over ONE user_id exchange, never an inequality
    join."""
    plan = plan_of(REGISTRY["ts_asof_tolerance"].fn(spark, SF), "simple")
    assert "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pipeline_report_joins_verdicts_not_bodies(spark):
    """curation_pipeline_report: the funnel joins doc_id-keyed verdict
    columns; document text must be pruned out of every join input (text
    feeds only the digest/quality/gram expressions upstream)."""
    plan = plan_of(REGISTRY["curation_pipeline_report"].fn(spark, SF), "simple")
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_interval_overlap_join_is_bucketed_equi_join(spark):
    """ts_interval_overlap_join exists to AVOID the nested-loop plan a
    keyless interval join naturally produces: the bucket explode must turn
    it into a hash equi-join on bucket ids, JVM-side end to end."""
    plan = plan_of(REGISTRY["ts_interval_overlap_join"].fn(spark, SF), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" in plan  # and it IS a join, keyed on bucket


def test_filtered_knn_pushes_label_filter_to_scan(spark):
    """sim_filtered_knn's whole point at scale: the metadata predicate
    reaches the parquet scan so the out-of-filter corpus is never read."""
    plan = plan_of(REGISTRY["sim_filtered_knn"].fn(spark, SF))
    assert "PushedFilters" in plan
    assert "In(label" in plan


def test_bucketed_join_has_no_exchange(spark):
    """join_bucketed_colocated's point: once both sides are bucketed on the
    join key with equal bucket counts, the join reads bucket-aligned scans
    with NO shuffle on either side. Auto-broadcast is disabled inside the
    test so the demo can't silently degrade to a broadcast at toy scale."""
    fn = REGISTRY["join_bucketed_colocated"].fn
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = fn(spark, SF)
        # catalog names are suffixed per (sf_dir, session) — resolve them
        tables = [t.name for t in spark.catalog.listTables()]
        bo_name = next(t for t in tables if t.startswith("lh_tmp_bucketed_orders"))
        bc_name = next(t for t in tables if t.startswith("lh_tmp_bucketed_customer"))
        bo = spark.table(bo_name)
        bc = spark.table(bc_name)
        joined = bo.join(bc, bo["o_custkey"] == bc["c_custkey"]).select(
            "o_orderkey", "c_mktsegment"
        )
        p = plan_of(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p, p
        # and the full query still matches the plain join under this conf
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bloom_prefilter_probe_is_projection(spark):
    """The bloom probe must be a pure projection over the fact scan — a
    single-row broadcast (the 16 KiB bitmap) and a filter, with no shuffle
    of the fact side before the prefilter drops non-matching rows, and no
    Python in the loop (xxhash64/bit ops are JVM intrinsics)."""
    df = REGISTRY["join_bloom_prefilter"].fn(spark, SF)
    p = plan_of(df)
    assert "BatchEvalPython" not in p
    assert "xxhash64" in p.lower()
    # the bitmap rides a BroadcastNestedLoopJoin over exactly one row;
    # the fact side's first Exchange must come only at the exact join /
    # aggregation, i.e. AFTER the bloom filter line in the formatted plan
    assert "BroadcastNestedLoopJoin" in p
