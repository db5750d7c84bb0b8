#!/usr/bin/env python
"""Plan audit: walk EVERY registered query, extract physical-plan features,
and enforce the 100 TB plan discipline across the whole registry (PLANS.md
shows full plans for the headline set; this audits the rest):

- no CartesianProduct / BroadcastNestedLoopJoin outside the documented
  all-pairs baselines,
- no row-at-a-time Python (BatchEvalPython) anywhere; Arrow-batched Python
  (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) only on the
  sanctioned operators where builtins can't express the semantics,
- every scan is a columnar parquet FileScan.

Writes PLAN_AUDIT.md and exits non-zero on a violation. Queries whose
builder executes a subsystem end-to-end (streaming drains, DML roundtrips,
media staging) are planned through the same builder but skipped here — their
plan shape is pinned by dedicated tests instead (test_plans.py,
test_streaming.py).

    python tools/plan_audit.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouses_spark.registry import load_all_queries  # noqa: E402
from lakehouses_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

# builders that EXECUTE a subsystem when called (stream drains, DML arcs,
# media staging, ML training) — planned elsewhere, skipped here
HEAVY_PREFIXES = ("streaming_", "multimodal_", "lake_", "avro_", "gold_")

# documented quadratic baselines: the exact all-pairs references the ANN /
# blocked paths are verified against (guarded by ALL_PAIRS_MAX_VECTORS)
NESTED_LOOP_OK = {
    "sim_pairs_threshold": "exact all-pairs baseline (guarded, documented)",
    "sim_knn_cosine": "single broadcast query row vs corpus — O(n), not n²",
    "sim_range_search": "broadcast query BATCH (|RANGE_SEARCH_QUERIES| rows)"
    " vs corpus — O(n·|batch|), the batch is small by definition",
    "sim_filtered_knn": (
        "single broadcast query row vs the FILTERED corpus — O(n_filtered),"
        " same shape as sim_knn_cosine with the label predicate pushed down"
    ),
    "sim_knn_batch": "bounded query batch broadcast vs corpus — O(n·batch)",
    "sample_temperature": "1-row global-total broadcast crossJoin",
    "curation_mix_weights": "1-row mixture-budget broadcast crossJoin",
    "ts_funnel": "1-row-per-side funnel-stage scalar joins",
    "q11_value_concentration": "decorrelated 1-row scalar cutoff theta-compare",
    "q22_dormant_customers": "decorrelated 1-row scalar avg theta-compare",
    "random_split_sample": "1-row corpus-count broadcast crossJoin",
    "sim_ann_ivf": "bounded k-centroid assignment crossJoin (IVF design)",
    "sim_ann_ivfpq": "bounded k-centroid assignment crossJoin (IVF design)",
    "sim_pairs_blocked": "B² tile-pairing theta join (B bounded, documented)",
    "text_perplexity_proxy": "1-row vocabulary-total broadcast crossJoin",
    "sim_maxsim_multivector": (
        "bounded query-token-set broadcast vs corpus tokens — O(n·q_tokens),"
        " the MaxSim late-interaction design (re-rank stage at scale)"
    ),
    "join_bloom_prefilter": (
        "1-row bloom-bitmap broadcast crossJoin (~16 KiB array) — the probe"
        " itself is a pure projection over the fact scan"
    ),
}

# Arrow-batched Python on operators builtins can't express (SURVEY §2.11 X2
# boundary): bit-twiddling, BLAS tiles, custom UDAF/UDTF
ARROW_PYTHON_OK = {
    "dedup_simhash": "64-bit simhash accumulation (numpy-vectorized)",
    "sim_pairs_blocked": "tiled BLAS matmul (mapInPandas)",
    "dedup_embedding_cosine": "tiled BLAS matmul (mapInPandas)",
    "udaf_weighted_avg": "pandas GROUPED_AGG UDAF (the X4 surface itself)",
    "udtf_tokenize": "Python UDTF (the X4 surface itself)",
    "sim_ann_ivf": "Lloyd-iteration centroid updates (numpy)",
    "sim_ann_ivfpq": "PQ encode (vectorized argmin) + per-cell code-LUT scan",
}


def main() -> None:
    spark = get_spark(app_name="plan-audit", driver_memory="8g")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all_queries()
    rows, violations, skipped = [], [], []
    for name, rq in sorted(registry.items()):
        if name.startswith(HEAVY_PREFIXES):
            skipped.append(name)
            continue
        df = rq.fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        feats = {
            "exchanges": len(re.findall(r"\bExchange ", plan)),
            "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
            "cartesian": bool(re.search(r"CartesianProduct", plan)),
            "nested_loop": bool(re.search(r"BroadcastNestedLoopJoin", plan)),
            # BatchEvalPythonUDTF is the UDTF exec node (the X4 surface
            # itself), not a row-at-a-time scalar UDF on a relational path
            "py_row": bool(re.search(r"BatchEvalPython(?!UDTF)", plan)),
            "py_arrow": bool(
                re.search(
                    r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"
                    r"|AggregateInPandas|PythonUDTF|MapInArrow"
                    r"|BatchEvalPythonUDTF",
                    plan,
                )
            ),
            "take_ordered": bool(re.search(r"TakeOrderedAndProject", plan)),
        }
        if feats["py_row"]:
            violations.append(f"{name}: row-at-a-time BatchEvalPython")
        if feats["py_arrow"] and name not in ARROW_PYTHON_OK:
            violations.append(f"{name}: unsanctioned Arrow-Python stage")
        if (feats["cartesian"] or feats["nested_loop"]) and name not in NESTED_LOOP_OK:
            violations.append(f"{name}: unsanctioned nested-loop/cartesian join")
        rows.append((name, feats))

    lines = [
        "# PLAN_AUDIT — physical-plan features for every registered query "
        "(generated by tools/plan_audit.py, sf0.01, AQE initial plan)",
        "",
        "Discipline enforced: no `BatchEvalPython` anywhere; Arrow-Python "
        "and nested-loop joins only on the sanctioned lists in the tool "
        "(each with its justification); everything else must be pure "
        "JVM relational.",
        "",
        "| query | exchanges | broadcasts | nested-loop | arrow-python | top-k |",
        "|---|---|---|---|---|---|",
    ]
    for name, f in rows:
        nl = "baseline" if (f["cartesian"] or f["nested_loop"]) else ""
        py = "sanctioned" if f["py_arrow"] else ""
        tk = "TakeOrdered" if f["take_ordered"] else ""
        lines.append(
            f"| {name} | {f['exchanges']} | {f['broadcasts']} | {nl} | {py} | {tk} |"
        )
    lines += [
        "",
        f"Skipped (subsystem-executing builders, plan-pinned in tests): "
        f"{', '.join(sorted(skipped))}.",
        "",
        f"Violations: {violations if violations else 'NONE'}",
    ]
    Path(__file__).resolve().parent.parent.joinpath("PLAN_AUDIT.md").write_text(
        "\n".join(lines) + "\n"
    )
    print(f"{len(rows)} audited, {len(skipped)} skipped, "
          f"{len(violations)} violations")
    for v in violations:
        print("VIOLATION:", v)
    spark.stop()
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
