#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line.

Two timed passes per query:

- **cold**: `spark.catalog.clearCache()` before every query, so each timed
  run exercises the real scan path (parquet IO, pushdown, pruning) — a
  regression in the scan layer shows up here. JVM/codegen are warmed once
  beforehand so this isn't a JVM-startup benchmark.
- **warm**: all input tables cached in executor memory first — steady-state
  compute throughput (shuffles, aggs, joins) with IO removed.

The headline `value` is the cold total (the honest number); round-1's
12.967 s anchor was a warm measurement and is compared against `warm_total`
(see BASELINE.md).

Contamination evidence (VERDICT r2: the driver's r2 artifact was polluted by
concurrent load — its warm q1 exceeded its own cold q1, which is physically
impossible on a quiet machine): the JSON now embeds `loadavg_start`/
`loadavg_end` (1/5/15-min) and per-pass wall-clock. A query whose warm time
exceeds its cold time is retried once (interference, not physics); if the
inversion persists, `warm_gt_cold` lists it so the artifact self-reports its
own invalidity. Interpret any run with loadavg_start[0] >> cpu count or a
non-empty warm_gt_cold as contaminated — see BASELINE.md.

Round-6 protocol hardening (VERDICT r5 #3, after two consecutive rounds of
loaded-machine artifacts): the run now GATES on loadavg at startup. It polls
until the 1-minute loadavg drops below LOADAVG_GATE (1.5) AND the 5-minute
average below LOADAVG5_GATE (3.0 — r8: a lull on a busy box passed the 1-min
gate in r7 and contaminated the round's numbers), waiting up to
$SPARK_GRAFT_BENCH_MAX_WAIT seconds (default 900 — load decays with a ~1-min
time constant, so a just-finished test suite drains well inside that). If the
machine never quiets, it REFUSES to run (exit 2) rather than emitting another
noise-bounded artifact, unless --force / SPARK_GRAFT_BENCH_FORCE=1 is given
(the forced artifact carries "loadavg_gate": "forced" so it self-reports).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_broadcast_dims",
    "agg_having_topk",
    "window_topk_per_group",
    "ts_asof_join",
    "ts_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_knn_cosine",
    "text_bigram_topk",
]

R1_WARM_TOTAL = 12.967  # round-1 anchor (warm pass, sf0.1, local[32])

# Tracked OUTSIDE the headline totals (VERDICT r3 #6): the most complex plan
# in the registry (8 exchanges) as a curation-tier canary, plus (r9) the
# maintenance-arc canary — CTAS+appends+MOR-delete → Iceberg export →
# rewrite_data_files → aggregate, the full metadata-plane round trip. Their
# times are reported per-pass but never enter value/cold_total/warm_total,
# so the round-over-round headline comparison stays apples-to-apples.
TRACKED_EXTRA = ["text_perplexity_proxy", "lake_rewrite_compaction"]


LOADAVG_GATE = 1.5  # BASELINE.md: only quiet runs are comparable across rounds
# VERDICT r7 #1: the 1-min average alone let a run start in a lull of a busy
# box (r7 released at loadavg[1]=6.4 and regressed 13.5% cold). Gate the
# 5-min average too, at a looser bound — it decays slowly after real work
# stops, so demanding < LOADAVG_GATE there would wait ~10 idle minutes.
LOADAVG5_GATE = 3.0


def _quiet(loads: tuple[float, float, float]) -> bool:
    return loads[0] < LOADAVG_GATE and loads[1] < LOADAVG5_GATE


def wait_for_quiet_machine() -> str:
    """Block until loadavg[0] < LOADAVG_GATE; refuse to run if it never quiets.

    Returns the gate disposition recorded in the artifact: "passed" (quiet at
    first check), "waited" (quieted within the window), or "forced".
    """
    forced = "--force" in sys.argv or os.environ.get("SPARK_GRAFT_BENCH_FORCE") == "1"
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT", "900"))
    deadline = time.time() + max_wait
    first = os.getloadavg()
    if _quiet(first):
        return "passed"
    if forced:
        print(
            f"bench: loadavg {first[0]:.2f}/{first[1]:.2f} >= gate "
            f"{LOADAVG_GATE}/{LOADAVG5_GATE}, forced on", file=sys.stderr,
        )
        return "forced"
    while time.time() < deadline:
        load = os.getloadavg()
        if _quiet(load):
            return "waited"
        print(
            f"bench: loadavg {load[0]:.2f}/{load[1]:.2f} >= gate "
            f"{LOADAVG_GATE}/{LOADAVG5_GATE}, waiting for quiet machine "
            f"({deadline - time.time():.0f}s left)",
            file=sys.stderr,
        )
        time.sleep(15)
    print(
        f"bench: machine never quieted below {LOADAVG_GATE} within {max_wait:.0f}s "
        "— refusing to emit a contaminated artifact (rerun, or --force).",
        file=sys.stderr,
    )
    sys.exit(2)


def _validation_path() -> Path:
    """BENCH_r{next}_validation.json next to the round artifacts (VERDICT
    r8 #8): when a round keeps a cleaner re-run, it ships as a
    machine-checkable artifact, not a prose table row. `next` = one past
    the newest driver-written BENCH_r{N}.json, i.e. the round in progress."""
    root = Path(__file__).resolve().parent
    ns = [
        int(p.stem[7:9]) for p in root.glob("BENCH_r[0-9][0-9].json")
    ]
    return root / f"BENCH_r{(max(ns) + 1) if ns else 1:02d}_validation.json"


def main() -> None:
    gate = wait_for_quiet_machine()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf")) if "sf" in Path(sf_dir).name else 0.1

    from lakehouses_spark.registry import load_all_queries
    from lakehouses_spark.session import get_spark

    registry = load_all_queries()
    spark = get_spark(app_name="lakehouses-bench")
    spark.sparkContext.setLogLevel("WARN")

    from lakehouses_spark.io import TABLES, load_table

    names = [n for n in HEADLINE if n in registry]
    loadavg_start = [round(x, 2) for x in os.getloadavg()]
    wall_start = time.time()

    # warm JVM + codegen once, outside any timed region
    registry["q1_pricing_summary"].fn(spark, sf_dir).collect()

    # host scan fingerprint (r9): one bare parquet count over every input
    # table, post-JVM-warm, pre-cold-pass. Future rounds use it to
    # attribute cold-total drift to the HOST's IO/CPU path vs engine
    # changes — the r6→r8 cold drift bisected to the host: the unchanged
    # round-6 build reproduces today's slower colds (BASELINE.md r9 row).
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    scan_probe = round(time.perf_counter() - t0, 3)

    extras = [n for n in TRACKED_EXTRA if n in registry]

    cold: dict[str, float] = {}
    cold_t0 = time.perf_counter()
    for name in names:
        spark.catalog.clearCache()  # force the parquet scan path
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).collect()
        cold[name] = round(time.perf_counter() - t0, 3)
    cold_wall = round(time.perf_counter() - cold_t0, 3)
    extra_cold: dict[str, float] = {}
    for name in extras:  # after cold_wall: tracked, not headline
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).collect()
        extra_cold[name] = round(time.perf_counter() - t0, 3)

    # warm pass: inputs pinned in memory (Spark's cache is keyed on the
    # analyzed plan, so each query's fresh load_table() scan resolves to
    # the cached columns)
    for t in TABLES:
        load_table(spark, sf_dir, t).cache().count()
    warm: dict[str, float] = {}
    warm_t0 = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).collect()
        warm[name] = round(time.perf_counter() - t0, 3)
    warm_wall = round(time.perf_counter() - warm_t0, 3)
    extra_warm: dict[str, float] = {}
    for name in extras:
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).collect()
        extra_warm[name] = round(time.perf_counter() - t0, 3)

    # warm > cold on the same query is physically impossible on a quiet
    # machine (warm removes IO) — retry once; a persistent inversion means
    # external load and is reported rather than hidden.
    retried: list[str] = []
    for name in names:
        if warm[name] > cold[name]:
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).collect()
            warm[name] = min(warm[name], round(time.perf_counter() - t0, 3))
            retried.append(name)
    warm_gt_cold = [n for n in names if warm[n] > cold[n]]

    cold_total = round(sum(cold.values()), 3)
    warm_total = round(sum(warm.values()), 3)
    payload = json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": cold_total,
                "unit": "sec",
                "queries": cold,
                "cold_total": cold_total,
                "warm": warm,
                "warm_total": warm_total,
                "r1_warm_total": R1_WARM_TOTAL,
                "warm_vs_r1": round(warm_total / R1_WARM_TOTAL, 3),
                "sf": sf,
                "loadavg_start": loadavg_start,
                "loadavg_gate": gate,
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                # effective master parallelism (local[$SPARK_GRAFT_CPUS]), not
                # the host's core count — the low-core scaling artifact must
                # self-report the core count it actually ran with (VERDICT r12
                # what's-wrong #4)
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count()),
                "scan_probe_s": scan_probe,
                "cold_pass_wall_s": cold_wall,
                "warm_pass_wall_s": warm_wall,
                "total_wall_s": round(time.time() - wall_start, 3),
                "warm_retried": retried,
                "warm_gt_cold": warm_gt_cold,
                "tracked_extra_cold": extra_cold,
                "tracked_extra_warm": extra_warm,
                "validation": "--validation" in sys.argv,
            }
        )
    print(payload)
    if "--validation" in sys.argv:
        path = _validation_path()
        path.write_text(payload + "\n")
        print(f"bench: validation artifact written to {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
