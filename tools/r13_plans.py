#!/usr/bin/env python
"""Capture `.explain("formatted")` for the round-12 optimization evidence:
plans/r13/<query>_<tag>.txt for every query named on the command line (or the
bench headline + tracked set by default).

    python tools/r13_plans.py before [query ...]
    python tools/r13_plans.py after  [query ...]

The formatted plan is the INITIAL plan (AdaptiveSparkPlan isFinalPlan=false);
for the plan-shape claims that matter here (Exchange count, join strategy,
PushedFilters/ReadSchema, Python eval nodes) the initial plan is the right
artifact — AQE only coalesces/rewrites at runtime. The executed (final) plan
is appended after a collect() for completeness.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE, TRACKED_EXTRA  # noqa: E402
from lakehouses_spark.registry import load_all_queries  # noqa: E402
from lakehouses_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or (HEADLINE + TRACKED_EXTRA)
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r13"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="r13-plans", driver_memory="8g")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all_queries()
    for name in names:
        rq = registry.get(name)
        if rq is None:
            print(f"skip unknown query: {name}")
            continue
        df = rq.fn(spark, SF_DIR)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        df.collect()  # finalize the adaptive plan
        executed = df._jdf.queryExecution().executedPlan().toString()
        text = (
            f"== {name} ({tag}) — explain('formatted'), then the executed "
            "(AQE-final) plan ==\n\n"
            + formatted
            + "\n\n== executed (AQE final) ==\n\n"
            + executed
        )
        (out_dir / f"{name}_{tag}.txt").write_text(text)
        print(f"wrote plans/r13/{name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
