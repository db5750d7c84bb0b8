#!/usr/bin/env python
"""Round-12 whole-registry profiler: time every registered query once at
$SPARK_GRAFT_SF_DIR (default sf0.01), clearCache() before each so the scan
path is exercised, and print a JSON dict {name: sec} sorted slowest-first.

    python tools/r13_profile.py [sf_dir] [name ...]

Purpose: find the slow outliers OUTSIDE the bench headline set so the
optimization round covers every operator family, not just the headline.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouses_spark.registry import load_all_queries  # noqa: E402
from lakehouses_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    registry = load_all_queries()
    names = only or list(registry)
    spark = get_spark(app_name="r13-profile", driver_memory="8g")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warm-up outside any timed region
    registry["q1_pricing_summary"].fn(spark, sf_dir).collect()
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        rq = registry.get(name)
        if rq is None:
            continue
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"r13-profile: {name}")
        t0 = time.perf_counter()
        try:
            rq.fn(spark, sf_dir).collect()
        except Exception as e:  # keep profiling; report at the end
            errors[name] = str(e)[:200]
        times[name] = round(time.perf_counter() - t0, 3)
    ranked = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    print(json.dumps({"sf_dir": sf_dir, "times": ranked, "errors": errors}))
    spark.stop()


if __name__ == "__main__":
    main()
