#!/usr/bin/env python
"""Determinism sweep: run every registered query twice in one session at
sf0.01 and require canonically identical results (same rows after the
oracle comparator's canonicalization — float formatting, column sort, row
sort). Queries whose contract is explicitly engine-specific RNG
(random_split_sample) are exempt; everything else, including the streaming
drains and iterative algorithms, must reproduce exactly.

    python tools/determinism_sweep.py
"""

from __future__ import annotations

import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouses_spark.registry import load_all_queries  # noqa: E402
from lakehouses_spark.session import get_spark  # noqa: E402
from tests.oracle import _canon_rows  # noqa: E402

SF = "/root/testdata/sf0.01"

# engine-RNG by documented design: partition-dependent randomSplit
EXEMPT = {"random_split_sample"}
# ALS trains on a seeded split — deterministic per session, but each run
# re-fits; keep it in the sweep (it must still reproduce within-session)


def main() -> None:
    spark = get_spark(app_name="determinism-sweep", driver_memory="8g")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all_queries()
    names = [n for n in registry if n not in EXEMPT]
    ok, bad, err = [], [], []
    for name in names:
        fn = registry[name].fn
        try:
            df1 = fn(spark, SF)
            r1 = _canon_rows(df1.columns, [tuple(r) for r in df1.collect()])
            df2 = fn(spark, SF)
            r2 = _canon_rows(df2.columns, [tuple(r) for r in df2.collect()])
        except Exception:
            traceback.print_exc()
            err.append(name)
            continue
        (ok if r1 == r2 else bad).append(name)
        if r1 != r2:
            print(f"NONDETERMINISTIC: {name}")
    print(
        f"determinism sweep: {len(ok)}/{len(names)} byte-identical across "
        f"repeated runs ({len(EXEMPT)} exempt by contract: {sorted(EXEMPT)})"
    )
    if bad or err:
        print(f"FAILURES: nondeterministic={bad} errored={err}")
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
