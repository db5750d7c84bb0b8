#!/usr/bin/env python
"""Foreign-session sweep: replicate the DRIVER's environment — a plain
SparkSession the library did not create (no factory confs), a cwd outside
the repo, no repo PYTHONPATH — and run every registered query against its
DuckDB oracle, exactly like the driver's CORRECTNESS gate but over the FULL
registry instead of the 50-entry sweep budget.

This is the session-portability guarantee behind
``io.ensure_session_confs``: every query must self-provision the runtime
confs it needs (nanos-timestamp scan behavior, session timezone, Arrow) and
ship the package to Python workers (addPyFile) when PYTHONPATH doesn't.

    python tools/foreign_session_sweep.py          # re-execs itself from /tmp
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF = "/root/testdata/sf0.01"


def parent() -> None:
    """Re-exec in a foreign cwd with the repo stripped from the env."""
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    with tempfile.TemporaryDirectory() as cwd:
        rc = subprocess.run(
            [sys.executable, str(Path(__file__).resolve()), "--child"],
            cwd=cwd,
            env=env,
        ).returncode
    sys.exit(rc)


def child() -> None:
    import importlib.util

    # load the driver contract by FILE PATH (the driver does the same);
    # __spark_entry__ itself puts the repo on sys.path
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    # a PLAIN session — deliberately not the library factory; mirrors the
    # driver harness (local[*], default confs + the shuffle sizing any
    # harness sets)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[*]")
        .appName("foreign-session-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, str(REPO))  # for tests.oracle (sweep tooling only —
    # the QUERIES must not need it; they run before this import could help
    # executors, and addPyFile is their only worker-side channel)
    from tests.oracle import compare, duckdb_connection

    con = duckdb_connection(SF)
    qs, oracles = entry.queries(), entry.oracle_sql()
    ok_oracle, ok_rows, failed = [], [], []
    t0 = time.time()
    for name, fn in qs.items():
        try:
            df = fn(spark, SF)
            if name in oracles:
                compare(df, con, oracles[name])
                ok_oracle.append(name)
            else:
                assert df.count() >= 0 and df.columns
                ok_rows.append(name)
        except Exception:
            traceback.print_exc()
            failed.append(name)
    print(
        json.dumps(
            {
                "oracle_ok": len(ok_oracle),
                "rows_only_ok": len(ok_rows),
                "failed": failed,
                "total": len(qs),
                "wall_s": round(time.time() - t0, 1),
            }
        )
    )
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    child() if "--child" in sys.argv else parent()
