"""Session-portability regression pin: the driver harness hands queries its
OWN SparkSession, created from a foreign cwd with no repo PYTHONPATH. The
full sweep lives in tools/foreign_session_sweep.py (r3: 123/123 green); this
test pins the one shape that actually broke there — the `laketable` Python
data source, whose class is planned in a DRIVER-SIDE Python worker that
addPyFile does not reach (fixed via by-value pickling + sys.path bootstrap
in tables/stream_source.py).
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # fresh-JVM subprocess (~30 s)

REPO = Path(__file__).resolve().parent.parent

CHILD = """
import importlib.util, sys
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", {entry!r}
)
entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]").appName("foreign-pin")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
qs = entry.queries()
# the data-source-backed streaming query (the regression) on the smoke SF
n = qs["streaming_matview_rollup"](spark, "/root/testdata/sf0.001").count()
assert n > 0, n
# and one relational query for the conf side (nanos events scan, UTC tz)
m = qs["ts_tumbling_window"](spark, "/root/testdata/sf0.001").count()
assert m > 0, m
print("FOREIGN_OK", n, m)
"""


def test_laketable_source_survives_foreign_session(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    script = CHILD.format(entry=str(REPO / "__spark_entry__.py"))
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "FOREIGN_OK" in proc.stdout
