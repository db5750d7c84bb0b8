"""Smoke-run every examples/ pipeline (VERDICT r6 #6).

The examples import registry internals (`connected_components`,
`ann_lsh_pairs`, …) that no other test exercises by that route — without
this they bitrot silently on a refactor. Each runs in its own subprocess
(fresh SparkSession, tmp workdir) exactly as a user would invoke it;
exit 0 + the pipeline's own printed stage markers are the contract.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # 5 fresh-JVM subprocesses (~2.5 min)

REPO = Path(__file__).resolve().parent.parent
EXAMPLES = sorted(p.name for p in (REPO / "examples").glob("*.py"))


def test_every_example_is_covered():
    assert EXAMPLES, "examples/ directory is empty?"
    assert set(EXAMPLES) == {
        "external_client.py",
        "incremental_daily_pipeline.py",
        "medallion_pipeline.py",
        "retrieval_pipeline.py",
        "timeseries_analytics.py",
        "training_data_pipeline.py",
    }, "new example added — extend this smoke suite"


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs_clean(name, tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / name), str(tmp_path / "work")],
        env=env,
        cwd=str(REPO),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"{name} failed (rc={proc.returncode})\n"
        f"--- stdout tail ---\n{proc.stdout[-2000:]}\n"
        f"--- stderr tail ---\n{proc.stderr[-2000:]}"
    )
    # every example prints numbered stage markers; seeing the LAST stage
    # means the whole arc executed, not just the imports
    assert "done" in proc.stdout.lower() or proc.stdout.count("\n") > 3, (
        f"{name} produced no meaningful output:\n{proc.stdout[-500:]}"
    )
