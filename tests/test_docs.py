"""Doc-count drift guard (VERDICT r3 directive #5): the registry is the
single source of truth for query counts; COVERAGE.md's generated COUNTS
block and README.md's inline counts must agree with it. Regenerate with
`python tools/sync_counts.py` (which also refreshes the pytest-case count —
not asserted here to avoid recursive collection)."""

from __future__ import annotations

import re
from pathlib import Path

from lakehouses_spark.registry import SWEEP_DEFERRED_TO_NEXT_ROUND, load_all_queries

REPO = Path(__file__).resolve().parent.parent


def test_coverage_counts_block_matches_registry():
    reg = load_all_queries()
    total = len(reg)
    oracle = sum(1 for rq in reg.values() if rq.oracle)
    cov = (REPO / "COVERAGE.md").read_text()
    m = re.search(r"<!-- COUNTS:BEGIN.*?COUNTS:END -->", cov, re.DOTALL)
    assert m, "COVERAGE.md lost its generated COUNTS block"
    block = m.group(0)
    assert f"{total} registered driver queries" in block, block
    assert f"{oracle} DuckDB-oracle-checked" in block, block
    assert f"holds {len(SWEEP_DEFERRED_TO_NEXT_ROUND)} queries" in block, block
    for name, rq in reg.items():
        if not rq.oracle:
            assert name in block, f"rows-only query {name} missing from COUNTS block"


def test_readme_counts_match_registry():
    reg = load_all_queries()
    total = len(reg)
    oracle = sum(1 for rq in reg.values() if rq.oracle)
    rd = (REPO / "README.md").read_text()
    assert f"{total} operator queries ({oracle} DuckDB-oracle-checked)" in rd
    assert f"for all {oracle} SQL-expressible queries" in rd
