"""Session-catalog publication (VERDICT r2 directive #5): LakeTables as
3-level names in plain spark.sql with no per-table register(), persisting
across sessions through a Derby-backed Hive metastore.

The reference contract: 02…/03.ingesta_incremental_v2 [json].py:202,221-228 —
`spark.sql("SELECT … FROM bronze.retail_sales_orders")` resolves through the
metastore after ingest, including from a brand-new session.

`spark.sql.catalogImplementation` is a static conf (first session in the JVM
wins), so the persistent-metastore path runs in SUBPROCESSES: one ingests +
publishes, a second FRESH process resolves the 3-level name cold. The
in-session behaviors (publish, DML republish, time-travel isolation) reuse
the shared fixture session.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest

from lakehouses_spark.tables import LakeCatalog, LakeSQL


@pytest.fixture
def people(spark):
    return spark.createDataFrame(
        [(1, "ana", 30000.0), (2, "luis", 40000.0), (3, "eva", 50000.0)],
        "id int, name string, salario double",
    )


def test_publish_resolves_in_plain_sql(spark, tmp_path, people):
    cat = LakeCatalog(spark, tmp_path / "wh")
    cat.create_database("bronze")
    cat.create_table("bronze.people", people)
    cat.publish("bronze.people")
    got = spark.sql("SELECT id, name FROM bronze.people ORDER BY id").collect()
    assert [(r.id, r.name) for r in got] == [(1, "ana"), (2, "luis"), (3, "eva")]
    # the view is pinned to live files: vacuumed/removed files never leak in
    spark.sql("DROP VIEW bronze.people")


def test_published_view_follows_dml(spark, tmp_path, people):
    cat = LakeCatalog(spark, tmp_path / "wh")
    cat.create_database("bronze")
    cat.create_table("bronze.emp", people)
    lake = LakeSQL(cat)
    cat.publish("bronze.emp")
    lake.sql("DELETE FROM bronze.emp WHERE id = 2")
    lake.sql("INSERT INTO bronze.emp VALUES (9, 'noa', 70000.0)")
    got = {r.id for r in spark.sql("SELECT id FROM bronze.emp").collect()}
    assert got == {1, 3, 9}
    # merge-on-read tombstones are expressed inline in the view SQL
    cat.table("bronze.emp").delete("id = 3", lazy=True)
    cat.publish("bronze.emp")
    got = {r.id for r in spark.sql("SELECT id FROM bronze.emp").collect()}
    assert got == {1, 9}
    spark.sql("DROP VIEW bronze.emp")


def test_publish_under_spaced_warehouse_path(spark, tmp_path, people):
    """The view pins live files via `_metadata.file_path`, which Spark
    reports URI-encoded — a warehouse directory containing a space must
    still match the pinned raw paths (0 rows before the decode fix)."""
    cat = LakeCatalog(spark, tmp_path / "wh with space")
    cat.create_database("bronze")
    cat.create_table("bronze.folks", people)
    cat.publish("bronze.folks")
    got = spark.sql("SELECT id FROM bronze.folks").collect()
    assert {r.id for r in got} == {1, 2, 3}
    spark.sql("DROP VIEW bronze.folks")


def test_publish_empty_table(spark, tmp_path, people):
    cat = LakeCatalog(spark, tmp_path / "wh")
    cat.create_table("default.empty", people.limit(0))
    cat.publish("default.empty")
    df = spark.sql("SELECT * FROM default.empty")
    assert df.count() == 0
    assert df.columns == ["id", "name", "salario"]
    spark.sql("DROP VIEW default.empty")


_WRITER = """
import sys; sys.path.insert(0, {repo!r})
from lakehouses_spark.session import get_spark
from lakehouses_spark.tables import LakeCatalog, LakeSQL
spark = get_spark(app_name="publish-writer", cpus=2,
                  hive_metastore_dir={ms!r})
cat = LakeCatalog(spark, {wh!r})
cat.create_database("bronze")
df = spark.createDataFrame(
    [(1, "ana", 30000.0), (2, "luis", 40000.0)],
    "id int, name string, salario double",
)
cat.create_table("bronze.retail_sales_orders", df)
LakeSQL(cat).sql("INSERT INTO bronze.retail_sales_orders VALUES (3, 'eva', 50000.0)")
cat.publish("bronze.retail_sales_orders")
spark.stop()
print("WRITER_OK")
"""

_READER = """
import sys; sys.path.insert(0, {repo!r})
from lakehouses_spark.session import get_spark
spark = get_spark(app_name="publish-reader", cpus=2,
                  hive_metastore_dir={ms!r})
# NO LakeCatalog, NO register(): the metastore view must resolve cold
rows = spark.sql(
    "SELECT id, name FROM bronze.retail_sales_orders ORDER BY id"
).collect()
assert [(r.id, r.name) for r in rows] == [(1, "ana"), (2, "luis"), (3, "eva")], rows
spark.stop()
print("READER_OK")
"""


def _run(script: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(script)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"stderr tail: {proc.stderr[-2000:]}"
    return proc.stdout


@pytest.mark.slow  # Derby metastore + fresh-JVM subprocess (~35 s)
def test_fresh_session_resolves_published_table(tmp_path):
    """The headline contract: a brand-new JVM + metastore dir resolves
    bronze.retail_sales_orders in plain spark.sql — no attach, no register."""
    repo = "/root/repo"
    ms, wh = str(tmp_path / "metastore"), str(tmp_path / "wh")
    assert "WRITER_OK" in _run(_WRITER.format(repo=repo, ms=ms, wh=wh))
    assert "READER_OK" in _run(_READER.format(repo=repo, ms=ms, wh=wh))
