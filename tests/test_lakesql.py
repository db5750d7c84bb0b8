"""LakeSQL: the reference's %sql DML surface replayed as SQL strings —
the delta_lake_primer statement sequence verbatim-shaped
(02.delta_lake_primer.py:148,213,252,312-320,404-421,442)."""

from __future__ import annotations

import pytest

from lakehouses_spark.tables import LakeCatalog, LakeSQL, LakeSQLError


@pytest.fixture
def lake(spark, tmp_path):
    cat = LakeCatalog(spark, tmp_path / "wh")
    cat.create_database("bronze")
    df = spark.createDataFrame(
        [(1, "ana", 30000.0), (2, "luis", 40000.0), (3, "eva", 50000.0)],
        "id int, name string, salario double",
    )
    cat.create_table("bronze.emp", df)
    return LakeSQL(cat)


def test_sql_dml_sequence(spark, lake):
    lake.sql("INSERT INTO bronze.emp VALUES (4, 'joan', 60000.0)")
    lake.sql("DELETE FROM bronze.emp WHERE id = 2")
    lake.sql("UPDATE bronze.emp SET salario = salario * 1.10 WHERE id = 1")
    spark.createDataFrame(
        [(1, "ana maria", 99000.0), (5, "noa", 70000.0)],
        "id int, name string, salario double",
    ).createOrReplaceTempView("updates")
    lake.sql(
        """MERGE INTO bronze.emp t USING updates s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *"""
    )
    got = {
        r.id: (r.name, round(r.salario, 2))
        for r in lake.sql("SELECT * FROM bronze.emp").collect()
    }
    assert got == {
        1: ("ana maria", 99000.0),
        3: ("eva", 50000.0),
        4: ("joan", 60000.0),
        5: ("noa", 70000.0),
    }


def test_sql_time_travel_and_describe(spark, lake):
    lake.sql("DELETE FROM bronze.emp WHERE id = 1")
    n_now = lake.sql("SELECT count(*) AS n FROM bronze.emp").collect()[0].n
    n_v0 = lake.sql(
        "SELECT count(*) AS n FROM bronze.emp VERSION AS OF 0"
    ).collect()[0].n
    assert (n_now, n_v0) == (2, 3)
    ops = [r.operation for r in lake.sql("DESCRIBE HISTORY bronze.emp").collect()]
    assert ops[0] == "CREATE TABLE AS SELECT" and "DELETE" in ops
    detail = lake.sql("DESCRIBE DETAIL bronze.emp").collect()[0]
    assert int(detail.num_records) == 2


def test_sql_aggregate_joins_passthrough(spark, lake):
    """Arbitrary SELECT (group/order/subquery) passes through to Catalyst."""
    out = lake.sql(
        """SELECT upper(name) AS who, round(salario / 1000, 1) AS k
           FROM bronze.emp WHERE salario >= (SELECT avg(salario) FROM bronze.emp)
           ORDER BY k DESC"""
    ).collect()
    assert [r.who for r in out] == ["EVA", "LUIS"]


def test_sql_vacuum_optimize(spark, lake):
    lake.sql("DELETE FROM bronze.emp WHERE id = 1")
    removed = lake.sql("VACUUM bronze.emp").collect()[0].files_removed
    assert removed >= 1
    res = lake.sql("OPTIMIZE bronze.emp").collect()[0]
    assert res.compacted_files >= 0
    files = lake.catalog.table("bronze.emp").files()
    assert files.count() >= 1 and "stats" in files.columns


def test_sql_ddl(spark, lake):
    """D10: the full DDL statement set through SQL (00.cleanup.py:3,
    03.iceberg_primer.py:68-105)."""
    lake.sql("CREATE DATABASE IF NOT EXISTS gold")
    assert [r.database for r in lake.sql("SHOW DATABASES").collect()] \
        == sorted(["bronze", "gold"])
    lake.sql("CREATE TABLE gold.rich AS SELECT * FROM bronze.emp WHERE salario > 35000")
    assert [r.table for r in lake.sql("SHOW TABLES IN gold").collect()] == ["rich"]
    assert lake.sql("SELECT count(*) AS n FROM gold.rich").collect()[0].n == 2
    lake.sql("DROP TABLE gold.rich")
    assert lake.sql("SHOW TABLES IN gold").count() == 0
    lake.sql("DROP DATABASE gold CASCADE")
    assert [r.database for r in lake.sql("SHOW DATABASES").collect()] == ["bronze"]


def test_sql_errors(spark, lake):
    with pytest.raises(LakeSQLError, match="unsupported"):
        lake.sql("CREATE INDEX idx ON bronze.emp (id)")
    with pytest.raises(LakeSQLError, match="aliases"):
        lake.sql("MERGE INTO bronze.emp USING x ON bad = syntax")
    with pytest.raises(FileNotFoundError):
        lake.sql("DELETE FROM bronze.ghost WHERE id = 1")
