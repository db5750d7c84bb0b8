"""ALTER TABLE surface (D9): metadata-only add/rename/drop column via
column mapping, CHECK constraints, and their interplay with DML/time travel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouses_spark.tables import ConstraintViolationError, LakeTable


@pytest.fixture
def t(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "ana", 30000.0), (2, "luis", 40000.0)],
        "id int, name string, salario double",
    )
    return LakeTable.create(spark, tmp_path / "t", df)


def test_add_column_metadata_only(spark, t):
    files_before = set(t.state().files)
    t.alter_add_column("depto", "string")
    assert set(t.state().files) == files_before  # no data rewritten
    rows = {r.id: r.depto for r in t.read().collect()}
    assert rows == {1: None, 2: None}
    t.insert_values([{"id": 3, "name": "eva", "salario": 1.0, "depto": "eng"}])
    assert t.read().where("depto = 'eng'").count() == 1


def test_rename_column_metadata_only_and_dml(spark, t):
    files_before = set(t.state().files)
    t.alter_rename_column("salario", "salary")
    assert set(t.state().files) == files_before  # metadata-only
    assert "salary" in t.read().columns and "salario" not in t.read().columns
    assert t.read().where("salary > 35000").count() == 1
    # writes after the rename use the logical name; physical stays mapped
    t.insert_values([{"id": 3, "name": "eva", "salary": 50000.0}])
    t.update({"salary": "salary * 2"}, where="id = 1")
    got = {r.id: r.salary for r in t.read().collect()}
    assert got == {1: 60000.0, 2: 40000.0, 3: 50000.0}
    # merge still works on the renamed schema
    src = spark.createDataFrame([(2, "luis m", 1.0)], "id int, name string, salary double")
    t.merge(src, "t.id = s.id")
    assert t.read().where("id = 2").collect()[0].salary == 1.0
    # stats-based skipping works through the mapping
    assert t.read(filters=[("salary", ">", 0)]).count() == 3
    # time travel to before the rename shows the old name
    assert "salario" in t.read(version=0).columns


def test_rename_chain_and_drop(spark, t):
    t.alter_rename_column("salario", "salary")
    t.alter_rename_column("salary", "wage")  # chained rename keeps mapping
    assert t.read().where("wage = 30000.0").count() == 1
    t.alter_drop_column("wage")
    assert t.read().columns == ["id", "name"]
    t.insert_values([{"id": 9, "name": "x"}])
    assert t.read().count() == 3


def test_merge_schema_evolution(spark, t):
    """MERGE with merge_schema=True: source-only columns widen the target
    (Delta autoMerge); untouched rows read NULL, matched rows take the
    source value, inserts carry it."""
    src = spark.createDataFrame(
        [(1, "ana m", 31000.0, "eng"), (9, "noa", 70000.0, "ops")],
        "id int, name string, salario double, depto string",
    )
    # without evolution, extra source columns are ignored (schema unchanged)
    t.merge(src.limit(0), "t.id = s.id")
    assert "depto" not in t.schema().names
    t.merge(src, "t.id = s.id", merge_schema=True)
    got = {r.id: (r.name, r.depto) for r in t.read().collect()}
    assert got == {
        1: ("ana m", "eng"),   # matched: updated + evolved column set
        2: ("luis", None),     # untouched: evolved column NULL
        9: ("noa", "ops"),     # inserted with the new column
    }
    assert "depto" in t.schema().names


def test_check_constraints(spark, t):
    t.add_constraint("positive_salary", "salario > 0")
    # violating append rejected before commit
    bad = spark.createDataFrame([(9, "bad", -5.0)], "id int, name string, salario double")
    with pytest.raises(ConstraintViolationError, match="positive_salary"):
        t.append(bad)
    assert t.read().count() == 2  # nothing landed
    # violating update rejected
    with pytest.raises(ConstraintViolationError):
        t.update({"salario": "-1.0"}, where="id = 1")
    assert t.read().where("salario < 0").count() == 0
    # conforming writes pass
    t.insert_values([{"id": 3, "name": "ok", "salario": 7.0}])
    assert t.read().count() == 3
    # constraint on existing bad data can't be added
    t.drop_constraint("positive_salary")
    t.append(bad)
    with pytest.raises(ConstraintViolationError, match="existing rows"):
        t.add_constraint("positive_salary", "salario > 0")
