"""CLONE (Delta's CREATE TABLE ... [SHALLOW|DEEP] CLONE): zero-copy dev
snapshots / deep archival copies — independence, vacuum safety, metadata
carry-over, time-travel source versions, and the LakeSQL statement."""

from __future__ import annotations

import pytest

from lakehouses_spark.tables import LakeCatalog, LakeSQL, LakeTable


@pytest.fixture
def src(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"r{i}", float(i) * 10) for i in range(100)],
        "id int, name string, amount double",
    )
    return LakeTable.create(spark, tmp_path / "src", df)


def test_shallow_clone_is_zero_copy_and_equal(spark, src, tmp_path):
    clone = src.clone(tmp_path / "c1", shallow=True)
    assert clone.read().count() == 100
    assert sorted(r.id for r in clone.read().collect()) == list(range(100))
    # zero-copy: no parquet bytes under the clone's own data dir
    assert not list((tmp_path / "c1").rglob("*.parquet"))
    # provenance recorded
    ops = clone.state().commits[0]["operation_parameters"]
    assert ops["shallow"] is True and ops["source_version"] == 0


def test_deep_clone_copies_files(spark, src, tmp_path):
    clone = src.clone(tmp_path / "c2", shallow=False)
    assert clone.read().count() == 100
    assert list((tmp_path / "c2").rglob("*.parquet"))  # self-contained


def test_clone_evolves_independently(spark, src, tmp_path):
    clone = src.clone(tmp_path / "c3", shallow=True)
    # source append does NOT appear in the clone
    src.append(spark.createDataFrame([(999, "new", 1.0)],
                                     "id int, name string, amount double"))
    assert src.read().count() == 101
    assert clone.read().count() == 100
    # clone DML does NOT touch the source (copy-on-write lands in clone)
    clone.delete("id < 50")
    assert clone.read().count() == 50
    assert src.read().count() == 101
    assert src.read().where("id < 50").count() == 50


def test_clone_vacuum_never_deletes_source_files(spark, src, tmp_path):
    clone = src.clone(tmp_path / "c4", shallow=True)
    clone.delete("id >= 0")  # drop every cloned reference
    removed = clone.vacuum(retain_versions=0)
    # vacuum scans only the clone's own data dir — the ../src references
    # are out of scope by construction
    assert all(".." not in r for r in removed)
    assert src.read().count() == 100  # source untouched


def test_clone_carries_metadata_and_constraints(spark, src, tmp_path):
    src.add_constraint("amount_ok", "amount >= 0")
    src.set_properties({"owner": "data-eng"})
    clone = src.clone(tmp_path / "c5", shallow=True)
    st = clone.state()
    assert st.constraints == {"amount_ok": "amount >= 0"}
    assert st.properties.get("owner") == "data-eng"
    with pytest.raises(Exception, match="amount_ok|constraint"):
        clone.append(spark.createDataFrame([(7, "bad", -5.0)],
                                           "id int, name string, amount double"))


def test_clone_of_time_travel_version(spark, src, tmp_path):
    src.append(spark.createDataFrame([(500, "later", 2.0)],
                                     "id int, name string, amount double"))
    clone = src.clone(tmp_path / "c6", shallow=True, version=0)
    assert clone.read().count() == 100  # pre-append snapshot


def test_clone_refuses_existing_target(spark, src, tmp_path):
    src.clone(tmp_path / "c7")
    with pytest.raises(FileExistsError):
        src.clone(tmp_path / "c7")
    # mode="ignore" returns the existing clone
    again = src.clone(tmp_path / "c7", mode="ignore")
    assert again.read().count() == 100


def test_sql_clone_statement(spark, tmp_path):
    cat = LakeCatalog(spark, tmp_path / "wh")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, v string"
    )
    cat.create_table("default.t1", df)
    lake = LakeSQL(cat)
    lake.sql("CREATE TABLE t2 SHALLOW CLONE t1")
    assert {r.id for r in cat.table("t2").read().collect()} == {1, 2, 3}
    lake.sql("INSERT INTO t1 VALUES (4, 'd')")
    assert cat.table("t2").read().count() == 3  # snapshot isolation
    lake.sql("CREATE TABLE t3 DEEP CLONE t1")
    assert cat.table("t3").read().count() == 4
    # time-travel clone via SQL
    lake.sql("CREATE TABLE t4 SHALLOW CLONE t1 VERSION AS OF 0")
    assert cat.table("t4").read().count() == 3
