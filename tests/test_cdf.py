"""Change Data Feed (VERDICT r8 #7): DML under
delta.enableChangeDataFeed=true records row-level change files;
table_changes(from, to) returns them with _change_type /
_commit_version / _commit_timestamp; the Delta export emits native
`cdc` actions. Reference surface: Delta's table_changes / _change_data
(adjacent to 02.delta_lake_primer.py's DML + CDC-apply coverage)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from lakehouses_spark.tables import ChangeDataUnavailableError, LakeTable
from lakehouses_spark.tables.table import CDF_PROPERTY

ROWS = [
    {"k": i, "status": "AB"[i % 2], "price": float(10 * i)} for i in range(1, 21)
]


def _mk(spark, path, enable=True) -> LakeTable:
    df = spark.createDataFrame(ROWS, "k long, status string, price double")
    t = LakeTable.create(spark, path, df)
    if enable:
        t.set_properties({CDF_PROPERTY: "true"})
    return t


def _changes(t, lo, hi):
    return sorted(
        (r["_commit_version"], r["_change_type"], r["k"],
         r["status"], r["price"])
        for r in t.table_changes(lo, hi).collect()
    )


def test_insert_update_delete_change_rows(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")           # v0 create, v1 property
    t.update({"price": "price * 2"}, where="k <= 3")         # v2
    t.delete("k >= 19")                                      # v3
    t.append(spark.createDataFrame(
        [{"k": 100, "status": "Z", "price": 1.0}],
        "k long, status string, price double"))              # v4

    # create (v0) derives inserts from the added files
    ch0 = t.table_changes(0, 0)
    assert ch0.where(F.col("_change_type") != "insert").count() == 0
    assert ch0.count() == len(ROWS)

    ch2 = _changes(t, 2, 2)
    assert ch2 == sorted(
        [(2, "update_preimage", k, "AB"[k % 2], 10.0 * k) for k in (1, 2, 3)]
        + [(2, "update_postimage", k, "AB"[k % 2], 20.0 * k) for k in (1, 2, 3)]
    )
    ch3 = _changes(t, 3, 3)
    assert ch3 == sorted(
        (3, "delete", k, "AB"[k % 2], 10.0 * k) for k in (19, 20))
    ch4 = _changes(t, 4, 4)
    assert ch4 == [(4, "insert", 100, "Z", 1.0)]
    # timestamps are per-commit and non-null
    assert t.table_changes(2, 4).where(
        F.col("_commit_timestamp").isNull()).count() == 0


def test_lazy_delete_and_merge_changes(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete("k > 18", lazy=True)                            # v2 tombstone
    assert _changes(t, 2, 2) == sorted(
        (2, "delete", k, "AB"[k % 2], 10.0 * k) for k in (19, 20))
    src = spark.createDataFrame(
        [{"k": 1, "status": "U", "price": 0.5},     # matched -> update
         {"k": 500, "status": "N", "price": 9.0}],  # unmatched -> insert
        "k long, status string, price double")
    t.merge(src, on="t.k = s.k")                             # v3
    ch = _changes(t, 3, 3)
    assert ch == sorted([
        (3, "update_preimage", 1, "B", 10.0),
        (3, "update_postimage", 1, "U", 0.5),
        (3, "insert", 500, "N", 9.0),
    ])
    # merge with delete clause
    t.merge(spark.createDataFrame([{"k": 2}], "k long"),
            on="t.k = s.k", when_matched_update=None,
            when_not_matched_insert=None, when_matched_delete=True)  # v4
    assert _changes(t, 4, 4) == [(4, "delete", 2, "A", 20.0)]
    # full range unions cleanly
    assert t.table_changes(2, 4).count() == 2 + 3 + 1


def test_restore_diff_and_materialize_empty(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete("k > 10", lazy=True)          # v2
    t.materialize_tombstones()             # v3: no logical row changes
    assert t.table_changes(3, 3).count() == 0
    t.restore(2)                           # v4: same logical rows as v3
    assert t.table_changes(4, 4).count() == 0
    t2 = _mk(spark, tmp_path / "t2")
    t2.delete("k <= 5")                    # v2 cow delete
    t2.restore(1)                          # v3 brings the 5 rows back
    ch = _changes(t2, 3, 3)
    assert ch == sorted(
        (3, "insert", k, "AB"[k % 2], 10.0 * k) for k in (1, 2, 3, 4, 5))


def test_unrecorded_dml_raises_and_no_overhead_when_off(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", enable=False)
    t.delete("k <= 2")                     # v1: CDF off, no change files
    with pytest.raises(ChangeDataUnavailableError):
        t.table_changes(1, 1).collect()
    assert not (tmp_path / "t" / "_change_data").exists()
    # appends stay derivable even with CDF off
    t.append(spark.createDataFrame([{"k": 50, "status": "Z", "price": 2.0}],
                                   "k long, status string, price double"))
    assert _changes(t, 2, 2) == [(2, "insert", 50, "Z", 2.0)]


def test_cdf_exports_native_cdc_actions(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.update({"price": "price + 1"}, where="k = 1")          # v2
    t.delete("k = 2")                                        # v3
    dest = t.export_delta_log(tmp_path / "delta")
    log = dest / "_delta_log"
    cdc_actions, protocols = [], []
    for f in sorted(log.glob("*.json")):
        for line in open(f):
            a = json.loads(line)
            if "cdc" in a:
                cdc_actions.append((int(f.stem), a["cdc"]))
            if "protocol" in a:
                protocols.append(a["protocol"])
    assert {v for v, _ in cdc_actions} == {2, 3}
    assert protocols[0]["minWriterVersion"] >= 4  # changeDataFeed capable
    for _, c in cdc_actions:
        assert c["dataChange"] is False
        p = dest / c["path"]
        assert p.exists(), "exported cdc file must be copied"
    # external client: the change parquet itself carries _change_type
    ch = spark.read.parquet(*[str(dest / c["path"])
                              for v, c in cdc_actions if v == 2])
    got = sorted((r["_change_type"], r["k"], r["price"]) for r in ch.collect())
    assert got == [("update_postimage", 1, 11.0), ("update_preimage", 1, 10.0)]


def test_schema_evolution_across_change_range(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete("k = 1")                                        # v2 (old schema)
    t.append(spark.createDataFrame(
        [{"k": 300, "status": "Z", "price": 1.0, "note": "n"}],
        "k long, status string, price double, note string"),
        merge_schema=True)                                   # v3 evolves
    ch = t.table_changes(2, 3)
    assert ch.columns == ["k", "status", "price", "note",
                          "_change_type", "_commit_version",
                          "_commit_timestamp"]
    rows = {(r["_commit_version"], r["_change_type"], r["k"]): r["note"]
            for r in ch.collect()}
    assert rows[(2, "delete", 1)] is None      # pre-evolution rows read NULL
    assert rows[(3, "insert", 300)] == "n"


def test_reader_table_changes_roundtrip(spark, tmp_path):
    """Reader-side CDF interop: DeltaLogReader.table_changes over the
    EXPORTED log returns the same change rows as LakeTable.table_changes —
    cdc actions consumed, blind appends derived as inserts, and the
    materialize commit (exported with dataChange=false, Delta's OPTIMIZE
    marking) contributing nothing instead of raising."""
    from lakehouses_spark.tables.delta_log import (
        DeltaLogReader,
        DeltaProtocolError,
    )

    t = _mk(spark, tmp_path / "t")
    t.update({"price": "price * 2"}, where="k <= 3")         # v2
    t.delete("k > 18", lazy=True)                            # v3 tombstone
    t.materialize_tombstones()                               # v4 no-change
    t.append(spark.createDataFrame(
        [{"k": 100, "status": "Z", "price": 1.0}],
        "k long, status string, price double"))              # v5
    dest = t.export_delta_log(tmp_path / "delta")
    r = DeltaLogReader(spark, dest)

    def key(df):
        return sorted(
            (row["_commit_version"], row["_change_type"], row["k"],
             row["status"], row["price"])
            for row in df.collect()
        )

    assert key(r.table_changes(2, 5)) == key(t.table_changes(2, 5))
    assert r.table_changes(4, 4).count() == 0  # dataChange=false rewrite
    # an unrecorded data-changing commit raises, like Delta
    t2 = _mk(spark, tmp_path / "t2", enable=False)
    t2.delete("k <= 2")
    dest2 = t2.export_delta_log(tmp_path / "delta2")
    with pytest.raises(DeltaProtocolError):
        DeltaLogReader(spark, dest2).table_changes(1, 1).collect()
