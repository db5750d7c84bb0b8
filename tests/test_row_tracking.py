"""Delta rowTracking writer feature (PROTOCOL.md "Row Tracking").

The contract pinned here:
- appends assign fresh, disjoint baseRowId ranges (sized by numRecords)
  and bump rowIdHighWaterMark in the `delta.rowTracking` DOMAIN within
  the same commit;
- the read surface resolves row id = coalesce(materialized, baseRowId +
  position) and commit version = coalesce(materialized, add default);
- COW DELETE preserves id+version for kept rows; COW UPDATE preserves
  ids for all rewritten rows and versions for UNMODIFIED rows only
  (modified rows' version becomes the update's commit);
- OPTIMIZE / replaceWhere-kept rows preserve both (pure copies);
- checkpoints carry the per-add fields and the watermark domain, so
  everything survives JSON log cleanup;
- MERGE and merge-on-read UPDATE refuse with the reason (copied vs
  modified bookkeeping not implemented for those legs);
- DV DELETE keeps files (and their baseRowId) untouched — ids stable.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from lakehouses_spark.tables.delta_log import (
    DeltaLogReader,
    DeltaProtocolError,
    write_delta_table,
)


def _mk(spark, path, extra_features=()):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double")
    write_delta_table(spark, df, path)
    log = Path(path) / "_delta_log"
    (log / f"{1:020d}.json").write_text(json.dumps({"protocol": {
        "minReaderVersion": 3 if "deletionVectors" in extra_features else 1,
        "minWriterVersion": 7,
        **({"readerFeatures": ["deletionVectors"]}
           if "deletionVectors" in extra_features else {}),
        "writerFeatures": ["rowTracking", "domainMetadata",
                           *extra_features],
    }}) + "\n")
    return DeltaLogReader(spark, path)


def _ids(spark, path):
    return {
        x["k"]: (x["__lh_row_id"], x["__lh_rcv"])
        for x in DeltaLogReader(spark, path)
        .to_df(_with_row_ids=True).collect()
    }


def test_append_assigns_fresh_disjoint_ranges(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    r.append(spark.createDataFrame(
        [(100, 1.0), (101, 2.0)], "k long, v double"))
    DeltaLogReader(spark, tmp_path / "t").append(
        spark.createDataFrame([(200, 3.0)], "k long, v double"))
    ids = _ids(spark, tmp_path / "t")
    fresh = {k: v for k, v in ids.items() if k >= 100}
    assert {v[0] for v in fresh.values()} == {0, 1, 2}  # disjoint, dense
    assert fresh[200][1] > fresh[100][1]  # later commit version
    # pre-feature files have no baseRowId: ids are NULL (spec: backfill
    # is a separate op this writer does not fake)
    assert all(ids[k][0] is None for k in range(10))
    hwm = json.loads(DeltaLogReader(spark, tmp_path / "t")
                     .snapshot().domains["delta.rowTracking"])
    assert hwm["rowIdHighWaterMark"] == 2


def test_cow_delete_update_preserve(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    r.append(spark.createDataFrame(
        [(100, 1.0), (101, 2.0), (200, 3.0)], "k long, v double"))
    before = _ids(spark, tmp_path / "t")
    DeltaLogReader(spark, tmp_path / "t").delete("k = 100")
    after_del = _ids(spark, tmp_path / "t")
    # kept rows of the rewritten file preserve id AND commit version
    assert after_del[101] == before[101]
    assert after_del[200] == before[200]
    upd = DeltaLogReader(spark, tmp_path / "t")
    res = upd.update({"v": "v + 5"}, where="k = 101")
    after_upd = _ids(spark, tmp_path / "t")
    # modified row: id preserved, version advances to the update commit
    assert after_upd[101][0] == before[101][0]
    assert after_upd[101][1] == res["version"]
    # unmodified row in the same rewritten file: both preserved
    assert after_upd[200] == before[200]


def test_optimize_and_checkpoint_preserve(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    r.append(spark.createDataFrame(
        [(100, 1.0), (101, 2.0)], "k long, v double"))
    DeltaLogReader(spark, tmp_path / "t").update(
        {"v": "v * 10"}, where="k = 100")
    before = _ids(spark, tmp_path / "t")
    DeltaLogReader(spark, tmp_path / "t").optimize(target_files=1)
    after = _ids(spark, tmp_path / "t")
    # tracked rows preserve id+version through compaction; pre-feature
    # rows (NULL ids — never backfilled) acquire fresh ids from the new
    # file's baseRowId range, completing the backfill implicitly
    assert after[100] == before[100] and after[101] == before[101]
    assert all(v[0] is not None for v in after.values())
    assert len({v[0] for v in after.values()}) == len(after)  # unique
    r2 = DeltaLogReader(spark, tmp_path / "t")
    r2.checkpoint()
    for f in (Path(tmp_path) / "t" / "_delta_log").glob("*.json"):
        f.unlink()
    assert _ids(spark, tmp_path / "t") == after
    assert "delta.rowTracking" in DeltaLogReader(
        spark, tmp_path / "t").snapshot().domains


def test_replace_where_keeps_survivor_ids(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    r.append(spark.createDataFrame(
        [(100, 1.0), (101, 50.0)], "k long, v double"))
    before = _ids(spark, tmp_path / "t")
    DeltaLogReader(spark, tmp_path / "t").overwrite(
        spark.createDataFrame([(300, 99.0)], "k long, v double"),
        replace_where="v >= 40")
    ids = _ids(spark, tmp_path / "t")
    assert ids[100] == before[100]  # survivor of the rewritten file
    assert 101 not in ids
    assert ids[300][0] is not None and ids[300][0] > before[101][0]


def test_merge_and_mor_update_refuse(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    src = spark.createDataFrame([(1, 9.0)], "k long, v double")
    with pytest.raises(DeltaProtocolError, match="row-tracking"):
        r.merge(src, "t.k = s.k")
    with pytest.raises(DeltaProtocolError, match="row-tracking"):
        DeltaLogReader(spark, tmp_path / "t").update(
            {"v": "1.0"}, where="k = 1", mode="merge-on-read")


def test_dv_delete_keeps_ids_stable(spark, tmp_path):
    r = _mk(spark, tmp_path / "t", extra_features=("deletionVectors",))
    r.append(spark.createDataFrame(
        [(100, 1.0), (101, 2.0), (102, 3.0)], "k long, v double"))
    before = _ids(spark, tmp_path / "t")
    res = DeltaLogReader(spark, tmp_path / "t").delete(
        "k = 101", mode="merge-on-read")
    assert res["dv_files"] >= 1
    ids = _ids(spark, tmp_path / "t")
    assert 101 not in ids
    # files untouched: surviving rows keep exactly their ids/versions
    assert ids[100] == before[100] and ids[102] == before[102]
