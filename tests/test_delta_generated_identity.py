"""Generated + identity columns on the external Delta write plane.

PROTOCOL.md "Writer Requirements for Generated Columns" / "Identity
Columns": both features were previously DECLARED-supported but refused
the moment a schema used them; now the committing verbs compute/enforce:

- generated (`delta.generationExpression` field metadata): absent-from-
  source columns compute from the expression (F.expr, JVM-side); provided
  values are ENFORCED value==expr in _check_write's single agg pass
  (NULL-safe equality); UPDATE/MERGE recompute after SET ("GENERATED
  ALWAYS"); SET targeting the column refuses.
- identity (`delta.identity.*` field metadata): absent-from-source
  columns allocate `base + step*k` with NO global ordering shuffle
  (per-partition offset blocks via mapInPandas) and the high watermark
  rides the SAME commit's metaData action; explicit values refuse unless
  allowExplicitInsert, and bump the watermark when beyond it.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from lakehouses_spark.tables.delta_log import (
    DeltaLogReader,
    DeltaProtocolError,
    allocate_identity,
    read_delta,
    write_delta_table,
)


def _foreignize(path: Path, *, allow_explicit: bool = False,
                hwm: int | None = None, extra_conf: dict | None = None):
    """Rewrite commit 0 so the table declares `id` as an identity column
    and `g` as a generated column (g = a + 1), with the writer features
    enumerated — the layout a real Delta writer produces."""
    c0 = path / "_delta_log" / "00000000000000000000.json"
    out = []
    for line in c0.read_text().splitlines():
        a = json.loads(line)
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 1, "minWriterVersion": 7,
                "writerFeatures": ["generatedColumns", "identityColumns"],
            }
        if "metaData" in a:
            sj = json.loads(a["metaData"]["schemaString"])
            for f in sj["fields"]:
                if f["name"] == "id":
                    f["metadata"] = {
                        "delta.identity.start": 1,
                        "delta.identity.step": 1,
                        "delta.identity.allowExplicitInsert":
                            allow_explicit,
                        **({"delta.identity.highWaterMark": hwm}
                           if hwm is not None else {}),
                    }
                if f["name"] == "g":
                    f["metadata"] = {
                        "delta.generationExpression": "a + 1"}
            a["metaData"]["schemaString"] = json.dumps(sj)
            if extra_conf:
                a["metaData"]["configuration"] = {
                    **(a["metaData"].get("configuration") or {}),
                    **extra_conf,
                }
        out.append(json.dumps(a))
    c0.write_text("\n".join(out) + "\n")


def _mk(spark, path, **kw) -> DeltaLogReader:
    df = spark.createDataFrame(
        [(i, 10 * i, 10 * i + 1) for i in range(1, 6)],
        "id long, a long, g long")  # g already satisfies g = a + 1
    write_delta_table(spark, df, path)
    _foreignize(Path(path), hwm=kw.pop("hwm", 5), **kw)
    return DeltaLogReader(spark, path)


def _hwm(r: DeltaLogReader) -> int | None:
    sj = json.loads(r.snapshot().metadata["schemaString"])
    md = next(f for f in sj["fields"] if f["name"] == "id")["metadata"]
    v = md.get("delta.identity.highWaterMark")
    return int(v) if v is not None else None


def test_append_allocates_identity_and_computes_generated(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    src = spark.createDataFrame([(100,), (200,), (300,)], "a long")
    res = r.append(src)
    assert res["added_files"] >= 1
    r2 = DeltaLogReader(spark, tmp_path / "t")
    rows = {x.a: (x.id, x.g) for x in r2.to_df().collect()}
    assert len(rows) == 8
    # generated computed; identity values are fresh, unique, past hwm
    assert rows[100][1] == 101 and rows[300][1] == 301
    new_ids = {rows[a][0] for a in (100, 200, 300)}
    assert new_ids == {6, 7, 8}
    assert _hwm(r2) == 8
    # second append continues from the bumped watermark
    DeltaLogReader(spark, tmp_path / "t").append(
        spark.createDataFrame([(400,)], "a long"))
    r3 = DeltaLogReader(spark, tmp_path / "t")
    assert {x.id for x in r3.to_df().collect()} == set(range(1, 10))
    assert _hwm(r3) == 9


def test_append_enforces_provided_generated_value(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    ok = spark.createDataFrame([(7, 8)], "a long, g long")
    r.append(ok)  # 8 == 7 + 1
    bad = spark.createDataFrame([(7, 99)], "a long, g long")
    with pytest.raises(DeltaProtocolError,
                       match="generationExpression"):
        DeltaLogReader(spark, tmp_path / "t").append(bad)


def test_append_explicit_identity_gated(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    src = spark.createDataFrame([(50, 1, 2)], "id long, a long, g long")
    with pytest.raises(DeltaProtocolError, match="allowExplicitInsert"):
        r.append(src)
    r2 = _mk(spark, tmp_path / "t2", allow_explicit=True)
    r2.append(src)
    r3 = DeltaLogReader(spark, tmp_path / "t2")
    assert _hwm(r3) == 50  # explicit value beyond the watermark bumps it
    # and the next allocation continues past it
    DeltaLogReader(spark, tmp_path / "t2").append(
        spark.createDataFrame([(60,)], "a long"))
    r4 = DeltaLogReader(spark, tmp_path / "t2")
    assert {x.id for x in r4.to_df().where("a = 60").collect()} == {51}


def test_update_recomputes_generated_and_refuses_set(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    res = r.update({"a": "a + 5"}, where="id = 2")
    assert res["rewritten_files"] >= 1
    r2 = DeltaLogReader(spark, tmp_path / "t")
    row = r2.to_df().where("id = 2").collect()[0]
    assert row.a == 25 and row.g == 26  # recomputed, not stale 21
    for col in ("g", "id"):
        with pytest.raises(DeltaProtocolError, match="generated/identity"):
            DeltaLogReader(spark, tmp_path / "t").update(
                {col: "1"}, where="id = 3")


def test_dv_update_recomputes_generated(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    res = r.update({"a": "a * 10"}, where="id = 4", mode="merge-on-read")
    assert res["dv_files"] >= 1 or res.get("updated_rows")
    r2 = DeltaLogReader(spark, tmp_path / "t")
    row = r2.to_df().where("id = 4").collect()[0]
    assert row.a == 400 and row.g == 401
    with pytest.raises(DeltaProtocolError, match="generated/identity"):
        DeltaLogReader(spark, tmp_path / "t").update(
            {"g": "1"}, where="id = 3", mode="merge-on-read")


def test_merge_allocates_computes_and_refuses_clauses(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    src = spark.createDataFrame([(30, ), (777,)], "a long")
    # no merge key on a alone won't match: join on t.a = s.a matches a=30
    res = r.merge(src, "t.a = s.a",
                  when_matched_update={"a": "s.a + 1"},
                  when_not_matched_insert="all")
    assert res["inserted_rows"] == 1
    r2 = DeltaLogReader(spark, tmp_path / "t")
    rows = {x.a: (x.id, x.g) for x in r2.to_df().collect()}
    # matched row updated a=31, generated recomputed to 32
    assert rows[31][1] == 32
    # inserted row got a fresh identity id (6) and computed g
    assert rows[777] == (6, 778)
    assert _hwm(r2) == 6
    # clauses may not target generated/identity columns
    with pytest.raises(DeltaProtocolError, match="generated/identity"):
        DeltaLogReader(spark, tmp_path / "t").merge(
            src, "t.a = s.a", when_matched_update={"g": "1"})
    # UPDATE * with the identity column in the source refuses
    src2 = spark.createDataFrame([(3, 30)], "id long, a long")
    with pytest.raises(DeltaProtocolError, match="identity"):
        DeltaLogReader(spark, tmp_path / "t").merge(
            src2, "t.a = s.a", when_matched_update="all")


def test_checkpoint_allowed_with_declared_features(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    res = r.checkpoint()
    assert res["version"] == 0
    assert read_delta(spark, tmp_path / "t").count() == 5


def test_allocate_identity_unit(spark):
    df = spark.createDataFrame([(i,) for i in range(7)], "a long").coalesce(3)
    out, hwm = allocate_identity(df.withColumn(
        "id", F.lit(None).cast("long")), "id", start=10, step=-2, hwm=None)
    vals = sorted(x.id for x in out.collect())
    assert vals == [10 - 2 * k for k in range(6, -1, -1)]
    assert hwm == 10 - 2 * 6
    # continuation from a watermark
    out2, hwm2 = allocate_identity(df.withColumn(
        "id", F.lit(None).cast("long")), "id", start=1, step=3, hwm=7)
    assert sorted(x.id for x in out2.collect()) == \
        [10 + 3 * k for k in range(7)]
    assert hwm2 == 10 + 3 * 6
    # empty frame: watermark unchanged
    _, hwm3 = allocate_identity(
        df.where("a < 0").withColumn("id", F.lit(None).cast("long")),
        "id", start=1, step=1, hwm=42)
    assert hwm3 == 42


def test_generated_identity_survive_constraint_pass(spark, tmp_path):
    # generated enforcement shares the single agg pass with CHECK
    # constraints — both report together
    r = _mk(spark, tmp_path / "t", extra_conf={
        "delta.constraints.amax": "a < 1000"})
    with pytest.raises(DeltaProtocolError, match="amax"):
        r.append(spark.createDataFrame([(5000,)], "a long"))
    DeltaLogReader(spark, tmp_path / "t").append(
        spark.createDataFrame([(500,)], "a long"))
    assert read_delta(spark, tmp_path / "t").count() == 6
