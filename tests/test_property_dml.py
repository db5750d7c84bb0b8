"""Model-based differential test for the LakeTable DML engine: hypothesis
generates random op sequences; each op is applied both to the real table and
to an in-memory reference model; final state AND a random historical version
must agree. This is the right rigor for a homegrown transaction layer."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from lakehouses_spark.tables import LakeTable

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# ops: ("append", rows) | ("delete", threshold) | ("update", factor, threshold)
#    | ("lazy_delete", threshold) | ("overwrite", rows)
_rows = st.lists(
    st.tuples(st.integers(0, 50), st.integers(-100, 100)), min_size=1, max_size=5
)
_op = st.one_of(
    st.tuples(st.just("append"), _rows),
    st.tuples(st.just("delete"), st.integers(-50, 50)),
    st.tuples(st.just("lazy_delete"), st.integers(-50, 50)),
    st.tuples(st.just("update"), st.integers(2, 3), st.integers(-50, 50)),
    st.tuples(st.just("overwrite"), _rows),
)


def _apply_model(model: list[tuple[int, int]], op) -> list[tuple[int, int]]:
    kind = op[0]
    if kind == "append":
        return model + list(op[1])
    if kind in ("delete", "lazy_delete"):
        return [(k, v) for k, v in model if not v > op[1]]
    if kind == "update":
        _, factor, thr = op
        return [(k, v * factor if v > thr else v) for k, v in model]
    if kind == "overwrite":
        return list(op[1])
    raise AssertionError(kind)


@given(ops=st.lists(_op, min_size=1, max_size=5), data=st.data())
@SET
def test_dml_sequence_matches_model(spark, tmp_path_factory, ops, data):
    tmp = tmp_path_factory.mktemp("dml_model")
    init = [(1, 10), (2, -20), (3, 30)]
    t = LakeTable.create(
        spark, tmp / "t", spark.createDataFrame(init, "k int, v int")
    )
    model = list(init)
    model_at_version: dict[int, list] = {0: list(model)}

    for op in ops:
        kind = op[0]
        if kind == "append":
            t.append(spark.createDataFrame(op[1], "k int, v int"))
        elif kind == "delete":
            t.delete(f"v > {op[1]}")
        elif kind == "lazy_delete":
            t.delete(f"v > {op[1]}", lazy=True)
        elif kind == "update":
            _, factor, thr = op
            t.update({"v": f"v * {factor}"}, where=f"v > {thr}")
        elif kind == "overwrite":
            t.overwrite(spark.createDataFrame(op[1], "k int, v int"))
        model = _apply_model(model, op)
        model_at_version[t.version] = list(model)

    def canon(rows):
        return sorted(rows)

    got = canon([(r.k, r.v) for r in t.read().collect()])
    assert got == canon(model), f"final state diverged after {ops}"

    # time travel to a random recorded version must match the model history
    v = data.draw(st.sampled_from(sorted(model_at_version)), label="version")
    got_v = canon([(r.k, r.v) for r in t.read(version=v).collect()])
    assert got_v == canon(model_at_version[v]), f"version {v} diverged after {ops}"


# ------- r11: cross-format differential for the EXTERNAL write plane ------ #
# ops over the no-LakeTable lifecycle: the same random sequence runs
# through DeltaLogReader AND IcebergMetadataReader on tables born from
# write_delta_table / write_iceberg_table, against the in-memory model —
# the two formats must agree with the model and with each other, and a
# partitioned Delta twin must match too (per-partition rewrite is pure
# layout, never semantics).
_wop = st.one_of(
    st.tuples(st.just("append"), _rows),
    st.tuples(st.just("delete"), st.integers(-50, 50)),
    st.tuples(st.just("update"), st.integers(2, 3), st.integers(-50, 50)),
    st.tuples(st.just("merge"), _rows),
)


def _apply_writer_model(model, op):
    kind = op[0]
    if kind == "append":
        return model + list(op[1])
    if kind == "delete":
        return [(k, v) for k, v in model if not v > op[1]]
    if kind == "update":
        _, factor, thr = op
        return [(k, v * factor if v > thr else v) for k, v in model]
    if kind == "merge":  # upsert by k: last source row per key wins
        src = {}
        for k, v in op[1]:
            src[k] = v
        out = [(k, src.pop(k)) if k in src else (k, v) for k, v in model]
        return out + sorted(src.items())
    raise AssertionError(kind)


@given(ops=st.lists(_wop, min_size=1, max_size=4))
@SET
def test_external_writer_dml_cross_format(spark, tmp_path_factory, ops):
    from lakehouses_spark.tables.delta_log import (
        DeltaLogReader,
        read_delta,
        write_delta_table,
    )
    from lakehouses_spark.tables.iceberg_meta import (
        IcebergMetadataReader,
        read_iceberg,
        write_iceberg_table,
    )

    tmp = tmp_path_factory.mktemp("xfmt")
    init = [(1, 10), (2, -20), (3, 30)]
    init_df = spark.createDataFrame(init, "k int, v int").coalesce(1)
    # partition column derived from v's sign so DML moves rows around
    pdf = init_df.selectExpr("k", "v", "IF(v >= 0, 'pos', 'neg') AS seg")
    write_delta_table(spark, init_df, tmp / "d")
    write_delta_table(spark, pdf, tmp / "dp", partition_by=["seg"])
    write_iceberg_table(spark, init_df, tmp / "i")
    model = list(init)

    def mk_src(rows):
        return spark.createDataFrame(rows, "k int, v int").coalesce(1)

    for op in ops:
        rd = DeltaLogReader(spark, tmp / "d")
        rp = DeltaLogReader(spark, tmp / "dp")
        ri = IcebergMetadataReader(spark, tmp / "i")
        kind = op[0]
        if kind == "append":
            rd.append(mk_src(op[1]))
            rp.append(mk_src(op[1]).selectExpr(
                "k", "v", "IF(v >= 0, 'pos', 'neg') AS seg"))
            ri.append(mk_src(op[1]))
        elif kind == "delete":
            rd.delete(f"v > {op[1]}")
            rp.delete(f"v > {op[1]}")
            ri.delete(f"v > {op[1]}")
        elif kind == "update":
            _, factor, thr = op
            rd.update({"v": f"v * {factor}"}, where=f"v > {thr}")
            rp.update({"v": f"v * {factor}"}, where=f"v > {thr}")
            ri.update({"v": f"v * {factor}"}, where=f"v > {thr}")
        elif kind == "merge":
            # last-wins dedupe: MERGE refuses multi-match sources
            src = {}
            for k, v in op[1]:
                src[k] = v
            rows = sorted(src.items())
            rd.merge(mk_src(rows), "t.k = s.k")
            rp.merge(mk_src(rows).selectExpr(
                "k", "v", "IF(v >= 0, 'pos', 'neg') AS seg"),
                "t.k = s.k")
            ri.merge(mk_src(rows), "t.k = s.k")
            model = _apply_writer_model(model, ("merge", rows))
            continue
        model = _apply_writer_model(model, op)

    def canon(rows):
        return sorted(rows)

    want = canon(model)
    got_d = canon([(r.k, r.v)
                   for r in read_delta(spark, tmp / "d").collect()])
    got_p = canon([(r.k, r.v) for r in
                   read_delta(spark, tmp / "dp").select("k", "v").collect()])
    got_i = canon([(r.k, r.v)
                   for r in read_iceberg(spark, tmp / "i").collect()])
    assert got_d == want, f"delta diverged after {ops}"
    assert got_i == want, f"iceberg diverged after {ops}"
    assert got_p == want, f"partitioned delta diverged after {ops}"
    # the partitioned layout stayed truthful: every row's partition value
    # matches its v sign (MERGE sources recompute seg, so a matched row
    # whose sign changed moved to its new partition; updates here scale
    # by a positive factor and never flip signs)
    for r in read_delta(spark, tmp / "dp").collect():
        assert r.seg == ("pos" if r.v >= 0 else "neg"), r
