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
