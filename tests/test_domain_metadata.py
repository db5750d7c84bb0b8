"""Delta `domainMetadata` writer feature (PROTOCOL.md "Domain Metadata").

Previously refused as an unknown writer feature; now:
- domains replay from the JSON log (set / overwrite / removed=true),
- survive checkpoints via the dedicated `domainMetadata` checkpoint
  column (without it, cleaning the JSON log silently destroys state
  other engines trust — e.g. clustering metadata),
- tables declaring the feature become writable,
- user domains can be set/removed externally; system domains (`delta.*`)
  refuse — forging another engine's state is corruption.
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


def _mk(spark, path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    write_delta_table(spark, df, path)
    return DeltaLogReader(spark, path)


def _append_commit(path, actions):
    log = Path(path) / "_delta_log"
    v = max(int(p.name.split(".")[0])
            for p in log.glob("*.json")) + 1
    (log / f"{v:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions) + "\n")


def test_domains_replay_set_overwrite_remove(spark, tmp_path):
    _mk(spark, tmp_path / "t")
    _append_commit(tmp_path / "t", [{"domainMetadata": {
        "domain": "app.x", "configuration": "v1", "removed": False}}])
    _append_commit(tmp_path / "t", [{"domainMetadata": {
        "domain": "app.x", "configuration": "v2", "removed": False}},
        {"domainMetadata": {
            "domain": "app.y", "configuration": "y", "removed": False}}])
    _append_commit(tmp_path / "t", [{"domainMetadata": {
        "domain": "app.y", "configuration": "", "removed": True}}])
    snap = DeltaLogReader(spark, tmp_path / "t").snapshot()
    assert snap.domains == {"app.x": "v2"}
    # time travel sees the state as of that version
    snap1 = DeltaLogReader(spark, tmp_path / "t").snapshot(2)
    assert snap1.domains == {"app.x": "v2", "app.y": "y"}


def test_feature_declared_table_is_writable(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    _append_commit(tmp_path / "t", [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["domainMetadata"]}},
        {"domainMetadata": {"domain": "delta.clustering",
                            "configuration": "{\"cols\":[\"k\"]}",
                            "removed": False}},
    ])
    # every committing verb accepts the feature now
    r2 = DeltaLogReader(spark, tmp_path / "t")
    r2.append(spark.createDataFrame([(3, "c")], "k long, s string"))
    r3 = DeltaLogReader(spark, tmp_path / "t")
    assert r3.to_df().count() == 3
    # the foreign system domain is preserved, readable, untouched
    assert "delta.clustering" in r3.snapshot().domains


def test_checkpoint_preserves_domains(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    r.set_domain_metadata("app.cfg", json.dumps({"mode": "fast"}))
    _append_commit(tmp_path / "t", [{"domainMetadata": {
        "domain": "delta.clustering", "configuration": "{}",
        "removed": False}}])
    r2 = DeltaLogReader(spark, tmp_path / "t")
    r2.checkpoint()
    for f in (Path(tmp_path) / "t" / "_delta_log").glob("*.json"):
        f.unlink()  # simulate log cleanup: checkpoint is all that's left
    snap = DeltaLogReader(spark, tmp_path / "t").snapshot()
    assert snap.domains == {"app.cfg": '{"mode": "fast"}',
                            "delta.clustering": "{}"}
    assert DeltaLogReader(spark, tmp_path / "t").to_df().count() == 2


def test_set_remove_verbs_and_protocol_upgrade(spark, tmp_path):
    r = _mk(spark, tmp_path / "t")
    res = r.set_domain_metadata("app.cfg", "c1")
    assert res["version"] == 1
    snap = DeltaLogReader(spark, tmp_path / "t").snapshot()
    assert snap.domains == {"app.cfg": "c1"}
    # legacy protocol upgraded to table features with implied legacy set
    assert snap.protocol["minWriterVersion"] == 7
    assert "domainMetadata" in snap.protocol["writerFeatures"]
    assert "appendOnly" in snap.protocol["writerFeatures"]
    DeltaLogReader(spark, tmp_path / "t").remove_domain_metadata("app.cfg")
    assert DeltaLogReader(spark, tmp_path / "t").snapshot().domains == {}
    with pytest.raises(DeltaProtocolError, match="system domain"):
        DeltaLogReader(spark, tmp_path / "t").set_domain_metadata(
            "delta.clustering", "{}")
    with pytest.raises(DeltaProtocolError, match="not set"):
        DeltaLogReader(spark, tmp_path / "t").remove_domain_metadata(
            "app.gone")
