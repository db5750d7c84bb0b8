"""Schema-registry client (S14 registry-lookup leg): file-backed backend
exercises the full API offline; the HTTP backend's gating is pinned (no
network in this environment — clear error, not a urllib trace)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lakehouses_spark.functions.avro_py import confluent_frame
from lakehouses_spark.functions.schema_registry import (
    SchemaNotFoundError,
    SchemaRegistryClient,
    SchemaRegistryUnavailableError,
    decode_multiplex,
    from_avro_registry,
)

ORDER_SCHEMA = (
    '{"type": "record", "name": "Order", "fields": ['
    '{"name": "id", "type": "long"}, {"name": "amount", "type": "double"}]}'
)
CLICK_SCHEMA = (
    '{"type": "record", "name": "Click", "fields": ['
    '{"name": "id", "type": "long"}, {"name": "page", "type": "string"}]}'
)


@pytest.fixture()
def registry(tmp_path):
    return SchemaRegistryClient(str(tmp_path / "registry"))


def test_register_and_lookup_roundtrip(registry):
    sid = registry.register("orders-value", ORDER_SCHEMA)
    assert registry.get_schema(sid) == ORDER_SCHEMA
    latest_id, latest = registry.get_latest("orders-value")
    assert (latest_id, latest) == (sid, ORDER_SCHEMA)
    # content-addressed: same schema re-registers to the same id,
    # even under a different subject (Confluent dedupes by content)
    assert registry.register("orders-value", ORDER_SCHEMA) == sid
    assert registry.register("orders-dlq-value", ORDER_SCHEMA) == sid
    # a different schema gets a new id and becomes the subject's latest
    sid2 = registry.register("orders-value", CLICK_SCHEMA)
    assert sid2 != sid
    assert registry.get_latest("orders-value")[0] == sid2


def test_missing_lookups_raise(registry):
    with pytest.raises(SchemaNotFoundError):
        registry.get_schema(999)
    with pytest.raises(SchemaNotFoundError):
        registry.get_latest("nope-value")


def test_http_backend_gated_without_network():
    client = SchemaRegistryClient("http://localhost:18081")
    with pytest.raises(SchemaRegistryUnavailableError, match="unreachable"):
        client.get_schema(1)
    with pytest.raises(SchemaRegistryUnavailableError):
        client.register("s-value", ORDER_SCHEMA)


def test_from_avro_registry_decodes_subject_stream(spark, registry):
    sid = registry.register("orders-value", ORDER_SCHEMA)
    rows = [(i, confluent_frame({"id": i, "amount": i * 1.5}, ORDER_SCHEMA, sid))
            for i in range(20)]
    df = spark.createDataFrame(rows, "k long, value binary")
    out = (
        df.select(from_avro_registry("value", registry, "orders-value").alias("p"))
        .select("p.id", "p.amount")
        .orderBy("id")
        .collect()
    )
    assert [r.id for r in out] == list(range(20))
    assert out[3].amount == 4.5


def test_decode_multiplex_splits_by_header_id(spark, registry):
    oid = registry.register("orders-value", ORDER_SCHEMA)
    cid = registry.register("clicks-value", CLICK_SCHEMA)
    rows = [
        (confluent_frame({"id": i, "amount": float(i)}, ORDER_SCHEMA, oid),)
        for i in range(5)
    ] + [
        (confluent_frame({"id": 100 + i, "page": f"/p{i}"}, CLICK_SCHEMA, cid),)
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "value binary")
    out = decode_multiplex(df, "value", registry)
    assert set(out.columns) == {"_schema_id", "id", "amount", "page"}
    got = {(r._schema_id, r.id) for r in out.collect()}
    assert got == {(oid, i) for i in range(5)} | {(cid, 100 + i) for i in range(3)}
    # null-filled across the evolution union
    pages = {r.id: r.page for r in out.collect()}
    assert pages[0] is None and pages[102] == "/p2"


def test_decode_multiplex_empty_input_returns_empty_frame(spark, registry):
    """ADVICE r4 #2: an empty (or all-null) stream slice has no schema ids
    to resolve — decode_multiplex must return an empty frame with the
    _schema_id column instead of raising IndexError on branches[0]."""
    df = spark.createDataFrame([], "value binary")
    out = decode_multiplex(df, "value", registry)
    assert out.columns == ["_schema_id"]
    assert out.count() == 0
