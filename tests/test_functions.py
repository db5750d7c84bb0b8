"""Function-extension tests: Confluent header helpers, gated avro, Kafka
gating, UDTF/UDAF oracle parity (covered in test_oracle via registry)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouses_spark.functions import (
    AvroUnavailableError,
    from_avro_confluent,
    strip_confluent_header,
)
from lakehouses_spark.functions.avro import schema_registry_id


def test_strip_confluent_header(spark):
    payload = b"\x00\x00\x00\x00\x2aAVRODATA"
    df = spark.createDataFrame([(bytearray(payload),)], "value binary")
    out = df.select(
        strip_confluent_header("value").alias("body"),
        schema_registry_id("value").alias("sid"),
    ).collect()[0]
    assert bytes(out.body) == b"AVRODATA"
    assert out.sid == 42  # big-endian id from bytes 2-5


def test_from_avro_gated_and_fallback(spark):
    """fallback=False keeps the clear jar-missing error; the default decodes
    through the pure-Python codec even without the jar."""
    from lakehouses_spark.functions.avro_py import confluent_frame

    schema = ('{"type": "record", "name": "R", "fields": '
              '[{"name": "a", "type": "int"}, {"name": "b", "type": "string"}]}')
    df = spark.createDataFrame(
        [(bytearray(confluent_frame({"a": 7, "b": "hi"}, schema)),)], "value binary"
    )
    with pytest.raises(AvroUnavailableError, match="spark-avro"):
        df.select(from_avro_confluent("value", schema, fallback=False)).collect()
    row = df.select(from_avro_confluent("value", schema).alias("v")).collect()[0].v
    assert (row.a, row.b) == (7, "hi")


def test_kafka_source_gated(spark, tmp_path):
    """S12 path: building the reader is lazy; starting it without the Kafka
    jar must fail with the standard missing-data-source error."""
    from lakehouses_spark.ingest import IngestionEngine

    eng = IngestionEngine(spark, tmp_path)
    cfg = {"datasource": "k", "dataset": "orders",
           "source": {"format": "kafka", "topic": "orders",
                      "value_format": "json", "json_schema": "id INT"}}
    with pytest.raises(Exception, match="[Kk]afka"):
        eng.read_stream(cfg)


def test_udtf_direct(spark):
    from lakehouses_spark.functions.extended import Tokenize

    spark.udtf.register("tokenize_t", Tokenize)
    rows = spark.sql("SELECT * FROM tokenize_t('spark is fast')").collect()
    assert [(r.pos, r.word) for r in rows] == [(0, "spark"), (1, "is"), (2, "fast")]


def test_udaf_direct(spark):
    from lakehouses_spark.functions.extended import weighted_avg

    df = spark.createDataFrame([(1.0, 1.0), (3.0, 3.0)], "v double, w double")
    got = df.agg(weighted_avg("v", "w").alias("wa")).collect()[0].wa
    assert got == pytest.approx(2.5)  # (1*1 + 3*3) / 4


def test_avro_ocf_file_roundtrip(spark, tmp_path):
    """S15 without the jar: write Avro object-container files, read them
    back distributed (binaryFile source + pure-Python OCF decode)."""
    from lakehouses_spark.functions.avro_py import (
        read_ocf_bytes,
        read_avro_files,
        write_ocf_bytes,
    )

    schema = {
        "type": "record", "name": "Manifest",
        "fields": [
            {"name": "path", "type": "string"},
            {"name": "length", "type": "long"},
            {"name": "valid", "type": "boolean"},
        ],
    }
    rows_a = [{"path": f"f{i}", "length": i * 10, "valid": i % 2 == 0} for i in range(5)]
    rows_b = [{"path": "z", "length": 999, "valid": True}]
    (tmp_path / "a.avro").write_bytes(write_ocf_bytes(rows_a, schema))
    (tmp_path / "b.avro").write_bytes(write_ocf_bytes(rows_b, schema))
    # byte-level roundtrip
    s2, back = read_ocf_bytes((tmp_path / "a.avro").read_bytes())
    assert back == rows_a and s2["name"] == "Manifest"
    # distributed read, schema inferred from the file header
    df = read_avro_files(spark, str(tmp_path))
    assert df.columns == ["path", "length", "valid"]
    got = sorted((r.path, r.length, r.valid) for r in df.collect())
    want = sorted((r["path"], r["length"], r["valid"]) for r in rows_a + rows_b)
    assert got == want
