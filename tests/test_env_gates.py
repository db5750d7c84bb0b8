"""Environment-gate probes (VERDICT r3 directive #7): S7 (Iceberg runtime),
S12/S13 (Kafka wire) and the Avro JVM decoder are gated on jars absent from
this container. These tests PROBE the environment each round instead of
assuming it: if a jar ever appears, the matching test fails loudly with the
instruction to light up the already-written integration path (the semantic
substitutes — LakeTable, file-backed broker, pure-Python Avro codec — are
tested elsewhere). Gate states are recorded in COVERAGE.md §limits."""

from __future__ import annotations

import pytest


def _jvm_class_loadable(spark, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


def test_gate_iceberg_runtime(spark):
    """S7: `USING iceberg` needs iceberg-spark-runtime on the classpath."""
    present = _jvm_class_loadable(
        spark, "org.apache.iceberg.spark.SparkCatalog"
    )
    assert not present, (
        "iceberg-spark-runtime has APPEARED in this environment — un-gate S7: "
        "configure spark.sql.catalog.* per README §limits and enable the "
        "Iceberg DDL/read/write integration tests"
    )


def test_gate_kafka_source(spark):
    """S12/S13: the kafka data source needs spark-sql-kafka on the classpath."""
    present = _jvm_class_loadable(
        spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"
    )
    assert not present, (
        "spark-sql-kafka has APPEARED in this environment — un-gate S12/S13: "
        "point ingest/engine.py::_read_kafka at the real source and run the "
        "wire-protocol tests against a broker"
    )


def test_gate_avro_jvm_decoder(spark):
    """S14/F10: the JVM from_avro needs the spark-avro jar; without it the
    pure-Python codec (functions/avro_py.py) carries the whole decode path."""
    present = _jvm_class_loadable(
        spark, "org.apache.spark.sql.avro.AvroDataToCatalyst"
    )
    assert not present, (
        "spark-avro has APPEARED in this environment — functions/avro.py "
        "should now prefer the JVM decoder; verify decoder-selection logic"
    )


def test_gate_protobuf_python():
    """transformWithState needs google.protobuf in the Python env."""
    try:
        import google.protobuf  # noqa: F401
        present = True
    except ImportError:
        present = False
    if present:
        pytest.fail(
            "google.protobuf has APPEARED — transformWithState is now "
            "usable; consider migrating streaming/windows.py stateful ops"
        )
