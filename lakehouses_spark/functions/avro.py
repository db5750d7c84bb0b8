"""Avro decode for Kafka payloads (SURVEY §2.1 S14/S15).

Reference: notebooks/03.ingestas_eventos/05.ingesta_incremental_singleplex
[avro].py:134-152 — Confluent's wire format prefixes every Avro message with
a 5-byte header (magic byte 0x00 + 4-byte schema-registry id), which must be
stripped before `from_avro`.

The header-strip is a pure column expression (always available). `from_avro`
itself needs the spark-avro module jar, which is not bundled in this
environment — the wrapper raises AvroUnavailableError with the exact
`--packages org.apache.spark:spark-avro_2.13:<version>` remedy instead of a
Py4J stack trace.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


class AvroUnavailableError(RuntimeError):
    pass


def strip_confluent_header(value: Column | str) -> Column:
    """Drop the 5-byte Confluent envelope: substring(value, 6, len-5)
    (03…/05…[avro].py:148, 04…/01.ingestas_motor.py:155-158)."""
    c = F.col(value) if isinstance(value, str) else value
    return F.substring(c, F.lit(6), F.length(c) - 5)


def schema_registry_id(value: Column | str) -> Column:
    """The 4-byte big-endian schema id from the Confluent header — used to
    route multiplexed topics to the right reader schema."""
    c = F.col(value) if isinstance(value, str) else value
    return (
        F.conv(F.hex(F.substring(c, 2, 4)), 16, 10).cast("int").alias("schema_id")
    )


def avro_available() -> bool:
    """True iff the spark-avro module jar is on the active session's
    classpath (the Python `from_avro` import alone proves nothing — the
    expression fails lazily at execution)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return False
    try:
        from pyspark.sql.avro.functions import from_avro

        probe = spark.range(1).select(F.lit(b"").alias("v"))
        probe.select(from_avro("v", '{"type": "string"}')).schema  # forces analysis
        return True
    except Exception:
        return False


def from_avro_confluent(
    value: Column | str, json_format_schema: str, fallback: bool = True
) -> Column:
    """from_avro over a header-stripped Confluent payload.

    Uses the JVM decoder when the spark-avro jar is on the classpath; with
    `fallback=True` (default) it otherwise decodes with the pure-Python
    Avro codec (`functions/avro_py.py`, Arrow-batched) so the S14 pipeline
    stays functional in jar-less environments. `fallback=False` restores
    the hard error with the --packages remedy."""
    if avro_available():
        from pyspark.sql.avro.functions import from_avro

        return from_avro(strip_confluent_header(value), json_format_schema)
    if fallback:
        from lakehouses_spark.functions.avro_py import from_avro_py

        return from_avro_py(strip_confluent_header(value), json_format_schema)
    raise AvroUnavailableError(
        "spark-avro module not on the classpath; start the session with "
        "--packages org.apache.spark:spark-avro_2.13:<spark-version> "
        "(not bundled in this environment)"
    )
