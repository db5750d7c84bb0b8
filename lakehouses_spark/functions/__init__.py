"""Function-extension surface (SURVEY §2.8 F10, §2.11 X4):

- ``avro``     — Confluent wire-format helpers + gated from_avro (S14/S15)
- ``extended`` — Python UDTF and pandas-UDAF examples (X4)
"""

from lakehouses_spark.functions.avro import (  # noqa: F401
    AvroUnavailableError,
    from_avro_confluent,
    strip_confluent_header,
)
