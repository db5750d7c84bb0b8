"""Pure-Python Avro binary codec + `from_avro` fallback (S14/F10).

The reference decodes Confluent-framed Kafka Avro with Spark's `from_avro`
(notebooks/03.ingestas_eventos/05.ingesta_incremental_singleplex
[avro].py:134-152). That function needs the spark-avro jar, absent from this
environment — so this module implements the Avro binary encoding itself
(the spec's core: zigzag varints, length-prefixed bytes/strings, IEEE754
little-endian floats, records/arrays/maps/unions/enums/fixed) and exposes

    from_avro_py(value_col, json_schema) -> struct Column

as an Arrow-batched pandas UDF. It is the slow-path fallback: when the jar
IS present, `from_avro_confluent` uses the JVM decoder; the Python decoder
keeps the S14 pipeline (header strip → schema-registry routing → decode →
struct expand) fully runnable and testable without it. The encoder exists
for the producer side (the reference's faker-based Avro generator,
03…/04.datasource [avro].py:95-300) and the round-trip tests.

Not supported (raise cleanly): general multi-branch unions other than
["null", X], recursive schemas, logical-type conversions (values decode as
their base types, like spark-avro without `avroSchema` options).
"""

from __future__ import annotations

import io
import json
import struct as _struct
from typing import Any

import pandas as pd

from pyspark.sql import Column
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


class AvroSchemaError(ValueError):
    pass


# --------------------------------------------------------------------- #
# schema → Spark type
# --------------------------------------------------------------------- #
def _parse_schema(s: str | dict) -> dict | str | list:
    # JSON documents start with { [ or "; a bare string ('int', 'string')
    # is already an Avro type NAME, not a JSON document
    if isinstance(s, str) and s.lstrip()[:1] in ("{", "[", '"'):
        return json.loads(s)
    return s


def avro_to_spark_type(schema: str | dict | list) -> DataType:
    """Map an Avro schema to the Spark type spark-avro would produce."""
    s = _parse_schema(schema)
    if isinstance(s, str):
        prim = {
            "null": StringType(),  # standalone null only appears in unions
            "boolean": BooleanType(),
            "int": IntegerType(),
            "long": LongType(),
            "float": FloatType(),
            "double": DoubleType(),
            "bytes": BinaryType(),
            "string": StringType(),
        }
        if s not in prim:
            raise AvroSchemaError(f"unknown avro type: {s}")
        return prim[s]
    if isinstance(s, list):  # union
        branches = [b for b in s if b != "null"]
        if len(branches) != 1:
            raise AvroSchemaError(f"only [null, X] unions supported, got {s}")
        return avro_to_spark_type(branches[0])
    t = s["type"]
    if t == "record":
        return StructType(
            [
                StructField(f["name"], avro_to_spark_type(f["type"]), True)
                for f in s["fields"]
            ]
        )
    if t == "array":
        return ArrayType(avro_to_spark_type(s["items"]), True)
    if t == "map":
        return MapType(StringType(), avro_to_spark_type(s["values"]), True)
    if t == "enum":
        return StringType()
    if t == "fixed":
        return BinaryType()
    return avro_to_spark_type(t)  # {"type": "string"} style wrapping


# --------------------------------------------------------------------- #
# binary decode (Avro spec §binary encoding)
# --------------------------------------------------------------------- #
def _read_long(buf: io.BytesIO) -> int:
    """Zigzag-encoded variable-length integer."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated avro varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _decode(buf: io.BytesIO, schema: str | dict | list) -> Any:
    s = schema
    if isinstance(s, str):
        if s == "null":
            return None
        if s == "boolean":
            return buf.read(1)[0] == 1
        if s in ("int", "long"):
            return _read_long(buf)
        if s == "float":
            return _struct.unpack("<f", buf.read(4))[0]
        if s == "double":
            return _struct.unpack("<d", buf.read(8))[0]
        if s == "bytes":
            return buf.read(_read_long(buf))
        if s == "string":
            return buf.read(_read_long(buf)).decode("utf-8")
        raise AvroSchemaError(f"unknown avro type: {s}")
    if isinstance(s, list):  # union: branch index then value
        idx = _read_long(buf)
        if idx < 0 or idx >= len(s):
            raise AvroSchemaError(f"union index {idx} out of range for {s}")
        return _decode(buf, s[idx])
    t = s["type"]
    if t == "record":
        return {f["name"]: _decode(buf, f["type"]) for f in s["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(_decode(buf, s["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = buf.read(_read_long(buf)).decode("utf-8")
                out[k] = _decode(buf, s["values"])
        return out
    if t == "enum":
        return s["symbols"][_read_long(buf)]
    if t == "fixed":
        return buf.read(s["size"])
    return _decode(buf, t)


def avro_decode(payload: bytes, schema: str | dict) -> Any:
    return _decode(io.BytesIO(payload), _parse_schema(schema))


# --------------------------------------------------------------------- #
# binary encode (for the producer harness + round-trip tests)
# --------------------------------------------------------------------- #
def _write_long(buf: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63)  # zigzag
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            break


def _encode(buf: io.BytesIO, schema: str | dict | list, v: Any) -> None:
    s = schema
    if isinstance(s, str):
        if s == "null":
            return
        if s == "boolean":
            buf.write(b"\x01" if v else b"\x00")
        elif s in ("int", "long"):
            _write_long(buf, int(v))
        elif s == "float":
            buf.write(_struct.pack("<f", float(v)))
        elif s == "double":
            buf.write(_struct.pack("<d", float(v)))
        elif s == "bytes":
            _write_long(buf, len(v))
            buf.write(v)
        elif s == "string":
            raw = v.encode("utf-8")
            _write_long(buf, len(raw))
            buf.write(raw)
        else:
            raise AvroSchemaError(f"unknown avro type: {s}")
        return
    if isinstance(s, list):
        idx = s.index("null") if v is None else next(
            i for i, b in enumerate(s) if b != "null"
        )
        _write_long(buf, idx)
        _encode(buf, s[idx], v)
        return
    t = s["type"]
    if t == "record":
        for f in s["fields"]:
            _encode(buf, f["type"], v[f["name"]])
    elif t == "array":
        if v:
            _write_long(buf, len(v))
            for item in v:
                _encode(buf, s["items"], item)
        _write_long(buf, 0)
    elif t == "map":
        if v:
            _write_long(buf, len(v))
            for k, item in v.items():
                _encode(buf, "string", k)
                _encode(buf, s["values"], item)
        _write_long(buf, 0)
    elif t == "enum":
        _write_long(buf, s["symbols"].index(v))
    elif t == "fixed":
        buf.write(v)
    else:
        _encode(buf, t, v)


def avro_encode(value: Any, schema: str | dict) -> bytes:
    buf = io.BytesIO()
    _encode(buf, _parse_schema(schema), value)
    return buf.getvalue()


def confluent_frame(value: Any, schema: str | dict, schema_id: int = 1) -> bytes:
    """Wrap an encoded record in Confluent's wire format: magic 0x00 + 4-byte
    big-endian schema id + avro binary body."""
    return b"\x00" + schema_id.to_bytes(4, "big") + avro_encode(value, schema)


# --------------------------------------------------------------------- #
# the Spark-facing fallback
# --------------------------------------------------------------------- #
def from_avro_py(value: Column | str, json_format_schema: str) -> Column:
    """Pure-Python `from_avro` over a raw (already header-stripped) Avro
    binary column — Arrow-batched pandas UDF returning the struct type the
    JVM decoder would produce. Slow path by design: prefer
    `from_avro_confluent` when the spark-avro jar is present."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    schema = _parse_schema(json_format_schema)
    spark_type = avro_to_spark_type(schema)
    if not isinstance(spark_type, StructType):
        raise AvroSchemaError("top-level avro schema must be a record")

    @pandas_udf(spark_type)
    def decode(payloads: pd.Series) -> pd.DataFrame:
        rows = [
            None if p is None else avro_decode(bytes(p), schema)
            for p in payloads
        ]
        return pd.DataFrame(
            [
                {f.name: (None if r is None else r.get(f.name)) for f in spark_type.fields}
                for r in rows
            ],
            columns=[f.name for f in spark_type.fields],
        )

    c = F.col(value) if isinstance(value, str) else value
    return decode(c)


# --------------------------------------------------------------------- #
# Avro Object Container Files (S15 — the .avro files Iceberg stores its
# snapshot/manifest metadata in, 03.iceberg_primer.py:433,452-456)
# --------------------------------------------------------------------- #
_OCF_META_SCHEMA = {"type": "map", "values": "bytes"}


def read_ocf_bytes(data: bytes) -> tuple[dict, list]:
    """Parse one Avro Object Container File: returns (writer schema, rows).
    Supports null and deflate codecs (deflate = raw zlib, per spec)."""
    import zlib

    buf = io.BytesIO(data)
    if buf.read(4) != b"Obj\x01":
        raise AvroSchemaError("not an Avro object container file (bad magic)")
    meta = _decode(buf, _OCF_META_SCHEMA)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    rows = []
    while True:
        try:
            n = _read_long(buf)
        except EOFError:
            break
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise AvroSchemaError(f"unsupported OCF codec: {codec}")
        bbuf = io.BytesIO(block)
        for _ in range(n):
            rows.append(_decode(bbuf, schema))
        if buf.read(16) != sync:
            raise AvroSchemaError("OCF sync marker mismatch (corrupt file)")
    return schema, rows


def write_ocf_bytes(rows: list, schema: str | dict) -> bytes:
    """Encode rows as an Avro Object Container File (null codec)."""
    import os as _os

    s = _parse_schema(schema)
    buf = io.BytesIO()
    buf.write(b"Obj\x01")
    _encode(buf, _OCF_META_SCHEMA,
            {"avro.schema": json.dumps(s).encode(), "avro.codec": b"null"})
    sync = _os.urandom(16)
    buf.write(sync)
    body = io.BytesIO()
    for r in rows:
        _encode(body, s, r)
    _write_long(buf, len(rows))
    _write_long(buf, len(body.getvalue()))
    buf.write(body.getvalue())
    buf.write(sync)
    return buf.getvalue()


def read_avro_files(spark, path: str, json_format_schema: str | dict | None = None):
    """S15: distributed Avro file read — files are discovered and shipped by
    the binaryFile source (one row per file, parallel by file), each decoded
    in an Arrow-batched mapInPandas pass with the pure-Python OCF reader.

    The reader schema defaults to the first file's embedded writer schema
    (resolved on the driver from one file's header); pass
    `json_format_schema` to project with an explicit reader schema."""
    from pyspark.sql import functions as F  # noqa: F401

    if json_format_schema is None:
        sample = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.avro")
            .load(path)
            .select("content")
            .limit(1)
            .collect()
        )
        if not sample:
            raise FileNotFoundError(f"no .avro files under {path}")
        json_format_schema, _ = read_ocf_bytes(bytes(sample[0].content))
    schema = _parse_schema(json_format_schema)
    spark_type = avro_to_spark_type(schema)
    if not isinstance(spark_type, StructType):
        raise AvroSchemaError("top-level avro schema must be a record")

    def run(batches):
        cols = [f.name for f in spark_type.fields]
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                _, rows = read_ocf_bytes(bytes(content))
                out.extend({c: r.get(c) for c in cols} for r in rows)
            yield pd.DataFrame(out, columns=cols)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
        .mapInPandas(run, spark_type)
    )
