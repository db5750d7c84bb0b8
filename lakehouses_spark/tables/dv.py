"""Delta deletion-vector (DV) decoding — stdlib only.

Modern Delta writers (Databricks defaults, delta-rs) delete rows by attaching
a *deletion vector* to an `add` action instead of rewriting the file: a
roaring bitmap of the file's deleted row indexes (delta-io/delta
PROTOCOL.md, "Deletion Vectors" + "Deletion Vector Format"). This module
parses the public on-disk format so `DeltaLogReader` can read such tables:

- descriptor (`add.deletionVector`): `{storageType, pathOrInlineDv, offset,
  sizeInBytes, cardinality}` with storageType `u` (relative file, z85 uuid),
  `p` (absolute path), or `i` (inline z85 payload);
- DV payload: `[magic 1681511377 (0x6439D3D1) int32 LE]` + Delta's *RoaringBitmapArray*
  "portable" serialization — `[numBitmaps int64 LE]` then, per 32-bit
  bucket i (covering row indexes `[i·2³², (i+1)·2³²)`), one standard
  RoaringBitmap in the public RoaringFormatSpec portable layout (array /
  bitmap / run containers);
- on-disk DV files: `[version byte == 1]` then per DV
  `[dataSize int32 BE][payload][crc32 int32 BE]`, with `offset` pointing at
  the dataSize word.

Scale: DV payloads are tiny relative to the data they mask (a bitmap over
row indexes, ≤ a few MB for millions of deletes); parsing happens once per
snapshot on the driver and the deleted (file, row_index) set joins the scan
as a broadcast anti-join — the data files are never rewritten or re-read.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

MAGIC = 1681511377  # int32 LE magic prefixing every DV payload

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_CHARS)}

SERIAL_COOKIE = 12347              # 32-bit roaring: run containers present
SERIAL_COOKIE_NO_RUNCONTAINER = 12346
NO_OFFSET_THRESHOLD = 4


class DeletionVectorError(ValueError):
    """Malformed or unsupported deletion-vector payload."""


def z85_decode(text: str) -> bytes:
    """ZeroMQ Z85 decode (RFC 32/Z85) — Delta encodes DV uuids and inline
    payloads with it. Input length must be a multiple of 5."""
    if len(text) % 5:
        raise DeletionVectorError(f"z85 length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for ch in text[i : i + 5]:
            try:
                acc = acc * 85 + _Z85_DECODE[ch]
            except KeyError:
                raise DeletionVectorError(f"invalid z85 character {ch!r}") from None
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    """Inverse of :func:`z85_decode` (used by tests building DV fixtures)."""
    if len(data) % 4:
        raise DeletionVectorError(f"z85 input {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            chunk.append(_Z85_CHARS[rem])
        out += reversed(chunk)
    return "".join(out)


def _parse_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one standard 32-bit RoaringBitmap (RoaringFormatSpec portable
    layout) starting at ``pos``; return (sorted values, new position)."""
    (cookie,) = struct.unpack_from("<i", buf, pos)
    pos += 4
    run_flags = b""
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        n_flag_bytes = (size + 7) // 8
        run_flags = buf[pos : pos + n_flag_bytes]
        pos += n_flag_bytes
        has_offsets = size >= NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUNCONTAINER:
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        has_offsets = True
    else:
        raise DeletionVectorError(f"bad roaring cookie {cookie}")

    keys_cards = struct.unpack_from(f"<{2 * size}H", buf, pos)
    pos += 4 * size
    if has_offsets:
        pos += 4 * size  # offset header — containers follow in order anyway

    values: list[int] = []
    for i in range(size):
        key, card_m1 = keys_cards[2 * i], keys_cards[2 * i + 1]
        card = card_m1 + 1
        base = key << 16
        is_run = bool(run_flags) and bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = struct.unpack_from(f"<{2 * n_runs}H", buf, pos)
            pos += 4 * n_runs
            for r in range(n_runs):
                start, length_m1 = runs[2 * r], runs[2 * r + 1]
                values.extend(base | v for v in range(start, start + length_m1 + 1))
        elif card > 4096:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for w_i, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base | (w_i << 6) | low.bit_length() - 1)
                    w ^= low
        else:
            arr = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base | v for v in arr)
    return values, pos


def decode_dv_payload(payload: bytes) -> list[int]:
    """Decode a DV payload (magic + RoaringBitmapArray portable) into the
    sorted list of deleted row indexes."""
    if len(payload) < 12:
        raise DeletionVectorError(f"payload too short ({len(payload)} bytes)")
    (magic,) = struct.unpack_from("<i", payload, 0)
    if magic != MAGIC:
        raise DeletionVectorError(f"bad DV magic {magic} (want {MAGIC})")
    (n_bitmaps,) = struct.unpack_from("<q", payload, 4)
    pos = 12
    out: list[int] = []
    for high in range(n_bitmaps):
        vals, pos = _parse_roaring32(payload, pos)
        out.extend((high << 32) | v for v in vals)
    return out


def read_descriptor(descriptor: dict, table_root: Path) -> list[int]:
    """Resolve a `deletionVector` descriptor to its deleted row indexes.

    storageType 'i': payload inline (z85). 'u': file under the table root
    named `deletion_vector_<uuid>.bin`, optional random prefix directory,
    uuid z85-encoded in the last 20 chars of pathOrInlineDv. 'p': absolute
    path. For file storage, `offset` points at the `[dataSize int32 BE]`
    word and the payload is followed by a big-endian CRC-32 of itself.
    """
    import uuid as _uuid

    st = descriptor["storageType"]
    if st == "i":
        payload = z85_decode(descriptor["pathOrInlineDv"])
    elif st in ("u", "p"):
        if st == "u":
            enc = descriptor["pathOrInlineDv"]
            prefix, uuid_part = enc[:-20], enc[-20:]
            u = _uuid.UUID(bytes=z85_decode(uuid_part))
            name = f"deletion_vector_{u}.bin"
            path = table_root / prefix / name if prefix else table_root / name
        else:
            path = Path(descriptor["pathOrInlineDv"])
        raw = path.read_bytes()
        if not raw or raw[0] != 1:
            raise DeletionVectorError(
                f"unsupported DV file version {raw[:1]!r} at {path}"
            )
        off = descriptor.get("offset", 1)
        (data_size,) = struct.unpack_from(">i", raw, off)
        payload = raw[off + 4 : off + 4 + data_size]
        (crc,) = struct.unpack_from(">I", raw, off + 4 + data_size)
        if zlib.crc32(payload) & 0xFFFFFFFF != crc:
            raise DeletionVectorError(f"DV checksum mismatch at {path}")
    else:
        raise DeletionVectorError(f"unknown DV storageType {st!r}")
    vals = decode_dv_payload(payload)
    card = descriptor.get("cardinality")
    if card is not None and card != len(vals):
        raise DeletionVectorError(
            f"DV cardinality {card} != decoded {len(vals)}"
        )
    return vals


# --------------------------------------------------------------------------- #
# encoding (r8): export_delta_log writes merge-on-read tombstones as native
# DVs — the inverse of the reader above. Emits array containers (≤ 4096
# values) and bitmap containers (dense) in the no-run-container portable
# layout; run containers are never emitted (the spec lets encoders pick any
# legal container mix, and decode_dv_payload reads all three).
# --------------------------------------------------------------------------- #
def z85_encode_padded(data: bytes) -> str:
    """z85 of `data` zero-padded to a 4-byte multiple (descriptor inline
    payloads are padded per the Delta implementation)."""
    return z85_encode(data + b"\0" * (-len(data) % 4))


def _ser_roaring32(vals: list[int]) -> bytes:
    """One 32-bit RoaringBitmap (RoaringFormatSpec portable, no-run
    cookie) over sorted 32-bit values."""
    containers: dict[int, list[int]] = {}
    for v in vals:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    size = len(keys)
    out = struct.pack("<ii", SERIAL_COOKIE_NO_RUNCONTAINER, size)
    out += b"".join(
        struct.pack("<HH", k, len(containers[k]) - 1) for k in keys
    )
    bodies = []
    for k in keys:
        c = containers[k]
        if len(c) > 4096:
            words = [0] * 1024
            for v in c:
                words[v >> 6] |= 1 << (v & 63)
            bodies.append(struct.pack("<1024Q", *words))
        else:
            bodies.append(struct.pack(f"<{len(c)}H", *c))
    base = len(out) + 4 * size
    offs, cur = [], base
    for b in bodies:
        offs.append(cur)
        cur += len(b)
    out += struct.pack(f"<{size}i", *offs)
    return out + b"".join(bodies)


def encode_dv_payload(indexes: list[int]) -> bytes:
    """Sorted deleted row indexes → DV payload (magic + RoaringBitmapArray
    portable). Exact inverse of :func:`decode_dv_payload` (round-trip
    pinned by test)."""
    buckets: dict[int, list[int]] = {}
    for v in sorted(indexes):
        if v < 0:
            raise DeletionVectorError(f"negative row index {v}")
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n = max(buckets) + 1 if buckets else 0
    out = struct.pack("<i", MAGIC) + struct.pack("<q", n)
    for hi in range(n):
        out += _ser_roaring32(buckets.get(hi, []))
    return out


def write_dv_file(path: Path, payload: bytes) -> int:
    """On-disk DV file: `[version byte 1]` then `[dataSize int32 BE]
    [payload][crc32 int32 BE]`; returns the descriptor `offset` (points at
    the dataSize word)."""
    blob = bytes([1]) + struct.pack(">i", len(payload)) + payload
    blob += struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF)
    path.write_bytes(blob)
    return 1


# inline descriptors keep the payload in the JSON log — fine for typical
# delete sets, but a multi-MB bitmap belongs in a sidecar file
INLINE_DV_MAX_BYTES = 32_768


def make_descriptor(indexes: list[int], table_root: Path) -> dict:
    """Build an `add.deletionVector` descriptor for the given deleted row
    indexes: inline (storageType 'i') up to INLINE_DV_MAX_BYTES, else a
    `deletion_vector_<uuid>.bin` file under `table_root` (storageType 'u',
    z85-encoded uuid)."""
    import uuid as _uuid

    payload = encode_dv_payload(indexes)
    if len(payload) <= INLINE_DV_MAX_BYTES:
        return {
            "storageType": "i",
            "pathOrInlineDv": z85_encode_padded(payload),
            "sizeInBytes": len(payload),
            "cardinality": len(indexes),
        }
    u = _uuid.uuid4()
    off = write_dv_file(table_root / f"deletion_vector_{u}.bin", payload)
    return {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(u.bytes),
        "offset": off,
        "sizeInBytes": len(payload),
        "cardinality": len(indexes),
    }


def make_descriptor_from_payload(payload: bytes, cardinality: int,
                                 table_root: Path) -> dict:
    """`make_descriptor` for a pre-encoded payload (the merge-on-read
    DELETE encodes bitmaps executor-side and ships only the bytes):
    inline (storageType 'i') up to INLINE_DV_MAX_BYTES, else a
    `deletion_vector_<uuid>.bin` sidecar (storageType 'u')."""
    import uuid as _uuid

    if len(payload) <= INLINE_DV_MAX_BYTES:
        return {
            "storageType": "i",
            "pathOrInlineDv": z85_encode_padded(payload),
            "sizeInBytes": len(payload),
            "cardinality": cardinality,
        }
    u = _uuid.uuid4()
    off = write_dv_file(table_root / f"deletion_vector_{u}.bin", payload)
    return {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(u.bytes),
        "offset": off,
        "sizeInBytes": len(payload),
        "cardinality": cardinality,
    }
