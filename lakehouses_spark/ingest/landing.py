"""Landing-zone extract writer (S20).

Reference: `land_file` at notebooks/02.ingestas_ficheros/01.datasource
[json].py:125-170 — one immutable timestamped file per extract, under dated
directories:

    <root>/<datasource>/<dataset>/YYYY/MM/DD/<datasource>-<dataset>-<ts>.<fmt>

The reference uses `coalesce(1)` + dbutils move; this writes through Spark
the same way (single-file extracts are a landing-zone convention, not an
engine path — bronze ingestion re-parallelizes immediately).
"""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import DataFrame

from lakehouses_spark import fs


def land_file(
    df: DataFrame,
    root: str | Path,
    datasource: str,
    dataset: str,
    fmt: str = "json",
    ts: datetime | None = None,
) -> Path:
    """Write df as ONE file following the landing naming convention; returns
    the landed file path."""
    ts = ts or datetime.now(timezone.utc)
    stamp = ts.strftime("%Y%m%d%H%M%S%f")
    day_dir = Path(root) / datasource / dataset / ts.strftime("%Y/%m/%d")
    fs.mkdirs(day_dir)
    dest = day_dir / f"{datasource}-{dataset}-{stamp}.{fmt}"

    with tempfile.TemporaryDirectory() as tmp:
        out = Path(tmp) / "out"
        writer = df.coalesce(1).write.mode("overwrite")
        if fmt == "json":
            writer.json(str(out))
        elif fmt == "csv":
            writer.option("header", True).csv(str(out))
        elif fmt == "parquet":
            writer.parquet(str(out))
        else:
            raise ValueError(f"unsupported landing format: {fmt}")
        part = next(p for p in out.iterdir() if p.name.startswith("part-"))
        shutil.move(str(part), dest)
    return dest
