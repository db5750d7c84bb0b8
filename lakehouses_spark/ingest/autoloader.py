"""Incremental file source — the Auto Loader `cloudFiles` replacement (S10).

What Auto Loader gives the reference (02…/00.databricks_autoloader.py:15-103)
and how each piece maps here:

- only-new-file discovery, exactly-once → Spark's built-in file stream source
  already does this via the sink checkpoint's source log (no custom code)
- `cloudFiles.schemaLocation` (persisted inferred schema)
  → infer once from existing files, persist `<schema_location>/schema.json`
- `cloudFiles.inferColumnTypes` → full inference on first batch sample
- `cloudFiles.schemaHints` → per-column DDL overrides applied on top
- `cloudFiles.schemaEvolutionMode=addNewColumns` → `evolve()` re-infers and
  widens the persisted schema with new columns (Auto Loader restarts the
  stream on new columns; here the caller re-opens the source, same contract)
- `_rescued_data` → PERMISSIVE mode + columnNameOfCorruptRecord: rows that
  don't fit the schema land with the raw record in `_rescued_data`
- `pathGlobFilter` / `recursiveFileLookup` / `maxFilesPerTrigger` → passed
  through to the built-in source unchanged

Scale note: file discovery state lives in the streaming checkpoint (RocksDB-
or log-backed on a cluster); the schema file is tiny and read once per
stream start — nothing here is proportional to data volume.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType, StringType

RESCUED = "_rescued_data"

_READ_FORMATS = ("json", "csv", "parquet", "text", "binaryFile")


class IncrementalFileSource:
    def __init__(
        self,
        spark: SparkSession,
        path: str | Path,
        fmt: str = "json",
        schema_location: str | Path | None = None,
        schema_hints: dict[str, str] | None = None,
        options: dict[str, str] | None = None,
        rescue: bool = True,
    ):
        if fmt not in _READ_FORMATS:
            raise ValueError(f"unsupported format {fmt}; one of {_READ_FORMATS}")
        self.spark = spark
        self.path = str(path)
        self.fmt = fmt
        self.schema_location = Path(schema_location) if schema_location else None
        self.schema_hints = schema_hints or {}
        self.options = options or {}
        self.rescue = rescue and fmt in ("json", "csv")

    # --- schema tracking ------------------------------------------------ #
    def _schema_file(self) -> Path | None:
        return self.schema_location / "schema.json" if self.schema_location else None

    def _infer(self) -> StructType:
        """One bounded batch read over currently-present files to infer
        types (cloudFiles.inferColumnTypes)."""
        reader = self.spark.read.format(self.fmt)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        if self.fmt == "csv":
            reader = reader.option("header", True).option("inferSchema", True)
        inferred = reader.load(self.path).schema
        return self._apply_hints(inferred)

    def _apply_hints(self, schema: StructType) -> StructType:
        if not self.schema_hints:
            return schema
        from pyspark.sql.types import _parse_datatype_string  # public-ish helper

        fields = []
        for f in schema.fields:
            if f.name in self.schema_hints:
                fields.append(
                    StructField(f.name, _parse_datatype_string(self.schema_hints[f.name]), True)
                )
            else:
                fields.append(f)
        return StructType(fields)

    def schema(self) -> StructType:
        """Load persisted schema, inferring + persisting on first use."""
        sf = self._schema_file()
        if sf and sf.exists():
            return StructType.fromJson(json.loads(sf.read_text()))
        s = self._infer()
        if sf:
            sf.parent.mkdir(parents=True, exist_ok=True)
            sf.write_text(json.dumps(s.jsonValue()))
        return s

    def evolve(self) -> tuple[StructType, list[str]]:
        """addNewColumns evolution: re-infer against current files, widen the
        persisted schema with columns it doesn't have yet. Returns (schema,
        new_column_names). Caller restarts its stream when non-empty —
        exactly Auto Loader's restart-on-new-column contract."""
        current = self.schema()
        fresh = self._infer()
        have = {f.name for f in current.fields}
        new = [f for f in fresh.fields if f.name not in have]
        if not new:
            return current, []
        widened = StructType(current.fields + new)
        sf = self._schema_file()
        if sf:
            sf.write_text(json.dumps(widened.jsonValue()))
        return widened, [f.name for f in new]

    # --- stream construction -------------------------------------------- #
    def stream(self) -> DataFrame:
        """The unbounded DataFrame (S10). Schema is pinned (file streams
        require it); unparseable rows land in `_rescued_data`."""
        schema = self.schema()
        read_schema = schema
        if self.rescue and RESCUED not in schema.names:
            read_schema = StructType(schema.fields + [StructField(RESCUED, StringType(), True)])
        reader = self.spark.readStream.format(self.fmt).schema(read_schema)
        if self.rescue:
            reader = reader.option("mode", "PERMISSIVE").option(
                "columnNameOfCorruptRecord", RESCUED
            )
        if self.fmt == "csv":
            reader = reader.option("header", True)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.load(self.path)
