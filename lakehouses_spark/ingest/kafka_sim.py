"""File-backed Kafka topic simulator (test/dev double for S12/S13).

The real connector (`spark-sql-kafka`) is a runtime jar absent from this
environment, so the engine's Kafka logic would otherwise be unexercisable.
This module lets the SAME engine code path (schema contract, `_`-prefix
rename, JSON value decode, multiplex `_topic` partitioning) run against a
directory of parquet "broker segments":

- `KAFKA_SCHEMA` is the exact 7-column record shape the Kafka source
  produces (reference contract: notebooks/03.ingestas_eventos/
  02.ingesta_incremental_singleplex [json].py:62-97 — key/value binary,
  topic, partition, offset, timestamp, timestampType).
- `FileTopicBroker.produce()` appends messages with per-(topic, partition)
  monotonically increasing offsets, like a real broker log.
- The engine reads the directory as a file STREAM with this schema, so
  checkpointed exactly-once delivery, availableNow drains, and trigger
  semantics are all the real Structured Streaming machinery — only the
  wire protocol is simulated.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Exact Kafka source schema (spark-sql-kafka contract).
KAFKA_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


class FileTopicBroker:
    """Appends Kafka-shaped records to parquet segments under `path`."""

    def __init__(self, spark: SparkSession, path: str | Path):
        self.spark = spark
        self.path = Path(path)
        self.path.mkdir(parents=True, exist_ok=True)
        self._offsets: dict[tuple[str, int], int] = {}
        self._segment = 0

    def _next_offset(self, topic: str, partition: int) -> int:
        k = (topic, partition)
        self._offsets[k] = self._offsets.get(k, -1) + 1
        return self._offsets[k]

    def produce(
        self,
        topic: str,
        messages: list[dict | tuple[bytes | None, bytes]],
        partition: int = 0,
        ts: datetime | None = None,
    ) -> None:
        """Append messages to a topic. Each message is either a dict (JSON-
        encoded into `value`, like the reference's pizza-order producer,
        03…/01.datasource [json].py:93-205) or a (key, value) bytes tuple."""
        ts = ts or datetime.now(timezone.utc)
        rows = []
        for m in messages:
            if isinstance(m, dict):
                key, value = None, json.dumps(m, sort_keys=True).encode()
            else:
                key, value = m
            rows.append(
                (key, value, topic, partition,
                 self._next_offset(topic, partition), ts, 0)
            )
        df = self.spark.createDataFrame(rows, KAFKA_SCHEMA)
        # one parquet file per produce() call = one broker segment
        df.coalesce(1).write.mode("append").parquet(str(self.path))
        self._segment += 1
