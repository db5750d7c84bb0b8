"""X4: UDTF + pandas UDAF surface (SURVEY §2.11 — absent in the reference,
exposed for Spark-native coverage).

- `Tokenize` — Python UDTF (Spark 3.5+): one input string → (pos, word)
  rows. Table functions run per-row in a Python worker; fine for control-
  plane explosion, but the engine's hot paths use JVM-side explode/transform
  (see text.py) — this exists to cover the API surface.
- `weighted_avg` / grouped-agg pandas UDF — Arrow-batched UDAF; one batch
  per group per partition, partial-aggregation-free (so only for bounded
  group sizes; unbounded groups should use built-in aggregates).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


@udtf(returnType="pos int, word string")
class Tokenize:
    """UDTF: SELECT * FROM tokenize('a b c') → rows (0,'a'),(1,'b'),(2,'c')."""

    def eval(self, text: str):
        if text is None:
            return
        for pos, word in enumerate(text.split()):
            yield pos, word


@pandas_udf(DoubleType())
def weighted_avg(values: pd.Series, weights: pd.Series) -> float:
    """GROUPED_AGG pandas UDAF: sum(v*w)/sum(w) per group."""
    denom = weights.sum()
    return float((values * weights).sum() / denom) if denom else float("nan")
