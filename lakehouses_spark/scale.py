"""Scale utilities: co-located bucketed joins, skew salting (SURVEY §2.3 J3
context + the 100 TB shuffle-minimization discipline).

These are the levers a 1000-executor deployment reaches for when AQE alone
isn't enough:

- **Bucketing** pre-shuffles a table once at write time; every subsequent
  equi-join/aggregation on the bucket key is exchange-free. The win is
  proportional to how often the table is joined on that key.
- **Salting** splits one hot key across `num_salts` sub-keys: the skewed
  side gets a per-row salt, the other side is replicated per salt. AQE's
  skew-join handles moderate skew automatically; salting is for the
  pathological single-hot-key case (a null-heavy FK, a celebrity user).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str | list[str],
    num_buckets: int = 32,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist df hash-bucketed (and sorted) by key. Joins/aggregations
    between tables bucketed the same way skip their Exchange entirely.
    ``path`` makes the catalog entry an EXTERNAL table at that location
    (callers that bucket into a temp dir rather than the warehouse)."""
    keys = [key] if isinstance(key, str) else key
    w = (
        df.write.mode(mode)
        .bucketBy(num_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `skewed[on]` has pathological hot keys.

    The skewed side gets a deterministic pseudo-random salt derived from the
    whole row (xxhash64 over all columns — no RNG, reproducible); the other
    side is exploded ×num_salts so every (key, salt) partner exists. Output
    columns match a plain `skewed.join(other, on, how)`.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(num_salts))
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = left.join(right, [on, "_salt"], how)
    return out.drop("_salt")


def explain_shuffles(df: DataFrame) -> int:
    """Count Exchange nodes in the analyzed plan — the 'how many shuffles
    does this cost' primitive used by tests and tuning sessions."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue().count("Exchange")
