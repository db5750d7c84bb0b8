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


# --------------------------------------------------------------------------- #
# Bloom-filter semi-join reduction (Bloom 1970; Mackert & Lohman, VLDB'86) —
# the runtime-filter lever for dims too large to broadcast as a hash relation
# but whose KEY SET fits a bitmap. Built entirely from DataFrame ops because
# Spark's internal bloom_filter_agg is not SQL-exposed. No false negatives by
# construction (every key sets exactly its k bits; the probe requires those
# same k bits); false positives only cost wasted probe rows — callers run the
# exact join downstream.
# --------------------------------------------------------------------------- #
BLOOM_M_BITS = 1 << 17  # 131072 bits = 2048 longs ≈ 16 KiB broadcast
BLOOM_K = 3


def _bloom_positions(key_col: str, m_bits: int, k: int):
    return [
        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_bitmap(
    keys: DataFrame, key_col: str, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> DataFrame:
    """ONE-row frame (`bloom: array<long>`, m_bits/64 words) over the key
    set: explode each key into k hash positions, bit_or per-word masks,
    densify against spark.range so the array index is the word index. The
    word aggregation shuffles m_bits/64 rows regardless of key count."""
    positions = keys.select(
        F.explode(F.array(*_bloom_positions(key_col, m_bits, k))).alias("pos")
    )
    words = positions.groupBy(F.expr("pos DIV 64").alias("w")).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(pos % 64 AS int))")).alias("bits")
    )
    return (
        keys.sparkSession.range(m_bits // 64)
        .withColumnRenamed("id", "w")
        .join(words, "w", "left")
        .select("w", F.coalesce("bits", F.lit(0).cast("long")).alias("bits"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("w", "bits"))),
                lambda s: s["bits"],
            ).alias("bloom")
        )
    )


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Rows of ``df`` whose key MAY be in the bitmap's key set — guaranteed
    to keep every row whose key IS in the set (no false negatives). A pure
    projection over ``df``'s scan: the bitmap rides a single-row broadcast
    crossJoin, the k bit tests are JVM intrinsics, and ``df`` is neither
    shuffled nor joined before the filter drops non-matching rows."""
    probed = df.crossJoin(F.broadcast(bitmap))
    for i, pos in enumerate(_bloom_positions(key_col, m_bits, k)):
        probed = probed.withColumn(f"_p{i}", pos)
    hit = " AND ".join(
        f"(element_at(bloom, CAST(_p{i} DIV 64 AS int) + 1)"
        f" & shiftleft(1L, CAST(_p{i} % 64 AS int))) != 0"
        for i in range(k)
    )
    return probed.where(F.expr(hit)).drop(
        "bloom", *[f"_p{i}" for i in range(k)]
    )
