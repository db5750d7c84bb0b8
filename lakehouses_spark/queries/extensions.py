"""Driver queries for the X4 extension surface (UDTF / pandas UDAF) — each
with an exact DuckDB oracle since the semantics are deterministic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouses_spark.io import load_table
from lakehouses_spark.registry import query


@query(
    "udtf_tokenize",
    oracle="""
    WITH toks AS (
      SELECT p_partkey, string_split(p_name, ' ') AS words FROM part
      WHERE p_partkey % 17 = 0
    ), positions AS (
      SELECT p_partkey, words, unnest(generate_series(1, len(words))) AS i FROM toks
    )
    SELECT p_partkey, CAST(i - 1 AS INTEGER) AS pos, words[i] AS word
    FROM positions
    ORDER BY p_partkey, pos
    """,
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 UDTF: lateral-join the Python table function against part names."""
    from lakehouses_spark.functions.extended import Tokenize

    spark.udtf.register("tokenize", Tokenize)
    load_table(spark, sf_dir, "part").where(F.col("p_partkey") % 17 == 0) \
        .createOrReplaceTempView("_udtf_part")
    return spark.sql(
        """
        SELECT p.p_partkey, t.pos, t.word
        FROM _udtf_part p, LATERAL tokenize(p.p_name) t
        ORDER BY p.p_partkey, t.pos
        """
    )


@query(
    "udaf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
             AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 pandas UDAF: quantity-weighted average price per return flag.

    NOTE on scale: a GROUPED_AGG pandas UDF materializes each group in one
    Python worker (no partial aggregation). Fine for bounded-cardinality
    groups like these 3 flags; the built-in expression in the oracle is what
    unbounded groups should use."""
    from lakehouses_spark.functions.extended import weighted_avg

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                weighted_avg(F.col("l_extendedprice"), F.col("l_quantity")), 4
            ).alias("weighted_avg_price")
        )
        .orderBy("l_returnflag")
    )
