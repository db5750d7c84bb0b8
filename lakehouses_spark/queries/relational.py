"""Relational core: scans, filters, joins, aggregations, sorts, set ops.

Covers SURVEY §2.1 S1/S4, §2.2 P1-P9, §2.3 J2-J4, §2.4 A1-A8, §2.6 O1-O3,
§2.7 U1/U3. Reference evidence cited per query. All plans are declarative
DataFrame chains — Catalyst handles pushdown, pruning, join strategy; the only
explicit physical hint is ``F.broadcast`` on bounded dimension tables (J3),
which at 100 TB keeps the big fact table shuffle-free.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouses_spark.io import load_table
from lakehouses_spark.registry import query


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1 shape (SURVEY §7.2) — scan → filter → groupBy → agg → sort
# Exercises S1, P6, A2, A7, O1 in one plan. The filter is pushed into the
# parquet scan; aggregation is partial (map-side) then final after a 2-key
# shuffle — the canonical scale-friendly plan.
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: 3-way join + group + top-k (J2, A7, O1).
# customer is small relative to the fact tables → Catalyst/AQE broadcasts it;
# orders⋈lineitem is the real shuffle, keyed on orderkey.
# ---------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR)        AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '2000-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("2000-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: 6-way star join (J2 + J3). region/nation/supplier are tiny
# dims → explicitly broadcast so the only shuffles are fact-fact.
# ---------------------------------------------------------------------------
@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


# ---------------------------------------------------------------------------
# Join matrix (J2/J4). Reference has MERGE-only joins
# (02.delta_lake_primer.py:312-320); the silver star schema + testdata imply
# the standard matrix.
# ---------------------------------------------------------------------------
@query(
    "join_inner_agg",
    oracle="""
    SELECT c_nationkey,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 2) AS total_spend
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def join_inner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey,
           count(o_orderkey)                       AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
           count(DISTINCT c.c_custkey)            AS n_customers,
           count(DISTINCT s.s_suppkey)            AS n_suppliers
    FROM customer c FULL OUTER JOIN supplier s ON c.c_nationkey = s.s_nationkey
    GROUP BY coalesce(c.c_nationkey, s.s_nationkey)
    ORDER BY nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    j = cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full_outer")
    return (
        j.groupBy(F.coalesce(cust.c_nationkey, supp.s_nationkey).alias("nationkey"))
        .agg(
            F.count_distinct(cust.c_custkey).alias("n_customers"),
            F.count_distinct(supp.s_suppkey).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left-semi — 'customers having at least one big order'. The
    procedural analog in the reference is the already-ingested-files set
    check (02…/03.ingesta_incremental_v2 [json].py:211-218)."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left-anti — 'customers with no orders' (new-files-only set logic)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name, count(*) AS n_customers, round(avg(c_acctbal), 4) AS avg_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: explicit broadcast of bounded dims — at 100 TB the customer scan
    never shuffles; each task hash-probes the 25-row nation / 5-row region
    maps locally."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_balance"),
        )
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# Aggregations (A1-A8)
# ---------------------------------------------------------------------------
@query(
    "agg_count_by_key",
    oracle="""
    SELECT l_returnflag, count(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_count_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: groupBy-count (02.delta_lake_primer.py:62-66)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
    )


@query(
    "agg_sum_all_numeric",
    oracle="""
    SELECT l_linestatus,
           round(sum(l_quantity), 2)      AS sum_quantity,
           round(sum(l_extendedprice), 2) AS sum_extendedprice,
           round(sum(l_discount), 4)      AS sum_discount,
           round(sum(l_tax), 4)           AS sum_tax
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def agg_sum_all_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: grouped sum of all numeric measure columns
    (02.delta_lake_primer.py:166-169 `.groupBy(k).sum()`)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_quantity"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_extendedprice"),
            F.round(F.sum("l_discount"), 4).alias("sum_discount"),
            F.round(F.sum("l_tax"), 4).alias("sum_tax"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "agg_global_scalars",
    oracle="""
    SELECT max(o_totalprice)             AS max_price,
           min(o_totalprice)             AS min_price,
           round(avg(o_totalprice), 4)   AS avg_price,
           count(*)                      AS n_orders,
           count(DISTINCT o_custkey)     AS n_customers
    FROM orders
    """,
)
def agg_global_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4: global scalar aggregate (03.iceberg_primer.py:276)."""
    return load_table(spark, sf_dir, "orders").agg(
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.count(F.lit(1)).alias("n_orders"),
        F.count_distinct("o_custkey").alias("n_customers"),
    )


@query(
    "distinct_projection",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem ORDER BY l_returnflag, l_linestatus
    """,
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: distinct (02…/02.ingesta_incremental [json].py:145-148)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_having_topk",
    oracle="""
    SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING sum(o_totalprice) > 500000
    ORDER BY total_spend DESC, o_custkey
    LIMIT 10
    """,
)
def agg_having_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: agg + having-style post-filter + sort-on-agg + limit
    (02.delta_lake_primer.py:370-376). Plans as TakeOrderedAndProject —
    no global sort materialization at scale."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("_raw_spend"))
        .where(F.col("_raw_spend") > 500000)
        .select("o_custkey", F.round("_raw_spend", 2).alias("total_spend"))
        .orderBy(F.col("total_spend").desc(), "o_custkey")
        .limit(10)
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: rollup (subtotal hierarchy) — Catalyst expands to an Expand node;
    partial aggregation still applies."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: cube — all grouping-set combinations."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: explicit GROUPING SETS — the general form rollup/cube specialize."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`). The approx_percentile sketch is the scale path;
    this pins the exact semantics."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_corr_stats",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4)           AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2)     AS covar_qty_price,
           round(stddev_samp(l_extendedprice), 2)                AS std_price,
           round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope_price_per_qty,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 statistical aggregates: correlation, sample covariance, sample
    stddev, and OLS regression slope/intercept per group. All are one-pass
    moment aggregations (sum, sum-of-squares, sum-of-products) that
    partial-aggregate map-side — constant state per group at any scale, no
    second pass over the data."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("std_price"),
            F.round(
                F.expr("regr_slope(l_extendedprice, l_quantity)"), 4
            ).alias("slope_price_per_qty"),
            F.round(
                F.expr("regr_intercept(l_extendedprice, l_quantity)"), 2
            ).alias("intercept_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(l_extendedprice / 5000.0) AS INTEGER) AS bin,
           count(*) AS n_items,
           round(min(l_extendedprice), 2) AS bin_min,
           round(max(l_extendedprice), 2) AS bin_max,
           round(sum(l_extendedprice), 2) AS total
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: fixed-width value histogram (width_bucket shape) — bin id is a
    pure per-row expression (`floor(x / width)`), so the whole histogram is
    one map-side-combining hash aggregation over ≤ range/width groups. The
    distribution profile every data-quality pass runs before choosing
    filter thresholds."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_extendedprice") / 5000.0).cast("int").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.min("l_extendedprice"), 2).alias("bin_min"),
            F.round(F.max("l_extendedprice"), 2).alias("bin_max"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
        .orderBy("bin")
    )


@query("agg_approx_distinct", oracle=None)  # HLL sketch differs per engine → rows-only
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: approx_count_distinct — HyperLogLog++ sketch, constant memory per
    group at any scale (the exact count needs a full shuffle of the keys).

    Self-checking (the rows-only driver row still carries signal, same
    discipline as gold_als_recommendations): every group's sketch estimate
    is asserted within 3× the default relative standard deviation (rsd
    0.05 → ±15%) of the exact distinct count before the result is
    returned — a broken sketch fails the query, not just a lenient
    rows-only comparison. Output schema unchanged (estimate only)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey").alias("approx_orders"))
        .orderBy("l_returnflag")
    )
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_orderkey").alias("n"))
        .collect()
    }
    for r in out.collect():  # bounded: one row per return flag (3)
        rel_err = abs(r.approx_orders - exact[r.l_returnflag]) / exact[r.l_returnflag]
        assert rel_err <= 0.15, (
            f"HLL estimate off by {rel_err:.1%} for {r.l_returnflag} "
            f"(approx {r.approx_orders}, exact {exact[r.l_returnflag]})"
        )
    return out


# ---------------------------------------------------------------------------
# Filters (P6/P7/P8 are covered in scalar.py for array ops)
# ---------------------------------------------------------------------------
@query(
    "filter_between_in",
    oracle="""
    SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS total
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_discount IS NOT NULL
    """,
)
def filter_between_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P7: range + membership + null predicates, all pushed to the scan
    (01.parquet_primer.py:144-157 demonstrates PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_discount").isNotNull()
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("total"))


@query(
    "sql_over_path",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def sql_over_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: SQL directly over a parquet path — `select * from parquet.`path``
    (01.parquet_primer.py:179, 02…/02.ingesta_incremental [json].py:136-141)."""
    return spark.sql(
        f"""
        SELECT o_orderpriority, count(*) AS n
        FROM parquet.`{sf_dir}/orders.parquet`
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


@query(
    "join_lateral_topk",
    oracle="""
    SELECT n.n_name, c.c_name, round(c.c_acctbal, 2) AS acctbal
    FROM nation n,
    LATERAL (SELECT c_name, c_acctbal FROM customer
             WHERE c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_name LIMIT 2) c
    ORDER BY n.n_name, acctbal DESC, c.c_name
    """,
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    "top-2 customers per nation" query in its SQL-standard LATERAL
    spelling (J-family SQL-surface parity: both engines accept the same
    text). Catalyst DECORRELATES it: the executed plan is a hash equi-join
    on the correlation key plus a per-group limit — no per-outer-row
    re-execution, which is what makes the declarative spelling survive
    scale; the tie order (c_acctbal DESC, c_name) is total, so the LIMIT
    cutoff is deterministic in both engines."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, round(c.c_acctbal, 2) AS acctbal
        FROM nation n,
        LATERAL (SELECT c_name, c_acctbal FROM customer
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        ORDER BY n.n_name, acctbal DESC, c.c_name
        """
    )


# ---------------------------------------------------------------------------
# Sorts / limits (O1-O3)
# ---------------------------------------------------------------------------
@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: orderBy desc + limit → TakeOrderedAndProject (per-partition top-k
    then driver merge of k·p rows, never a global sort)."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations (U1/U3)
# ---------------------------------------------------------------------------
@query(
    "union_by_name",
    oracle="""
    SELECT kind, count(*) AS n FROM (
      SELECT 'customer' AS kind, c_name AS name FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_name AS name FROM supplier
    ) GROUP BY kind ORDER BY kind
    """,
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: unionByName (05.movielens/03.movielens-gold.py:167)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.lit("customer").alias("kind"), F.col("c_name").alias("name"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_name").alias("name"), F.lit("supplier").alias("kind"))
    )
    return cust.unionByName(supp).groupBy("kind").agg(F.count(F.lit(1)).alias("n")).orderBy("kind")


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: intersect — nations having both customers and suppliers."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp).orderBy("nationkey")


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: except — nations with customers but no suppliers."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    # subtract = EXCEPT DISTINCT (exceptAll would keep surplus multiplicity)
    return cust.subtract(supp).orderBy("nationkey")


@query("random_split_sample", oracle=None)  # RNG differs per engine → rows-only
def random_split_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: seeded randomSplit (02.delta_lake_primer.py:59,
    05.movielens/03.movielens-gold.py:46) — deterministic within Spark.

    Self-checking (rows-only row carries signal): the split must be a
    PARTITION of the input (n_train + n_test = n, the property randomSplit
    guarantees regardless of RNG) and the observed train fraction must sit
    within ±5 points of the requested 0.8 — a skewed or overlapping split
    fails the query itself."""
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    train, test = orders.randomSplit([0.8, 0.2], seed=42)
    out = train.agg(F.count(F.lit(1)).alias("n_train")).crossJoin(
        test.agg(F.count(F.lit(1)).alias("n_test"))
    )
    r = out.collect()[0]  # bounded: 1 row
    assert r.n_train + r.n_test == n, "randomSplit must partition the input"
    frac = r.n_train / n
    assert abs(frac - 0.8) <= 0.05, f"train fraction {frac:.3f} far from 0.8"
    return out


# ---------------------------------------------------------------------------
# Subqueries (Catalyst decorrelation — SURVEY §4)
# ---------------------------------------------------------------------------
@query(
    "subquery_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS — Catalyst decorrelates it into a
    left-semi join on the correlation key."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "subquery_scalar",
    oracle="""
    SELECT count(*) AS n,
           round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    WHERE l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: scalar subquery in a predicate — planned as a
    single-row broadcast against the scan."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT count(*) AS n,
               round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem
        WHERE l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem)
        """
    )


@query(
    "subquery_in_having",
    oracle="""
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(l_quantity) > 120
    )
    ORDER BY c_custkey, o_orderkey
    """,
)
def subquery_in_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over an aggregated-HAVING subquery (large-order
    customers) — decorrelates to a semi join against the aggregate."""
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey
          HAVING sum(l_quantity) > 120
        )
        ORDER BY c_custkey, o_orderkey
        """
    )


@query(
    "subquery_not_exists_avg",
    oracle="""
    SELECT substring(c_name, 10, 4) AS key_prefix,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY substring(c_name, 10, 4)
    ORDER BY key_prefix
    """,
)
def subquery_not_exists_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + anti-join (positive-
    balance customers who never ordered)."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT substring(c_name, 10, 4) AS key_prefix,
               count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY substring(c_name, 10, 4)
        ORDER BY key_prefix
        """
    )


@query(
    "join_count_distribution",
    oracle="""
    SELECT n_orders, count(*) AS n_customers FROM (
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
)
def join_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left join with a non-key predicate in the ON clause,
    double aggregation (customer-order-count histogram)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), F.col("n_orders").desc())
    )


@query(
    "subquery_correlated_min",
    oracle="""
    SELECT s_name, p_partkey, round(ps_cost, 2) AS cost
    FROM (
      SELECT s.s_name, p.p_partkey,
             s.s_acctbal + p.p_retailprice AS ps_cost
      FROM part p JOIN supplier s ON p.p_partkey % 10 = s.s_suppkey
    ) x
    WHERE ps_cost = (
      SELECT min(s2.s_acctbal + p2.p_retailprice)
      FROM part p2 JOIN supplier s2 ON p2.p_partkey % 10 = s2.s_suppkey
      WHERE p2.p_partkey = x.p_partkey
    )
    ORDER BY p_partkey, s_name
    """,
)
def subquery_correlated_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar MIN subquery (cheapest supplier per
    part) — decorrelates into an aggregate + self-join."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT s_name, p_partkey, round(ps_cost, 2) AS cost
        FROM (
          SELECT s.s_name, p.p_partkey,
                 s.s_acctbal + p.p_retailprice AS ps_cost
          FROM part p JOIN supplier s ON p.p_partkey % 10 = s.s_suppkey
        ) x
        WHERE ps_cost = (
          SELECT min(s2.s_acctbal + p2.p_retailprice)
          FROM part p2 JOIN supplier s2 ON p2.p_partkey % 10 = s2.s_suppkey
          WHERE p2.p_partkey = x.p_partkey
        )
        ORDER BY p_partkey, s_name
        """
    )


@query(
    "subquery_exists_not_exists",
    oracle="""
    SELECT o_custkey, count(*) AS n_waiting_orders
    FROM orders o1
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o1.o_orderkey AND l_shipdate > o_orderdate)
      AND NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o1.o_orderkey AND l_quantity > 45)
    GROUP BY o_custkey
    HAVING count(*) >= 2
    ORDER BY n_waiting_orders DESC, o_custkey
    """,
)
def subquery_exists_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS on the same correlation key —
    plans as a semi join followed by an anti join."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_custkey, count(*) AS n_waiting_orders
        FROM orders o1
        WHERE o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o1.o_orderkey AND l_shipdate > o_orderdate)
          AND NOT EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o1.o_orderkey AND l_quantity > 45)
        GROUP BY o_custkey
        HAVING count(*) >= 2
        ORDER BY n_waiting_orders DESC, o_custkey
        """
    )


@query(
    "window_zscore",
    oracle="""
    SELECT event_id, user_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 4) AS zscore
    FROM events
    ORDER BY user_id, event_id
    """,
)
def window_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group standardization via window aggregates (one shuffle). The
    GROUPED_MAP applyInPandas equivalent lives in operators.zscore_pandas —
    equivalence-tested; this JVM form is the engine path."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.round(
                (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w), 4
            ).alias("zscore"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# Projection / rename surface (P1-P5, P9-P10 patterns)
# ---------------------------------------------------------------------------
@query(
    "project_rename_derive",
    oracle="""
    SELECT o_orderkey                         AS _order_id,
           upper(o_orderstatus)               AS status,
           round(o_totalprice * 1.1, 2)       AS price_with_fee,
           CAST(year(o_orderdate) AS INTEGER) AS order_year
    FROM orders
    WHERE o_orderkey % 100 = 0
    ORDER BY _order_id
    """,
)
def project_rename_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P3: projection + bulk rename (the `_`-prefix loop of
    03…/02…[json].py:98-100) + withColumn derivations."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 100 == 0)
    return (
        orders.withColumn("status", F.upper("o_orderstatus"))
        .withColumn("price_with_fee", F.round(F.col("o_totalprice") * 1.1, 2))
        .withColumn("order_year", F.year("o_orderdate").cast("int"))
        .select(
            F.col("o_orderkey").alias("_order_id"),
            "status",
            "price_with_fee",
            "order_year",
        )
        .orderBy("_order_id")
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide reshape): order counts per priority × status. Explicit
    pivot values skip the extra distinct-values job Spark otherwise runs —
    the form you want at scale (one pass, map-side partial aggregation)."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("F", "O", "P")],
    ).orderBy("o_orderpriority")


@query(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, round(value, 2) AS value FROM (
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    )
    WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_linenumber, measure
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (long reshape): three lineitem measures into (measure, value)
    rows — `df.unpivot` maps to a single generate stage, no shuffle."""
    l = load_table(spark, sf_dir, "lineitem").where("l_orderkey <= 100")
    return (
        l.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "measure",
            "value",
        )
        .select(
            "l_orderkey", "l_linenumber", "measure",
            F.round("value", 2).alias("value"),
        )
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


@query(
    "lateral_tokens_posexplode",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents WHERE doc_id < 5
    )
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, words[i] AS token
    FROM (SELECT doc_id, words, unnest(generate_series(1, len(words))) AS i FROM t)
    ORDER BY doc_id, pos
    """,
)
def lateral_tokens_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral view / posexplode: one row per (doc, position, token) — the
    generator runs inside codegen; no Python, no shuffle."""
    d = load_table(spark, sf_dir, "documents").where("doc_id < 5")
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .select("doc_id", F.col("pos").cast("int").alias("pos"), "token")
        .orderBy("doc_id", "pos")
    )


@query(
    "agg_mode",
    oracle="""
    WITH counts AS (
      SELECT l_returnflag, l_quantity, count(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    ), ranked AS (
      SELECT l_returnflag, l_quantity, cnt,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY cnt DESC, l_quantity) AS rn
      FROM counts
    )
    SELECT l_returnflag, round(l_quantity, 2) AS mode_quantity,
           cnt AS n_occurrences
    FROM ranked WHERE rn = 1 ORDER BY l_returnflag
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: per-group mode with a DETERMINISTIC smallest-value tiebreak —
    built-in `mode()` leaves ties engine-defined, so both sides spell out
    count → row_number explicitly. The count aggregation partial-aggregates
    map-side; the window runs over the already-tiny (group, value) table."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("cnt"), "l_quantity")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.round("l_quantity", 2).alias("mode_quantity"),
            F.col("cnt").alias("n_occurrences"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_filtered",
    oracle="""
    SELECT o_orderpriority,
           count(*)                                            AS n_all,
           count(*) FILTER (WHERE o_orderstatus = 'F')         AS n_finished,
           count(*) FILTER (WHERE o_totalprice > 100000)       AS n_large,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2)
             AS open_value,
           round(avg(o_totalprice) FILTER (WHERE o_totalprice > 100000), 4)
             AS avg_large
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family: FILTER-clause aggregates (conditional aggregation) — one
    scan computing several differently-filtered aggregates at once, instead
    of N filtered scans unioned back. DataFrame side expresses each FILTER
    as agg-over-`when` (NULLs don't count/sum/average), the standard
    Spark idiom with identical semantics."""
    o = load_table(spark, sf_dir, "orders")
    finished = F.when(F.col("o_orderstatus") == "F", 1)
    large = F.col("o_totalprice") > 100000
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_all"),
            F.count(finished).alias("n_finished"),
            F.count(F.when(large, 1)).alias("n_large"),
            F.round(
                F.sum(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))), 2
            ).alias("open_value"),
            F.round(F.avg(F.when(large, F.col("o_totalprice"))), 4).alias("avg_large"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH ordered AS (
      SELECT l_returnflag, l_extendedprice, l_quantity,
             sum(l_quantity) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
             sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
      FROM lineitem
    )
    SELECT l_returnflag, round(min(l_extendedprice), 2) AS weighted_median_price
    FROM ordered WHERE cw >= tw / 2
    GROUP BY 1 ORDER BY 1
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (lower weighted median: the smallest value whose
    cumulative weight reaches half the group total) — not a Spark builtin;
    expressed as cumulative-weight window + min-over-qualifying, the
    one-shuffle formulation (the naive alternative sorts and collects per
    group). The explicit (price, orderkey, linenumber) ordering makes the
    cumulative walk deterministic under price ties in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = Window.partitionBy("l_returnflag")
    return (
        li.select(
            "l_returnflag",
            "l_extendedprice",
            F.sum("l_quantity").over(cum).alias("cw"),
            F.sum("l_quantity").over(total).alias("tw"),
        )
        .where(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(F.round(F.min("l_extendedprice"), 2).alias("weighted_median_price"))
        .orderBy("l_returnflag")
    )


@query(
    "agg_bool_family",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000)  AS all_above_1k,
           bool_or(o_totalprice > 400000) AS any_above_400k,
           bool_and(o_orderstatus <> 'X') AS none_invalid
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def agg_bool_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family: boolean aggregates (bool_and/bool_or — SQL EVERY/ANY) —
    the data-quality assertion primitives (\"every row satisfies X\"),
    map-side combining like any hash agg."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_above_1k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_above_400k"),
            F.bool_and(F.col("o_orderstatus") != "X").alias("none_invalid"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "set_except_intersect_all",
    oracle="""
    WITH bag AS (
      SELECT l_returnflag, CAST(l_quantity AS INTEGER) AS qty
      FROM lineitem WHERE l_orderkey <= 2000
      EXCEPT ALL
      SELECT l_returnflag, CAST(l_quantity AS INTEGER) AS qty
      FROM lineitem WHERE l_orderkey <= 1000
    )
    SELECT l_returnflag, qty, count(*) AS multiplicity
    FROM bag GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def set_except_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 bag-semantics variant: EXCEPT ALL (multiset difference —
    duplicates subtract by multiplicity, unlike the set-semantics `except`
    that collapses them). Summarized as (value, multiplicity) so the
    comparison is order-insensitive."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("int").alias("qty"), "l_orderkey"
    )
    big = li.where(F.col("l_orderkey") <= 2000).drop("l_orderkey")
    small = li.where(F.col("l_orderkey") <= 1000).drop("l_orderkey")
    return (
        big.exceptAll(small)
        .groupBy("l_returnflag", "qty")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
        .orderBy("l_returnflag", "qty")
    )


@query(
    "agg_skew_kurtosis",
    oracle="""
    SELECT l_returnflag,
           round(skewness(l_extendedprice)
                 * (count(*) - 2) / sqrt(count(*) * (count(*) - 1.0)), 4)
             AS skew,
           round(kurtosis_pop(l_extendedprice), 6) AS kurt
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: higher-moment shape statistics. Spark's kurtosis is the
    POPULATION excess kurtosis, so the oracle must call DuckDB's
    `kurtosis_pop` — the default `kurtosis` applies sample-bias correction
    and differs in the 6th decimal at this group size (a formula mismatch,
    not noise). Skewness has no _pop variant in DuckDB, so the oracle
    de-biases it explicitly: population g1 = sample G1 · (n-2)/√(n(n-1))
    with n = count(*) — formula-exact parity at any rounding precision
    (previously the O(1/n) sample-vs-population gap was merely absorbed by
    4-decimal rounding, a boundary flip waiting for a testdata
    regeneration)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.skewness("l_extendedprice"), 4).alias("skew"),
            F.round(F.kurtosis("l_extendedprice"), 6).alias("kurt"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_entropy_gini",
    oracle="""
    WITH cnt AS (
      SELECT CAST(user_id % 10 AS INTEGER) AS cohort, event_type, count(*) AS c
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT cohort, sum(c) AS t FROM cnt GROUP BY 1
    )
    SELECT cnt.cohort,
           round(-sum((c / t) * ln(c / t)), 6) AS shannon_entropy,
           round(1 - sum((c / t) * (c / t)), 6) AS gini_impurity,
           count(*) AS n_classes
    FROM cnt JOIN tot USING (cohort)
    GROUP BY cnt.cohort ORDER BY cnt.cohort
    """,
)
def agg_entropy_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shape profiling per cohort: Shannon entropy and Gini
    impurity of the event-type mix — the class-balance diagnostics a
    dataset-mixture report runs (text_word_entropy is the per-document
    analog; this is the per-partition one). Two count aggregations over the
    same key; the class-count table is tiny so its totals broadcast."""
    e = load_table(spark, sf_dir, "events")
    cnt = e.groupBy(
        (F.col("user_id") % 10).cast("int").alias("cohort"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("cohort").agg(F.sum("c").alias("t"))
    p = F.col("c") / F.col("t")
    return (
        cnt.join(F.broadcast(tot), "cohort")
        .groupBy("cohort")
        .agg(
            F.round(-F.sum(p * F.log(p)), 6).alias("shannon_entropy"),
            F.round(1 - F.sum(p * p), 6).alias("gini_impurity"),
            F.count(F.lit(1)).alias("n_classes"),
        )
        .orderBy("cohort")
    )


@query(
    "join_salted_skew",
    oracle="""
    WITH dim AS (
      SELECT CAST(range AS BIGINT) AS jk,
             CAST((range * 7 % 13) / 10.0 AS DOUBLE) AS weight
      FROM range(100)
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(l_quantity * weight), 2) AS weighted_qty
    FROM (SELECT l_returnflag, l_quantity, l_orderkey % 100 AS jk FROM lineitem) f
    JOIN dim USING (jk)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join (scale.py::salted_join) driven under the oracle:
    the fact side joins a 100-key derived dimension through the salting
    path — per-row deterministic salt on the skewed side, ×num_salts
    replication of the dim side — and the result must be BYTE-IDENTICAL to
    the plain join the oracle runs, because salting is a physical-plan
    lever, never a semantic one.

    100 TB shape: this is the pathological-hot-key escape hatch when AQE's
    skew-join splitting isn't enough (null-heavy FKs, celebrity keys). The
    salt fans one hot key's rows across num_salts shuffle partitions; the
    replicated side grows by ×num_salts only on the SMALL side. Cited:
    SURVEY §2.3 J3 context."""
    from lakehouses_spark.scale import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", (F.col("l_orderkey") % 100).alias("jk")
    )
    dim = spark.range(100).select(
        F.col("id").alias("jk"),
        ((F.col("id") * 7 % 13) / 10.0).cast("double").alias("weight"),
    )
    joined = salted_join(li, dim, on="jk", num_salts=8)
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity") * F.col("weight")), 2).alias(
                "weighted_qty"
            ),
        )
        .orderBy("l_returnflag")
    )


_NOT_IN_NULL_SQL = """
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM orders
       WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                               WHERE c_acctbal < 0)) AS not_in_clean,
      (SELECT CAST(count(*) AS BIGINT) FROM orders
       WHERE o_custkey NOT IN (SELECT CASE WHEN c_custkey =
                                      (SELECT min(c_custkey) FROM customer
                                       WHERE c_acctbal < 0)
                                           THEN NULL ELSE c_custkey END
                               FROM customer WHERE c_acctbal < 0)) AS not_in_nullable,
      (SELECT CAST(count(*) AS BIGINT) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_custkey = o.o_custkey
                           AND c.c_acctbal < 0)) AS not_exists
"""


@query("subquery_not_in_null_trap", oracle=_NOT_IN_NULL_SQL)
def subquery_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, pinned across engines: `x NOT IN (subquery)`
    under ANSI three-valued logic returns UNKNOWN (filters everything out)
    the moment the subquery can yield a NULL, while the NOT EXISTS
    spelling is null-immune. All three formulations run in both engines —
    the null-free NOT IN and NOT EXISTS counts must agree, and the
    nullable NOT IN must collapse to 0 identically in Spark and DuckDB
    (the CASE nulls exactly ONE subquery row — a single NULL in the list
    turns every non-member's predicate UNKNOWN and empties the result).

    100 TB relevance: Catalyst plans NOT IN as a null-aware anti join,
    which degenerates to a broadcast nested-loop when the subquery side is
    nullable — the null-immune NOT EXISTS / anti-join spelling is the one
    that scales, and this query documents WHY as an executable check."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_NOT_IN_NULL_SQL)


# ---------------------------------------------------------------------------
# Runtime-filter / co-location techniques (J-series extensions): the two
# standard mechanisms for taming fact-table joins at 100 TB beyond broadcast
# and salting — a Bloom-filter semi-join reduction and a bucketed
# (pre-shuffled) co-located join. Both are physical-plan levers: the oracle
# runs the plain join, and the results must match exactly.
# ---------------------------------------------------------------------------
@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction, built entirely from DataFrame ops
    (Spark's internal ``bloom_filter_agg`` runtime filter is not SQL-exposed,
    so the bitmap is constructed the declarative way): explode each dim key
    into K=3 hash positions (``xxhash64(key, i) mod m``), ``bit_or`` the
    per-64-bit-word masks, densify against ``spark.range(m/64)``, and collect
    the whole filter into ONE broadcastable row holding a 2048-long array
    (~16 KiB). The fact side then drops non-matching rows in a pure
    projection — no shuffle, no join — before the exact join runs on the
    surviving ~20%.

    100 TB shape: this is the semi-join-reduction pattern for dims too large
    to broadcast as a hash relation but whose KEY SET fits a Bloom bitmap —
    a 100M-key dim needs a ~170 MB exact broadcast but only a ~120 MB bloom
    at 1% FP, and the bitmap build is a tiny integer shuffle (m/64 words)
    regardless of dim size. False positives only cost wasted probe rows; the
    exact join downstream restores precision, which is why the oracle is the
    plain join. Cited: SURVEY §2.3 J-series context; Bloom-join is classic
    public literature (Bloom 1970; Mackert & Lohman, VLDB'86)."""
    from lakehouses_spark.scale import bloom_bitmap, bloom_prefilter

    dim = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    bitmap = bloom_bitmap(dim, "c_custkey")
    fact = load_table(spark, sf_dir, "orders")
    prefiltered = bloom_prefilter(fact, "o_custkey", bitmap)
    return (
        prefiltered.join(
            dim.select("c_custkey"),
            prefiltered["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-fact join: both sides are written ONCE as
    16-bucket tables hashed on the join key (``bucketBy(16, key).sortBy``),
    after which every join on that key reads bucket i against bucket i with
    NO exchange on either side — the shuffle is paid at write time, amortized
    over every subsequent join/aggregation on the key.

    100 TB shape: the standard answer when TWO fact tables join repeatedly on
    the same key and neither broadcasts — nightly orders⋈customer,
    clicks⋈sessions. Bucket-pruned, sort-merge-ready scans replace a
    petabyte-scale shuffle per query. The no-Exchange property is pinned by
    tests/test_plans.py (with auto-broadcast disabled so the demo does not
    silently degrade to a broadcast at toy scale); THIS query checks value
    parity against the plain-join oracle. Buckets land in a DETERMINISTIC
    per-(sf_dir, session) location and the catalog names carry the same
    suffix, so repeated driver runs overwrite in place instead of leaking a
    new temp dir per call, and concurrent sessions on different sf_dirs
    don't race on shared table names."""
    import hashlib
    import tempfile

    from lakehouses_spark.scale import write_bucketed

    tag = hashlib.sha256(
        f"{sf_dir}|{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:12]
    tmp = Path(tempfile.gettempdir()) / f"lh_bucketed_{tag}"
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    for name, df, key, sub in (
        (f"lh_tmp_bucketed_orders_{tag}", orders, "o_custkey", "orders"),
        (f"lh_tmp_bucketed_customer_{tag}", customer, "c_custkey", "customer"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        sub_dir = tmp / sub
        if sub_dir.exists():
            shutil.rmtree(sub_dir)
        write_bucketed(df, name, key, num_buckets=16, path=str(sub_dir))
    bo = spark.table(f"lh_tmp_bucketed_orders_{tag}")
    bc = spark.table(f"lh_tmp_bucketed_customer_{tag}")
    return (
        bo.join(bc, bo["o_custkey"] == bc["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )
