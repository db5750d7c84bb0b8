"""Scalar function families (SURVEY §2.8 F1-F11) + struct expansion (P4/P8).

Everything stays JVM-side in whole-stage codegen — no Python UDFs in any of
these paths (the reference's `parse_title` UDF X1 is re-expressed with
built-in split/regexp in silver.py; see lakehouses_spark/medallion.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouses_spark.io import load_table
from lakehouses_spark.registry import query


@query(
    "fn_string_family",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment)                          AS seg_upper,
           lower(c_name)                                AS name_lower,
           length(c_name)                               AS name_len,
           substring(c_name, 10, 9)                     AS digits,
           concat(c_name, ':', c_mktsegment)            AS name_seg,
           replace(c_name, 'Customer#', '')             AS bare_id,
           ltrim(c_name, 'Customer#0')                  AS trimmed,
           CAST(regexp_extract(c_name, '([1-9][0-9]*)$', 1) AS VARCHAR) AS key_digits
    FROM customer
    WHERE c_custkey % 37 = 0
    ORDER BY c_custkey
    """,
)
def fn_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F5: upper/lower/length/substring/concat/replace/trim/regexp_extract
    (05.movielens/02.movielens-silver.py:137-139, 02…/05…[imagenes].py:48-50,
    02…/03…v2 [json].py:115)."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") % 37 == 0)
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 10, 9).alias("digits"),
        F.concat(F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("name_seg"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("")).alias("bare_id"),
        F.ltrim(F.col("c_name"), F.lit("Customer#0")).alias("trimmed"),
        F.regexp_extract("c_name", r"([1-9][0-9]*)$", 1).cast("string").alias("key_digits"),
    ).orderBy("c_custkey")


@query(
    "fn_date_family",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate)  AS INTEGER)                       AS order_year,
           CAST(month(o_orderdate) AS INTEGER)                       AS order_month,
           CAST(day(o_orderdate)   AS INTEGER)                       AS order_day,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT)
             AS days_to_2002,
           CAST(epoch(o_orderdate) AS BIGINT)                        AS epoch_s,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date
    FROM orders
    WHERE o_orderkey % 97 = 0
    ORDER BY o_orderkey
    """,
)
def fn_date_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: year/month/day, date_trunc, datediff, epoch, date arithmetic
    (03.iceberg_primer.py:124,151-153,283; 05.movielens/02…-silver.py:173-178)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 97 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_2002"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("epoch_s"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
    ).orderBy("o_orderkey")


@query(
    "fn_array_family",
    oracle="""
    SELECT p_partkey,
           string_split(p_name, ' ')[1]                       AS first_word,
           string_split(p_name, ' ')[-1]                      AS last_word,
           CAST(len(string_split(p_name, ' ')) AS INTEGER)    AS n_words,
           list_contains(string_split(p_name, ' '), 'widget') AS has_widget,
           array_to_string(list_sort(string_split(p_name, ' ')), '_') AS sorted_words
    FROM part
    WHERE p_partkey % 13 = 0
    ORDER BY p_partkey
    """,
)
def fn_array_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/P8: split→array, element access, size, array_contains, array_sort
    (05.movielens/02.movielens-silver.py:137-139,274)."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") % 13 == 0)
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.size(words).cast("int").alias("n_words"),
        F.array_contains(words, "widget").alias("has_widget"),
        F.array_join(F.array_sort(words), "_").alias("sorted_words"),
    ).orderBy("p_partkey")


@query(
    "fn_json_family",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_value
    FROM events
    WHERE event_id % 41 = 0
    ORDER BY event_id
    """,
)
def fn_json_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: JSON extraction from string payloads (from_json over Kafka values,
    03…/02…[json].py:117-128). get_json_object is the scan-friendly
    single-field path; from_json the full-schema path — both shown."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 41 == 0)
    parsed = F.from_json(F.col("props"), "k INT")
    return e.select(
        "event_id",
        parsed.getField("k").cast("int").alias("k_value"),
        F.get_json_object("props", "$.missing").alias("missing_value"),
    ).orderBy("event_id")


@query(
    "fn_struct_expand",
    oracle="""
    SELECT o_orderkey, o_orderstatus AS status, round(o_totalprice, 2) AS price
    FROM orders
    WHERE o_orderkey % 61 = 0
    ORDER BY o_orderkey
    """,
)
def fn_struct_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: pack into a struct then expand with `col.*` — the Kafka
    value-unwrap pattern (03…/02…[json].py:130 `select("*", "value.*")`)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 61 == 0)
    packed = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.round("o_totalprice", 2).alias("price"),
        ).alias("payload"),
    )
    return packed.select("o_orderkey", "payload.*").orderBy("o_orderkey")


@query(
    "fn_map_family",
    oracle="""
    SELECT s_suppkey,
           map(['name', 'nation'], [s_name, CAST(s_nationkey AS VARCHAR)])['name'][1]  AS m_name,
           CAST(2 AS INTEGER) AS n_keys
    FROM supplier
    ORDER BY s_suppkey
    """,
)
def fn_map_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: map construction + element_at + cardinality."""
    s = load_table(spark, sf_dir, "supplier")
    m = F.create_map(
        F.lit("name"), F.col("s_name"),
        F.lit("nation"), F.col("s_nationkey").cast("string"),
    )
    return s.select(
        "s_suppkey",
        F.element_at(m, "name").alias("m_name"),
        F.size(m).cast("int").alias("n_keys"),
    ).orderBy("s_suppkey")


@query(
    "fn_math_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey % 7 AS BIGINT)                      AS key_mod,
           round(abs(l_discount - 0.05), 4)                    AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT)                    AS qty_ceil,
           CAST(floor(l_extendedprice / 1000) AS BIGINT)       AS price_bucket,
           round(sqrt(l_quantity), 4)                          AS qty_sqrt,
           round(ln(l_extendedprice + 1), 4)                   AS log_price,
           round(power(l_tax + 1, 2), 6)                       AS tax_sq,
           CASE WHEN l_quantity > 25 THEN 'bulk'
                WHEN l_quantity > 10 THEN 'mid'
                ELSE 'small' END                               AS qty_class,
           coalesce(nullif(l_returnflag, 'N'), 'none')         AS flag_or_none
    FROM lineitem
    WHERE l_orderkey % 199 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 + conditionals: modulo/abs/ceil/floor/sqrt/ln/power, CASE WHEN,
    coalesce/nullif (01.parquet_primer.py:29, 03.iceberg_primer.py:183-185)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 199 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_bucket"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("log_price"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("tax_sq"),
        F.when(F.col("l_quantity") > 25, "bulk")
        .when(F.col("l_quantity") > 10, "mid")
        .otherwise("small")
        .alias("qty_class"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "fn_cast_family",
    oracle="""
    SELECT c_custkey,
           CAST(floor(c_acctbal) AS BIGINT)     AS bal_floor,
           CAST(c_custkey AS VARCHAR)           AS key_str,
           CAST(c_nationkey AS DOUBLE)          AS nation_dbl,
           CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS key_roundtrip
    FROM customer
    WHERE c_custkey % 29 = 0
    ORDER BY c_custkey
    """,
)
def fn_cast_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: cast matrix (binary→string casts appear in the Kafka path; here
    the numeric/string lattice). double→int uses explicit floor() because
    Spark truncates while DuckDB rounds — the engine pins the semantics."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") % 29 == 0)
    return c.select(
        "c_custkey",
        F.floor("c_acctbal").cast("bigint").alias("bal_floor"),
        F.col("c_custkey").cast("string").alias("key_str"),
        F.col("c_nationkey").cast("double").alias("nation_dbl"),
        F.col("c_custkey").cast("string").cast("bigint").alias("key_roundtrip"),
    ).orderBy("c_custkey")


@query(
    "fn_variant_family",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.missing') AS INTEGER) AS missing_int,
           CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_mod
    FROM events
    WHERE event_id % 37 = 0
    ORDER BY event_id
    """,
)
def fn_variant_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schemaless JSON via the VARIANT type (Spark 4): parse_json once into
    an open-schema variant, then typed extractions with try_variant_get —
    the modern complement to fn_json_family's fixed-schema from_json.

    At scale this is the semi-structured-column story: the variant binary
    encoding is parsed once at ingest (not re-parsed per extraction like
    get_json_object on strings), shredded extractions stay JVM-side, and
    try_variant_get degrades missing paths / cast failures to NULL instead
    of failing the job — exactly the posture a 100 TB ingest of
    heterogeneous event payloads needs. The DuckDB oracle computes the
    same typed extractions with its JSON functions."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 37 == 0)
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    return e.select(
        "event_id",
        k.alias("k_int"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_int"),
        (k % 10).alias("k_mod"),
    ).orderBy("event_id")


@query(
    "fn_bitwise_family",
    oracle="""
    SELECT CAST(o_orderkey % 8 AS INTEGER) AS grp,
           bit_and(o_orderkey & 1023)      AS all_low_bits,
           bit_or(o_orderkey >> 2)         AS any_shifted,
           bit_xor(xor(o_orderkey, 255))   AS parity_mix,
           CAST(sum(bit_count(o_orderkey)) AS BIGINT) AS total_pop,
           max(o_orderkey << 3)            AS max_shl
    FROM orders WHERE o_orderkey <= 2048
    GROUP BY 1 ORDER BY 1
    """,
)
def fn_bitwise_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: bitwise scalar ops (& | ^ << >> bit_count) composed inside
    the bitwise aggregates (bit_and / bit_or / bit_xor) — all integer math,
    bit-identical across engines, whole-stage-codegen'd."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2048)
    return (
        o.groupBy((F.col("o_orderkey") % 8).cast("int").alias("grp"))
        .agg(
            F.bit_and(F.expr("o_orderkey & 1023")).alias("all_low_bits"),
            F.bit_or(F.expr("shiftright(o_orderkey, 2)")).alias("any_shifted"),
            F.bit_xor(F.expr("o_orderkey ^ 255")).alias("parity_mix"),
            F.sum(F.bit_count("o_orderkey")).alias("total_pop"),
            F.max(F.expr("shiftleft(o_orderkey, 3)")).alias("max_shl"),
        )
        .orderBy("grp")
    )


@query(
    "fn_url_family",
    oracle=r"""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&n=' || n_chars AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1)            AS protocol,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1)       AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\?(.*)$', 1)                 AS query,
           regexp_extract(url, '[?&]lang=([^&]*)', 1)        AS lang_param
    FROM urls ORDER BY doc_id
    """,
)
def fn_url_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: URL decomposition via `parse_url` (protocol / host / path /
    query / single query-param) — the canonicalization primitive every
    web-scraped-corpus pipeline runs before URL-level dedup. The oracle
    decomposes the same synthesized URLs with regexes, so Spark's dedicated
    parser is cross-checked against a spec-by-regex."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id"), F.lit("?lang="), F.col("lang"),
        F.lit("&n="), F.col("n_chars"),
    )
    u = d.select("doc_id", url.alias("url"))
    return (
        u.select(
            "doc_id",
            F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY")).alias("query"),
            F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        )
        .orderBy("doc_id")
    )


@query(
    "agg_string_agg",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
             AS priorities,
           count(DISTINCT o_orderpriority) AS n_priorities
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family: ordered string aggregation (listagg/string_agg) — expressed
    as collect_set → array_sort → array_join so the concatenation order is
    deterministic regardless of partitioning (a bare collect_list would be
    partition-order-dependent and fail the determinism sweep)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), "|"
            ).alias("priorities"),
            F.count_distinct("o_orderpriority").alias("n_priorities"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "fn_conv_family",
    oracle="""
    SELECT o_orderkey,
           upper(to_hex(o_orderkey)) AS hex_key,
           to_base(o_orderkey, 2)    AS bin_key,
           to_base(o_orderkey, 8)    AS oct_key
    FROM orders WHERE o_orderkey <= 64 ORDER BY o_orderkey
    """,
)
def fn_conv_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: radix conversion (hex / binary / octal rendering of keys —
    the id-encoding ops behind shard prefixes and content-hash paths).
    Spark `hex`/`conv` vs DuckDB `to_hex`/`to_base`."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 64)
    return (
        o.select(
            "o_orderkey",
            F.hex("o_orderkey").alias("hex_key"),
            F.conv("o_orderkey", 10, 2).alias("bin_key"),
            F.conv("o_orderkey", 10, 8).alias("oct_key"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "fn_encode_family",
    oracle="""
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 24))) AS b64,
           decode(from_base64(to_base64(encode(substr(text, 1, 24)))))
             = substr(text, 1, 24) AS roundtrip_ok
    FROM documents WHERE doc_id < 50 ORDER BY doc_id
    """,
)
def fn_encode_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: binary text encoding (base64/unbase64 over string↔binary
    casts) — the wire-encoding ops under every Kafka/Avro payload path
    (functions/avro.py decodes exactly this shape)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    prefix = F.substring("text", 1, 24).cast("binary")
    return (
        d.select(
            "doc_id",
            F.base64(prefix).alias("b64"),
            (F.unbase64(F.base64(prefix)) == prefix).alias("roundtrip_ok"),
        )
        .orderBy("doc_id")
    )


@query(
    "fn_levenshtein_family",
    oracle="""
    SELECT c_custkey,
           levenshtein(c_name, 'Customer#000000001') AS dist_to_first,
           levenshtein(upper(c_mktsegment), 'BUILDING') AS dist_seg
    FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey
    """,
)
def fn_levenshtein_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: edit distance (levenshtein) — the fuzzy-string primitive
    under entity resolution and typo-tolerant matching; integer output,
    bit-identical across engines."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 100)
    return (
        c.select(
            "c_custkey",
            F.levenshtein("c_name", F.lit("Customer#000000001")).alias(
                "dist_to_first"
            ),
            F.levenshtein(F.upper("c_mktsegment"), F.lit("BUILDING")).alias(
                "dist_seg"
            ),
        )
        .orderBy("c_custkey")
    )


@query(
    "fn_hash_family",
    oracle="""
    SELECT doc_id,
           md5(text)         AS md5_hex,
           sha256(text)      AS sha256_hex,
           length(md5(text)) AS md5_len
    FROM documents WHERE doc_id < 50 ORDER BY doc_id
    """,
)
def fn_hash_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: cryptographic content digests (md5 / sha-256 hex) — the
    primitive under exact dedup (`dedup_exact` shuffles exactly these) and
    `sample_hash_split`'s engine-independent bucketing. Byte-exact across
    engines: same algorithm, same lowercase-hex rendering."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return (
        d.select(
            "doc_id",
            F.md5("text").alias("md5_hex"),
            F.sha2("text", 256).alias("sha256_hex"),
            F.length(F.md5("text")).alias("md5_len"),
        )
        .orderBy("doc_id")
    )


@query(
    "fn_trig_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sin(l_quantity / 10.0), 6)                    AS sin_q,
           round(cos(l_quantity / 10.0), 6)                    AS cos_q,
           round(tan(l_discount), 6)                           AS tan_d,
           round(atan2(l_quantity, l_extendedprice / 1000), 6) AS atan2_qp,
           round(asin(l_discount * 2), 6)                      AS asin_d,
           round(degrees(atan(l_tax)), 6)                      AS atan_deg,
           round(exp(l_discount), 6)                           AS exp_d,
           round(log10(l_extendedprice + 1), 6)                AS log10_p,
           round(log2(l_quantity + 1), 6)                      AS log2_q,
           round(cbrt(l_extendedprice), 6)                     AS cbrt_p,
           round((exp(l_discount) - exp(-l_discount)) / 2, 6)  AS sinh_d,
           round((exp(l_tax) + exp(-l_tax)) / 2, 6)            AS cosh_t
    FROM lineitem
    WHERE l_orderkey % 211 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_trig_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 extension: the trigonometric/exponential scalar surface
    (sin/cos/tan/atan2/asin/atan+degrees, exp/log10/log2/cbrt, sinh/cosh) —
    the math layer under positional encodings, geo features and periodic
    seasonality features. All JVM-side codegen'd expressions on a pruned
    scan; both engines round to 6 decimals (libm implementations agree to
    ~1 ulp, 1e-6 is 9 orders of margin). DuckDB has no sinh/cosh, so the
    oracle spells them as (e^x ∓ e^-x)/2 — exact same quantity."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 211 == 0)
    q10 = F.col("l_quantity") / 10.0
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin(q10), 6).alias("sin_q"),
        F.round(F.cos(q10), 6).alias("cos_q"),
        F.round(F.tan("l_discount"), 6).alias("tan_d"),
        F.round(
            F.atan2(F.col("l_quantity"), F.col("l_extendedprice") / 1000), 6
        ).alias("atan2_qp"),
        F.round(F.asin(F.col("l_discount") * 2), 6).alias("asin_d"),
        F.round(F.degrees(F.atan("l_tax")), 6).alias("atan_deg"),
        F.round(F.exp("l_discount"), 6).alias("exp_d"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("log10_p"),
        F.round(F.log2(F.col("l_quantity") + 1), 6).alias("log2_q"),
        F.round(F.cbrt("l_extendedprice"), 6).alias("cbrt_p"),
        F.round(F.sinh("l_discount"), 6).alias("sinh_d"),
        F.round(F.cosh("l_tax"), 6).alias("cosh_t"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "fn_regexp_family",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1)                    AS first_word,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2)           AS second_word,
           len(regexp_extract_all(text, 'table'))                 AS n_table,
           len(regexp_extract_all(text, '[a-z]+a[a-z]*'))         AS n_with_a,
           regexp_matches(text, 'spark')                          AS has_spark,
           regexp_replace(text, 'value', 'VAL', 'g')              AS replaced,
           len(string_split_regex(text, '(table|spark)')) - 1     AS n_splits
    FROM documents
    WHERE doc_id % 7 = 0
    ORDER BY doc_id
    """,
)
def fn_regexp_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: the regexp surface (extract with group index, count via
    extract_all length, boolean match, global replace, split count) — the
    workhorse layer under PII scrubbing, boilerplate stripping and
    tokenizer pre-splitting. Patterns are kept to the POSIX-safe subset
    (character classes, alternation, literal words) where Java regex
    (Spark) and RE2 (DuckDB) agree by construction — no lookarounds or
    backreferences, which the two dialects treat differently.

    100 TB shape: every expression is JVM-side codegen (no Python), scan
    prunes to (doc_id, text), predicate pushed down."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.size(F.expr("regexp_extract_all(text, 'table', 0)")).cast("long").alias(
            "n_table"
        ),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+a[a-z]*', 0)"))
        .cast("long")
        .alias("n_with_a"),
        F.col("text").rlike("spark").alias("has_spark"),
        F.regexp_replace("text", "value", "VAL").alias("replaced"),
        (F.size(F.split(F.col("text"), r"(table|spark)")) - 1)
        .cast("long")
        .alias("n_splits"),
    ).orderBy("doc_id")


@query(
    "fn_interval_family",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
             AS plus_3_months,
           last_day(CAST(o_orderdate AS DATE))          AS month_end,
           CAST(quarter(o_orderdate) AS INTEGER)        AS qtr,
           CAST(weekofyear(o_orderdate) AS INTEGER)     AS iso_week,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER)  AS dow_sun1,
           CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE)
             AS week_start,
           CAST(CAST(o_orderdate AS DATE)
                + to_days(CAST((7 - isodow(o_orderdate)) % 7 + 1 AS INTEGER))
             AS DATE)                                   AS next_monday
    FROM orders
    WHERE o_orderkey % 131 = 0
    ORDER BY o_orderkey
    """,
)
def fn_interval_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 extension: calendar-interval arithmetic — add_months (with the
    end-of-month clamp both engines share: Jan 31 + 1 month = Feb 29),
    last_day, quarter, ISO week, day-of-week, Monday week truncation, and
    next_day. Engine pinning notes: Spark dayofweek is Sunday=1 while
    DuckDB's is Sunday=0 (oracle adds 1); Spark next_day('Mon') is
    STRICTLY after, which the oracle spells as +((7-isodow)%7+1) days.
    All JVM codegen on a pruned scan — the calendar-feature layer under
    seasonality models and date-partitioned layouts."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 131 == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus_3_months"),
        F.last_day(d).alias("month_end"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        F.dayofweek("o_orderdate").cast("int").alias("dow_sun1"),
        F.trunc(d, "week").alias("week_start"),
        F.next_day(d, "Mon").alias("next_monday"),
    ).orderBy("o_orderkey")


@query(
    "fn_pad_family",
    oracle="""
    SELECT p_partkey,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0')  AS key_zeropad,
           rpad(p_brand, 12, '.')                     AS brand_pad,
           repeat('-', CAST(p_size % 5 AS INTEGER))   AS size_rule,
           reverse(p_brand)                           AS brand_rev,
           split_part(p_type, ' ', 1)                 AS type_head,
           translate(p_brand, '#', '_')               AS brand_us,
           left(p_name, 8)                            AS name_head,
           right(p_name, 6)                           AS name_tail,
           upper(p_type[1]) || lower(p_type[2:]) AS type_title
    FROM part
    WHERE p_partkey % 53 = 0
    ORDER BY p_partkey
    """,
)
def fn_pad_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: padding/format string surface — lpad zero-padding (the
    fixed-width key formatter under filename/partition layouts), rpad,
    repeat, reverse, split_part, translate, left/right slicing, and
    initcap-style title case (emulated in the oracle as upper(head) ||
    lower(tail) since DuckDB has no initcap). All JVM codegen on a pruned
    scan of `part`."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") % 53 == 0)
    seg = F.col("p_type")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_zeropad"),
        F.rpad("p_brand", 12, ".").alias("brand_pad"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5).cast("int")).alias("size_rule"),
        F.reverse("p_brand").alias("brand_rev"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.translate("p_brand", "#", "_").alias("brand_us"),
        F.substring("p_name", 1, 8).alias("name_head"),
        F.col("p_name").substr(F.length("p_name") - 5, F.lit(6)).alias("name_tail"),
        F.concat(
            F.upper(F.substring(seg, 1, 1)), F.lower(F.substring(seg, 2, 1000))
        ).alias("type_title"),
    ).orderBy("p_partkey")
