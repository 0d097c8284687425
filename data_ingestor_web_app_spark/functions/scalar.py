"""Scalar function families (SURVEY §2B "Scalar functions").

One query per family, each exercising the whole family end-to-end over a
fixture table. Everything is `pyspark.sql.functions` — JVM-side, inside
whole-stage codegen; zero Python in these paths.

Cross-engine determinism notes (why some expressions look defensive):
- no per-row ROUND on money-like doubles (HALF_UP vs libm boundary flips);
  round only where values can't sit on a boundary (see fn_math);
- double→int casts go through FLOOR/CEIL explicitly: DuckDB CAST rounds,
  Spark truncates;
- hex is always lower()ed (Go %x parity — /root/reference/main.go:112);
- Spark dayofweek is 1=Sunday, DuckDB dayofweek is 0=Sunday — oracle adds 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           SPLIT_PART(c_name, '#', 2) AS key_digits,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS key_re,
           TRIM(CONCAT('  ', c_mktsegment, '  ')) AS seg_trim,
           CONCAT(c_mktsegment, ':', c_name) AS seg_name
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/lower/substr/length/replace/lpad/split_part/
    regexp_extract/trim/concat. split_part doubles as the reference's
    client-IP "host:port" splitter (main.go:268)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("key_digits"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("key_re"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  "))).alias("seg_trim"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("seg_name"),
    )


@query(
    "fn_hex",
    oracle="""
    SELECT doc_id,
           LOWER(HEX(SUBSTR(text, 1, 32))) AS payload_hex,
           DECODE(UNHEX(LOWER(HEX(SUBSTR(text, 1, 32))))) AS roundtrip,
           (DECODE(UNHEX(LOWER(HEX(SUBSTR(text, 1, 32))))) = SUBSTR(text, 1, 32)) AS roundtrip_ok
    FROM documents
    """,
)
def fn_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5 hex round-trip: lower(hex(payload)) → unhex → original. lower()
    matches Go's %x (main.go:112); Spark/DuckDB hex() are uppercase."""
    d = table(spark, sf_dir, "documents")
    payload = F.substring("text", 1, 32)
    h = F.lower(F.hex(payload))
    rt = F.decode(F.unhex(h), "UTF-8")
    return d.select(
        "doc_id",
        h.alias("payload_hex"),
        rt.alias("roundtrip"),
        (rt == payload).alias("roundtrip_ok"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate) AS yr,
           MONTH(o_orderdate) AS mon,
           QUARTER(o_orderdate) AS qtr,
           DAY(o_orderdate) AS dom,
           DAYOFWEEK(o_orderdate) + 1 AS dow,
           STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
           STRFTIME(LAST_DAY(o_orderdate), '%Y-%m-%d') AS month_end,
           DATEDIFF('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002,
           STRFTIME(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
           CAST(EPOCH(o_orderdate) AS BIGINT) AS unix_sec,
           STRFTIME(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS rfc3339
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family incl. the reference's UTC RFC3339 format (main.go:102).
    Session TZ is UTC so unix_timestamp == epoch seconds."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mon"),
        F.quarter(d).alias("qtr"),
        F.dayofmonth(d).alias("dom"),
        F.dayofweek(d).alias("dow"),  # 1=Sunday; DuckDB dow 0=Sunday → oracle +1
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), d).alias("days_to_2002"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus_30d"),
        F.unix_timestamp(d).alias("unix_sec"),
        F.concat(F.date_format(d, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z")).alias("rfc3339"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS abs_disc_delta,
           CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_ceil_k,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_floor_k,
           POWER(l_quantity, 2) AS qty_sq,
           SQRT(l_quantity) AS qty_sqrt,
           ROUND(LN(l_extendedprice), 6) AS ln_price,
           l_orderkey % 7 AS key_mod7,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           ROUND(l_quantity / 2, 0) AS half_qty
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. ROUND appears only where both engines agree: exact .5
    halves (both round half-away-from-zero for doubles) and ln rounded to
    6 places (ulp-level libm differences can't cross a 1e-6 boundary)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_delta"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_ceil_k"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_floor_k"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.round(F.col("l_quantity") / 2, 0).alias("half_qty"),
    )


@query(
    "fn_cond",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS size_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
           GREATEST(o_totalprice, 150000.0) AS at_least_150k,
           LEAST(o_totalprice, 150000.0) AS at_most_150k,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           (o_orderstatus = 'F' AND o_totalprice > 200000) AS is_big_final
    FROM orders
    """,
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE WHEN / coalesce / nullif / greatest / least /
    casts / boolean projection."""
    o = table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp >= 300000, "large").when(tp >= 100000, "medium").otherwise("small").alias("size_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias("status_or_open"),
        F.greatest(tp, F.lit(150000.0)).alias("at_least_150k"),
        F.least(tp, F.lit(150000.0)).alias("at_most_150k"),
        F.floor(tp).alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        ((F.col("o_orderstatus") == "F") & (tp > 200000)).alias("is_big_final"),
    )


@query(
    "fn_array",
    oracle="""
    WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS tokens FROM documents)
    SELECT doc_id,
           LEN(tokens) AS n_tokens,
           LIST_CONTAINS(tokens, 'spark') AS has_spark,
           tokens[1] AS first_token,
           tokens[-1] AS last_token,
           ARRAY_TO_STRING(LIST_SLICE(tokens, 1, 5), ' ') AS head5,
           ARRAY_TO_STRING(LIST_SLICE(LIST_SORT(tokens), 1, 3), ',') AS sorted3,
           LEN(LIST_DISTINCT(tokens)) AS n_distinct_tokens
    FROM t
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over tokenized text: size/contains/index/slice/sort/
    distinct. Arrays are emitted as joined strings (array hashing across
    engines is representation-sensitive)."""
    d = table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(tokens).alias("n_tokens"),
        F.array_contains(tokens, "spark").alias("has_spark"),
        F.element_at(tokens, 1).alias("first_token"),
        F.element_at(tokens, -1).alias("last_token"),
        F.array_join(F.slice(tokens, 1, 5), " ").alias("head5"),
        F.array_join(F.slice(F.sort_array(tokens), 1, 3), ",").alias("sorted3"),
        F.size(F.array_distinct(tokens)).alias("n_distinct_tokens"),
    )


@query(
    "fn_map_json",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_val,
           (JSON_EXTRACT(props, '$.k') IS NOT NULL) AS has_k,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 10 AS k_mod10
    FROM events
    """,
)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string parsing (events.props): get_json_object extraction —
    the dynamic/sparse-JSON side of the reference's LogEntry omitempty
    serialization (main.go:43-53)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select(
        "event_id",
        k.alias("k_val"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
        (k % 10).alias("k_mod10"),
    )


@query(
    "fn_try",
    oracle="""
    SELECT doc_id,
           TRY_CAST(SPLIT_PART(text, ' ', 1) AS BIGINT) AS first_tok_as_int,
           TRY_CAST(lang AS DOUBLE) AS lang_as_double,
           CAST(n_chars AS DOUBLE) / NULLIF(n_chars - n_chars, 0) IS NULL AS div0_is_null,
           COALESCE(TRY_CAST(SUBSTR(text, 1, 1) AS BIGINT), -1) AS first_char_int_or_neg1
    FROM documents
    """,
)
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe conversion family (the dirty-data reality of ingest
    pipelines): try_cast returns NULL instead of throwing on bad input;
    try_divide nulls out division by zero. The reference just logs and
    drops bad payloads (main.go:298-301) — this is the declarative twin."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).try_cast("long").alias("first_tok_as_int"),
        F.col("lang").try_cast("double").alias("lang_as_double"),
        F.try_divide(F.col("n_chars").cast("double"), F.col("n_chars") - F.col("n_chars")).isNull().alias("div0_is_null"),
        F.coalesce(F.substring("text", 1, 1).try_cast("long"), F.lit(-1)).alias("first_char_int_or_neg1"),
    )
