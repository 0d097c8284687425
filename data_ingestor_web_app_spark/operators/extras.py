"""Extended relational surface: pivot/unpivot, subqueries, skew-mitigation
(salted two-phase aggregation), nth_value windows, bitwise ops, sampling,
max_by/min_by. Registered alongside SURVEY §2B as engine completeness ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import register_views, scratch_dir, table
from data_ingestor_web_app_spark.registry import query


@query(
    "agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS spend_f,
           ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS spend_o,
           ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS spend_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): explicit value list so the plan is a single
    Expand+aggregate pass — never an unbounded distinct-values scan."""
    o = table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return p.select(
        "o_orderpriority",
        F.col("F").alias("spend_f"),
        F.col("O").alias("spend_o"),
        F.col("P").alias("spend_p"),
    )


@query(
    "agg_unpivot",
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               ROUND(SUM(l_discount), 2) AS sum_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM wide
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide→long) over an aggregated frame."""
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="metric",
        valueColumnName="val",
    )


_SCALAR_SUBQ = """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
"""


@query("subquery_scalar", oracle=_SCALAR_SUBQ)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery through the spark.sql entry point
    (Catalyst rewrites it to a broadcast of the single aggregate row)."""
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_SUBQ)


_CORR_SUBQ = """
    SELECT c.c_custkey, c.c_acctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(o.o_totalprice) / 100
                         FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@query("subquery_correlated", oracle=_CORR_SUBQ)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst de-correlates it into an
    aggregate + left join, so execution is a plain co-partitioned join, not
    a per-row re-execution."""
    register_views(spark, sf_dir)
    return spark.sql(_CORR_SUBQ)


@query(
    "agg_salted_twophase",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_rows, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew mitigation: two-phase salted aggregation over an extremely
    low-cardinality key (3 return flags — the worst case for a naive
    groupBy, where 3 reducers get everything).

    Phase 1 groups by (key, salt16) spreading each hot key over 16 tasks;
    phase 2 re-aggregates the 48 partials. Result is provably identical to
    the direct groupBy (count/sum are decomposable) — which is exactly what
    the oracle checks. At 100 TB this pattern (or AQE skew handling) is how
    hot keys stop being stragglers."""
    li = table(spark, sf_dir, "lineitem")
    salt = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(16)).alias("salt")
    phase1 = (
        li.select("l_returnflag", "l_quantity", salt)
        .groupBy("l_returnflag", "salt")
        .agg(F.count("*").alias("pc"), F.sum("l_quantity").alias("ps"))
    )
    return phase1.groupBy("l_returnflag").agg(
        F.sum("pc").alias("n_rows"),
        F.round(F.sum("ps"), 2).alias("sum_qty"),
    )


@query(
    "win_nth_value",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_key,
           LAST_VALUE(o_orderkey)  OVER w_full AS last_key
    FROM orders
    WINDOW
      w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_full AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/nth/last value windows; last_value gets the full-partition frame
    (the default frame would return the current row)."""
    o = table(spark, sf_dir, "orders").withColumn("od", F.col("o_orderdate").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("od", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy("od", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey,
           l_orderkey & 255 AS low_byte,
           l_orderkey | 16 AS with_bit4,
           XOR(l_orderkey, l_partkey) AS keys_xor,
           ~l_orderkey AS inverted,
           l_orderkey << 2 AS shl2,
           l_orderkey >> 1 AS shr1,
           BIT_COUNT(l_orderkey) AS popcount
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (&, |, xor, ~, shifts, popcount). Note DuckDB's ^ is
    POWER — the oracle must use XOR()."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        F.expr("l_orderkey & 255").alias("low_byte"),
        F.expr("l_orderkey | 16").alias("with_bit4"),
        F.expr("l_orderkey ^ l_partkey").alias("keys_xor"),
        F.expr("~l_orderkey").alias("inverted"),
        F.expr("shiftleft(l_orderkey, 2)").alias("shl2"),
        F.expr("shiftright(l_orderkey, 1)").alias("shr1"),
        F.bit_count("l_orderkey").alias("popcount"),
    )


@query(
    "scan_sample",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS fraction_within_5_sigma,
           TRUE AS sample_is_subset
    FROM lineitem
    """,
)
def scan_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sample with a fixed seed, pushed inside the scan (no
    materialization of the unsampled stream).

    Promoted from rows-only to hash-exact in r7 (the agg_approx_distinct
    pattern): WHICH rows a seeded engine sample keeps is engine-specific
    (Spark's XORShift vs DuckDB's), so the checked output is the operator
    plus its proof obligations — the sampled count sits within 5 binomial
    sigmas of fraction·N, and the sample is a true subset of the scan
    (anti-join residue 0). The row-level deterministic twin is
    scan_sample_hash (keyed md5 threshold), which IS cross-engine
    reproducible and row-hash-checked."""
    li = table(spark, sf_dir, "lineitem")
    samp = li.sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber")
    n_samp = samp.agg(F.count("*").alias("n_samp"))
    not_subset = samp.join(
        li.select("l_orderkey", "l_linenumber"),
        ["l_orderkey", "l_linenumber"],
        "left_anti",
    ).agg(F.count("*").alias("n_outside"))
    tot = li.agg(F.count("*").cast("long").alias("n_total"))
    sigma = F.sqrt(F.col("n_total") * 0.1 * 0.9)
    return (
        tot.crossJoin(F.broadcast(n_samp))
        .crossJoin(F.broadcast(not_subset))
        .select(
            "n_total",
            (
                F.abs(F.col("n_samp") - 0.1 * F.col("n_total")) <= 5 * sigma
            ).alias("fraction_within_5_sigma"),
            (F.col("n_outside") == 0).alias("sample_is_subset"),
        )
    )


@query(
    "scan_sample_hash",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE CAST(CONCAT('0x', SUBSTR(MD5(CAST(l_orderkey AS VARCHAR) || '|' ||
                                   CAST(l_linenumber AS VARCHAR)), 1, 8))
               AS BIGINT) < 429496729
    """,
)
def scan_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% Bernoulli sample by keyed hash — the
    cross-engine-reproducible twin of scan_sample: keep a row iff the top
    32 bits of md5(orderkey|linenumber) fall below 0.1 * 2^32. Unlike
    seeded engine sampling, the SAME rows survive in any engine, any
    partitioning, any day — which is what a training-data pipeline needs
    for resumable/auditable subsampling. Pure projection+filter inside the
    scan: no shuffle, no materialization of the unsampled stream."""
    li = table(spark, sf_dir, "lineitem")
    u32 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return li.where(u32 < 429496729).select("l_orderkey", "l_linenumber")


@query(
    "agg_minmax_by",
    oracle="""
    SELECT o_custkey,
           ARG_MAX(o_orderkey, o_totalprice + o_orderkey * 0.000000001) AS biggest_order,
           ARG_MIN(o_orderkey, o_totalprice + o_orderkey * 0.000000001) AS smallest_order,
           ROUND(MAX(o_totalprice), 2) AS max_spend
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax aggregation) with a deterministic tie-break on
    the ordering value (DuckDB arg_max can't order by struct)."""
    o = table(spark, sf_dir, "orders")
    # epsilon tie-break: prices have 2-decimal granularity (gaps >= 0.01),
    # orderkey*1e-9 perturbation is identical in both engines and far below it
    ordv = F.col("o_totalprice") + F.col("o_orderkey") * F.lit(1e-9)
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordv).alias("biggest_order"),
        F.min_by("o_orderkey", ordv).alias("smallest_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_spend"),
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           COUNT(*) AS n_lines,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_custkey
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both fact tables written bucketBy(16,
    orderkey); the subsequent join reads bucket-aligned files and needs NO
    exchange on either side (tests assert the plan has no Exchange before
    the join). This is the 100 TB pattern for repeated fact-fact joins —
    pay the shuffle once at write time, never again at read time.

    Result is hash-identical to the plain shuffle join (oracle)."""
    import tempfile

    warehouse = scratch_dir("bucketed_wh_")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdemo")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    for name, df, key in [("b_orders", o, "o_orderkey"), ("b_lineitem", li, "l_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS bucketdemo.{name}")
        (
            df.write.mode("overwrite")
            .option("path", f"{warehouse}/{name}")
            .bucketBy(16, key)
            .sortBy(key)
            .saveAsTable(f"bucketdemo.{name}")
        )
    bo = spark.table("bucketdemo.b_orders")
    bl = spark.table("bucketdemo.b_lineitem")
    return (
        bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count("*").alias("n_lines"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@query(
    "agg_hll_sketch",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__all__' AS event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events
    """,
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches, built into Spark 4):
    per-group hll_sketch_agg, then hll_union_agg across groups — the
    100 TB distinct-count pattern, where per-partition/per-day sketches
    are unioned instead of re-scanning raw data.

    Promoted from rows-only to hash-exact in r6 (the agg_approx_distinct
    pattern): the DataSketches estimate bytes are engine-specific, so the
    checked output carries the exact distinct counts plus the ±5%
    ACCURACY BOUND AS A COLUMN for BOTH the per-group estimates and the
    cross-group sketch UNION — the union bound is the part that actually
    certifies mergeability, and the oracle asserts it TRUE."""
    e = table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    # greatest(n,1): an all-NULL group has exact-distinct 0; 0/0 would NULL
    # the invariant column vs the oracle's hardcoded TRUE
    within = (
        F.abs(F.hll_sketch_estimate("sk") - F.col("exact_users"))
        / F.greatest(F.col("exact_users"), F.lit(1))
        <= 0.05
    )
    per_type_audit = per_type.select(
        "event_type", "exact_users", within.alias("approx_within_5pct")
    )
    global_exact = e.agg(F.count_distinct("user_id").alias("g"))
    total = (
        per_type.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("union_est"))
        .crossJoin(F.broadcast(global_exact))
        .select(
            F.lit("__all__").alias("event_type"),
            F.col("g").cast("long").alias("exact_users"),
            (
                F.abs(F.col("union_est") - F.col("g"))
                / F.greatest(F.col("g"), F.lit(1))
                <= 0.05
            ).alias("approx_within_5pct"),
        )
    )
    return per_type_audit.unionByName(total)


@query(
    "agg_bool",
    oracle="""
    SELECT l_returnflag,
           BOOL_AND(l_quantity > 0) AS all_positive_qty,
           BOOL_OR(l_discount > 0.09) AS any_deep_discount,
           CAST(SUM(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tax_free
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates: bool_and/bool_or (every/any) per group."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.sum(F.when(F.col("l_tax") == 0, 1).otherwise(0)).alias("n_tax_free"),
    )


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiplicity-preserving) intersection — INTERSECT ALL."""
    o = table(spark, sf_dir, "orders")
    left = o.where(F.col("o_totalprice") > 300000).select(F.col("o_custkey").alias("custkey"))
    right = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return left.intersectAll(right)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference — EXCEPT ALL (each right occurrence cancels one left)."""
    o = table(spark, sf_dir, "orders")
    left = o.where(F.col("o_totalprice") > 300000).select(F.col("o_custkey").alias("custkey"))
    right = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return left.exceptAll(right)


_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey AS top_orderkey, t.o_totalprice AS top_price
    FROM customer c,
    LATERAL (
        SELECT o.o_orderkey, o.o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 1
    ) t
"""


@query("join_lateral", oracle=_LATERAL_SQL)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery join (per-customer top order). Catalyst
    rewrites the correlated LIMIT 1 into a window/aggregate under a join —
    same physical shape as topk_per_group, expressed in the SQL dialect."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@query(
    "fn_format",
    oracle="""
    SELECT o_orderkey,
           PRINTF('%08d', o_orderkey) AS key_padded,
           PRINTF('%.2f', o_totalprice) AS price_2dp,
           PRINTF('%s|%s', o_orderstatus, o_orderpriority) AS status_pri
    FROM orders
    """,
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting (format_string ↔ DuckDB PRINTF)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.format_string("%08d", "o_orderkey").alias("key_padded"),
        F.format_string("%.2f", "o_totalprice").alias("price_2dp"),
        F.format_string("%s|%s", "o_orderstatus", "o_orderpriority").alias("status_pri"),
    )


@query(
    "fn_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(SIN(l_quantity), 6) AS sin_qty,
           ROUND(COS(l_quantity), 6) AS cos_qty,
           ROUND(ATAN2(l_discount, l_tax + 0.001), 6) AS atan2_dt,
           ROUND(DEGREES(ATAN(l_discount)), 6) AS deg_atan_disc,
           ROUND(EXP(l_discount), 6) AS exp_disc
    FROM lineitem WHERE l_linenumber <= 2
    """,
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trig/exponential family, rounded to 6 places (ulp-level libm
    differences between JVM and C math can't cross a 1e-6 boundary)."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_quantity"), 6).alias("sin_qty"),
        F.round(F.cos("l_quantity"), 6).alias("cos_qty"),
        F.round(F.atan2(F.col("l_discount"), F.col("l_tax") + 0.001), 6).alias("atan2_dt"),
        F.round(F.degrees(F.atan("l_discount")), 6).alias("deg_atan_disc"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
    )


@query(
    "fn_nulls",
    oracle="""
    WITH t AS (
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS maybe_price,
               NULLIF(o_orderstatus, 'O') AS maybe_status
        FROM orders
    )
    SELECT o_orderkey,
           (maybe_price IS NOT DISTINCT FROM NULL) AS price_is_null,
           COALESCE(maybe_price, -1.0) AS price_or_neg1,
           (maybe_status IS DISTINCT FROM 'F') AS status_not_f_nullsafe,
           CASE WHEN maybe_price IS NULL THEN 'missing' ELSE 'present' END AS presence,
           IFNULL(maybe_status, 'open') AS status_or_open
    FROM t
    """,
)
def fn_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling family: null-safe equality (<=> / IS [NOT] DISTINCT
    FROM), coalesce/ifnull, null-aware CASE — the dirty-data semantics the
    LogEntry omitempty sparsity (main.go:43-53) forces on every consumer."""
    o = table(spark, sf_dir, "orders")
    maybe_price = F.when(F.col("o_orderstatus") == "P", None).otherwise(F.col("o_totalprice"))
    maybe_status = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        maybe_price.eqNullSafe(F.lit(None).cast("double")).alias("price_is_null"),
        F.coalesce(maybe_price, F.lit(-1.0)).alias("price_or_neg1"),
        (~maybe_status.eqNullSafe(F.lit("F"))).alias("status_not_f_nullsafe"),
        F.when(maybe_price.isNull(), "missing").otherwise("present").alias("presence"),
        F.ifnull(maybe_status, F.lit("open")).alias("status_or_open"),
    )


@query(
    "win_ignore_nulls",
    oracle="""
    WITH t AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS good_value
        FROM events
    )
    SELECT event_id, user_id,
           LAG(good_value IGNORE NULLS) OVER w AS prev_good,
           LAST_VALUE(good_value IGNORE NULLS) OVER w AS latest_good
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation: carry forward the last non-null
    reading per user (the gap-fill / last-observation-carried-forward
    pattern for sensor-style streams with bad readings nulled out)."""
    e = table(spark, sf_dir, "events")
    good = F.when(F.col("event_type") == "error", None).otherwise(F.col("value"))
    t = e.select("event_id", "user_id", "ts", good.alias("good_value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.select(
        "event_id",
        "user_id",
        # LAG IGNORE NULLS emulated as last non-null over the preceding frame
        # (PySpark's lag() doesn't expose ignoreNulls)
        F.last("good_value", ignorenulls=True)
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        .alias("prev_good"),
        F.last("good_value", ignorenulls=True).over(w).alias("latest_good"),
    )


@query(
    "agg_approx_quantile",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS p50_rank_ok, TRUE AS p90_rank_ok, TRUE AS p99_rank_ok
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles via percentile_approx (Greenwald-Khanna-style
    mergeable summaries): p50/p90/p99 of order totals per order status.
    The sketch is a fixed-size mergeable state — at 100 TB the shuffle
    carries one summary per (group, task), never the values; the exact
    percentile twin (agg_percentile) needs the full value multiset per
    group.

    Promoted from rows-only to hash-exact in r6 (VERDICT item 7): the
    estimates themselves are engine-specific, so the checked output
    carries each estimate's RANK-ERROR BOUND AS A COLUMN — a second scan
    counts rows <= the returned value per group (broadcast join of the
    3-row estimate frame) and asserts the empirical rank is within ±2% of
    the target (GK at accuracy=10000 guarantees 1e-4·n; 2% covers
    tie-induced slack). The oracle asserts all three bounds TRUE per
    group — the accuracy contract is now SQL-checked, not pytest-only."""
    o = table(spark, sf_dir, "orders")
    acc = F.lit(10000)
    ap = o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", F.lit(0.5), acc).alias("p50"),
        F.percentile_approx("o_totalprice", F.lit(0.9), acc).alias("p90"),
        F.percentile_approx("o_totalprice", F.lit(0.99), acc).alias("p99"),
        F.count("*").alias("n"),
    )
    ranked = (
        o.join(F.broadcast(ap), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            F.first("n").alias("n"),
            *[
                F.avg((F.col("o_totalprice") <= F.col(c)).cast("double")).alias(
                    f"r{c}"
                )
                for c in ("p50", "p90", "p99")
            ],
        )
    )
    tol = 0.02
    return ranked.select(
        "o_orderstatus",
        "n",
        (F.abs(F.col("rp50") - 0.5) <= tol).alias("p50_rank_ok"),
        (F.abs(F.col("rp90") - 0.9) <= tol).alias("p90_rank_ok"),
        (F.abs(F.col("rp99") - 0.99) <= tol).alias("p99_rank_ok"),
    )


@query(
    "agg_countmin_sketch",
    oracle="""
    WITH probe AS (
        SELECT user_id FROM events WHERE user_id IS NOT NULL
        GROUP BY user_id ORDER BY COUNT(*) DESC, user_id LIMIT 3
    )
    SELECT e.event_type, p.user_id,
           CAST(SUM(CASE WHEN e.user_id = p.user_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exact,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS within_eps_bound
    FROM events e CROSS JOIN probe p
    GROUP BY e.event_type, p.user_id
    """,
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketches (Spark's built-in count_min_sketch agg): one
    mergeable frequency sketch of user_id per event_type, alongside exact
    row counts. The 100 TB heavy-hitter pattern — per-partition/per-day
    sketches merge in O(sketch) instead of re-scanning raw events; point
    lookups answer "how often did user X appear" with eps·N additive error.

    Promoted from rows-only to hash-exact in r7 (the agg_approx_distinct
    pattern): sketch BYTES are engine-specific, so the checked output is
    the operator plus its proof obligation — for the 3 globally hottest
    users (deterministic tie-break), each sketch's point estimate must
    satisfy exact <= est <= exact + eps·N. The estimates are read by
    deserializing each group's sketch through the JVM CountMinSketch API
    on the driver — bounded work (one ~KB sketch per event_type, never
    row-scale), the same bounded-collect discipline as the k-center seeds.
    tests/test_wave3.py keeps the independent 20-user-per-group bound
    check against sketches it builds itself."""
    e = table(spark, sf_dir, "events")
    sketches = (
        e.groupBy("event_type")
        .agg(
            F.count_min_sketch(
                F.col("user_id"), F.lit(0.001), F.lit(0.99), F.lit(42)
            ).alias("sketch"),
            F.count("*").alias("n_events"),
        )
        .collect()
    )
    probe = [
        r.user_id
        for r in e.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "user_id")
        .limit(3)
        .collect()
    ]
    exact = {
        (r.event_type, r.user_id): r.n
        for r in e.where(F.col("user_id").isin(probe))
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    CMS = spark._jvm.org.apache.spark.util.sketch.CountMinSketch
    out = []
    for r in sketches:
        sk = CMS.readFrom(bytes(r.sketch))
        for uid in probe:
            n_ex = int(exact.get((r.event_type, uid), 0))
            est = int(sk.estimateCount(uid))
            ok = n_ex <= est <= n_ex + 0.001 * r.n_events
            out.append((r.event_type, uid, n_ex, int(r.n_events), bool(ok)))
    return spark.createDataFrame(
        out,
        "event_type string, user_id bigint, n_exact bigint, "
        "n_events bigint, within_eps_bound boolean",
    )
