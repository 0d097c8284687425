"""Wave-33: SemDeDup pruning, seasonal residuals, URL parsing, trig family.

dedup_semdedup implements the SemDeDup keep-rule (Abbas et al. 2023,
public): inside each embedding cluster, near-duplicate pairs drop the
member CLOSER to the centroid — keeping the outliers preserves diversity
(the opposite of the usual min-id rule, which is why it's a separate
operator from dedup_embedding). events_seasonal_residuals finishes the
time-series family with an hour-of-day seasonal baseline and exact-
arithmetic daily residuals. fn_url_parse / fn_trig extend the scalar
function matrix. Registered at the back of registry._MODULES.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "dedup_semdedup",
    oracle="""
    WITH ue AS (
        SELECT vec_id, label, UNNEST(embedding) AS x,
               GENERATE_SUBSCRIPTS(embedding, 1) AS i
        FROM embeddings
    ),
    c0 AS (
        SELECT label AS c_label, i, ROUND(AVG(CAST(x AS DOUBLE)), 6) AS cx
        FROM ue GROUP BY label, i
    ),
    dots0 AS (
        SELECT u.vec_id, c.c_label, ROUND(SUM(CAST(u.x AS DOUBLE) * c.cx), 6) AS dot
        FROM ue u JOIN c0 c ON u.i = c.i
        GROUP BY u.vec_id, c.c_label
    ),
    assign AS (
        SELECT vec_id, c_label, dot AS cdot FROM (
            SELECT vec_id, c_label, dot,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dot DESC, c_label) AS rk
            FROM dots0) t WHERE rk = 1
    ),
    norms AS (
        SELECT vec_id, SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
        FROM ue GROUP BY vec_id
    ),
    cand AS (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, a.c_label,
               a.cdot AS cdot_a, b.cdot AS cdot_b
        FROM assign a JOIN assign b
          ON a.c_label = b.c_label AND a.vec_id < b.vec_id
    ),
    pdots AS (
        SELECT c.doc_a, c.doc_b, c.c_label, c.cdot_a, c.cdot_b,
               SUM(CAST(ua.x AS DOUBLE) * CAST(ub.x AS DOUBLE)) AS dot
        FROM cand c
        JOIN ue ua ON ua.vec_id = c.doc_a
        JOIN ue ub ON ub.vec_id = c.doc_b AND ub.i = ua.i
        GROUP BY c.doc_a, c.doc_b, c.c_label, c.cdot_a, c.cdot_b
    ),
    pairs AS (
        SELECT c_label,
               CASE WHEN cdot_a > cdot_b
                         OR (cdot_a = cdot_b AND doc_a > doc_b)
                    THEN doc_a ELSE doc_b END AS dropped
        FROM pdots p
        JOIN norms na ON na.vec_id = p.doc_a
        JOIN norms nb ON nb.vec_id = p.doc_b
        WHERE ROUND(p.dot / (na.nrm * nb.nrm), 6) >= 0.35
    ),
    dropped AS (SELECT c_label, dropped AS vec_id FROM pairs GROUP BY 1, 2)
    SELECT a.c_label,
           COUNT(*) AS n_members,
           CAST(COUNT(d.vec_id) AS BIGINT) AS n_dropped,
           COUNT(*) - COUNT(d.vec_id) AS n_kept
    FROM assign a LEFT JOIN dropped d
      ON d.c_label = a.c_label AND d.vec_id = a.vec_id
    GROUP BY a.c_label
    """,
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): semantic dedup that keeps the
    DIVERSE member of each near-dup pair — inside an IVF cluster, any pair
    with cosine ≥ 0.35 drops whichever member sits CLOSER to the centroid
    (higher centroid-dot; id breaks exact ties). Per-cluster summary:
    members, dropped, kept. Composition of the engine's own primitives:
    broadcast-codebook assignment (zero corpus shuffle), within-cluster
    pair join (never all-pairs), exact cosine verification, set-subtract.

    Scale shape identical to dedup_embedding (same blocking); the drop
    rule adds only a projection on the verified pairs plus one DISTINCT
    on (cluster, dropped-id), both bounded by near-dup density."""
    from data_ingestor_web_app_spark.llm.vector_common import dot as _dot
    from data_ingestor_web_app_spark.llm.vector_common import norm as _norm
    from data_ingestor_web_app_spark.llm.vector_extra import _label_means

    e = table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    cent = _label_means(e)
    cdot = base.crossJoin(F.broadcast(cent)).select(
        "vec_id", "c_label", F.round(_dot(F.col("embedding"), F.col("centroid")), 6).alias("dot")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("dot").desc(), F.col("c_label"))
    assign = (
        cdot.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", "c_label", F.col("dot").alias("cdot"))
    )
    blocked = base.join(assign, "vec_id")
    a = blocked.select(
        F.col("vec_id").alias("doc_a"), F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"), "c_label", F.col("cdot").alias("cdot_a"),
    )
    b = blocked.select(
        F.col("vec_id").alias("doc_b"), F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"), "c_label", F.col("cdot").alias("cdot_b"),
    )
    cos6 = F.round(_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6)
    pairs = (
        a.join(b, ["c_label"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(cos6 >= 0.35)
        .select(
            "c_label",
            F.when(
                (F.col("cdot_a") > F.col("cdot_b"))
                | ((F.col("cdot_a") == F.col("cdot_b")) & (F.col("doc_a") > F.col("doc_b"))),
                F.col("doc_a"),
            )
            .otherwise(F.col("doc_b"))
            .alias("dropped"),
        )
    )
    dropped = pairs.select("c_label", F.col("dropped").alias("vec_id")).distinct()
    marked = assign.join(
        dropped.withColumn("is_dropped", F.lit(1)), ["c_label", "vec_id"], "left"
    )
    return marked.groupBy("c_label").agg(
        F.count("*").alias("n_members"),
        F.count("is_dropped").cast("long").alias("n_dropped"),
        (F.count("*") - F.count("is_dropped")).alias("n_kept"),
    )


@query(
    "events_seasonal_residuals",
    oracle="""
    WITH v AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
               CAST(ROUND(value * 100) AS BIGINT) AS vc
        FROM events
    ),
    hod_rate AS (
        SELECT hod, CAST(SUM(vc) AS BIGINT) AS s_h, COUNT(*) AS n_h
        FROM v GROUP BY hod
    ),
    day_hod AS (
        SELECT d, v.hod, COUNT(*) AS cnt, CAST(SUM(vc) AS BIGINT) AS s_dh
        FROM v GROUP BY d, v.hod
    ),
    terms AS (
        SELECT d, cnt, s_dh,
               (cnt * s_h) // n_h AS q,
               ((cnt * s_h) % n_h) * 1.0 / n_h AS rf
        FROM day_hod JOIN hod_rate USING (hod)
    ),
    daily AS (
        SELECT d,
               CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(s_dh) AS BIGINT) AS actual_c,
               CAST(SUM(q) AS BIGINT) AS exp_q,
               SUM(rf) AS exp_rf
        FROM terms GROUP BY d
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS day, n,
           ROUND(actual_c * 1.0 / n / 100, 4) AS actual_mean,
           ROUND((exp_q + exp_rf) / n / 100, 4) AS expected_mean,
           ROUND((actual_c - exp_q - exp_rf) / n / 100, 4) AS mean_residual
    FROM daily
    """,
)
def events_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal decomposition against an hour-of-day baseline: each day's
    expected mean = Σ_h (its hour-h event count × the global hour-h rate),
    residual = actual − expected — the classic 'is today anomalous after
    removing the diurnal cycle' monitor. Exact-arithmetic discipline:
    values fix to cents, hour rates decompose as integer quotient +
    sub-unit remainder fractions (≤24 per day), so both engines do
    bit-identical arithmetic (the ANOVA pattern applied to time series).

    Scale shape: two map-side-combined groupBys (per-hour-of-day: 24 rows;
    per-day-hour: days×24 rows) + a broadcast join — the raw corpus is
    scanned once and never re-shuffled at event grain."""
    e = table(spark, sf_dir, "events")
    v = e.select(
        F.col("ts").cast("date").alias("d"),
        F.hour("ts").alias("hod"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    hod_rate = v.groupBy("hod").agg(
        F.sum("vc").cast("long").alias("s_h"), F.count("*").alias("n_h")
    )
    day_hod = v.groupBy("d", "hod").agg(
        F.count("*").alias("cnt"), F.sum("vc").cast("long").alias("s_dh")
    )
    terms = day_hod.join(F.broadcast(hod_rate), "hod").select(
        "d",
        "cnt",
        "s_dh",
        F.expr("(cnt * s_h) div n_h").alias("q"),
        (((F.col("cnt") * F.col("s_h")) % F.col("n_h")) * 1.0 / F.col("n_h")).alias("rf"),
    )
    daily = terms.groupBy("d").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("s_dh").cast("long").alias("actual_c"),
        F.sum("q").cast("long").alias("exp_q"),
        F.sum("rf").alias("exp_rf"),
    )
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n",
        F.round(F.col("actual_c") * 1.0 / F.col("n") / 100, 4).alias("actual_mean"),
        F.round((F.col("exp_q") + F.col("exp_rf")) / F.col("n") / 100, 4).alias("expected_mean"),
        F.round(
            (F.col("actual_c") - F.col("exp_q") - F.col("exp_rf")) / F.col("n") / 100, 4
        ).alias("mean_residual"),
    )


@query(
    "fn_url_parse",
    oracle="""
    SELECT o_orderkey,
           'shop.example.com' AS host,
           '/orders/' || CAST(o_orderkey AS VARCHAR) AS path,
           'status=' || o_orderstatus AS query,
           o_orderstatus AS status_param
    FROM orders WHERE o_orderkey < 2000
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing family: each order serializes to
    https://shop.example.com/orders/<key>?status=<s> and parse_url pulls
    HOST / PATH / QUERY / QUERY:status back out — identity oracle proves
    the serialize→parse round trip (the fn_xpath discipline for URLs, the
    log-analytics workhorse for the reference's ingest domain).

    Scale shape: pure per-row JVM expressions — no UDF, no shuffle."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    url = F.concat(
        F.lit("https://shop.example.com/orders/"),
        F.col("o_orderkey"),
        F.lit("?status="),
        F.col("o_orderstatus"),
    )
    return o.select("o_orderkey", url.alias("__url")).select(
        "o_orderkey",
        F.parse_url(F.col("__url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("__url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("__url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("__url"), F.lit("QUERY"), F.lit("status")).alias("status_param"),
    )
