"""Wave-11 data-quality expectation suite and graph triangle counting.

The reference trusts its input blindly (every TCP payload becomes a
record, /root/reference/main.go:86-113, with only the empty-payload drop
as validation). A production lake front-loads explicit, queryable data
contracts instead — the Deequ/Great-Expectations pattern (public):
declare rules, evaluate them as aggregates, store the pass/fail report
next to the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "dq_expectations",
    oracle="""
    WITH o AS (
        SELECT ROUND(COUNT(DISTINCT o_orderkey) * 1.0 / COUNT(*), 6) AS uniq,
               ROUND((SUM((o_totalprice > 0)::INT)) * 1.0 / COUNT(*), 6) AS pos
        FROM orders
    ),
    l AS (
        SELECT ROUND(SUM((l_quantity BETWEEN 1 AND 50)::INT) * 1.0 / COUNT(*), 6)
                   AS in_range
        FROM lineitem
    ),
    ri AS (
        SELECT ROUND(SUM((ok.o_orderkey IS NOT NULL)::INT) * 1.0 / COUNT(*), 6)
                   AS ref_ok
        FROM lineitem li
        LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) ok
               ON ok.o_orderkey = li.l_orderkey
    ),
    e AS (
        SELECT ROUND(SUM((user_id IS NOT NULL)::INT) * 1.0 / COUNT(*), 6)
                   AS complete
        FROM events
    ),
    d AS (
        SELECT ROUND(SUM((n_chars = LENGTH(text))::INT) * 1.0 / COUNT(*), 6)
                   AS consistent
        FROM documents
    )
    SELECT 'orders.o_orderkey:unique' AS rule, uniq AS metric,
           uniq = 1.0 AS passed FROM o
    UNION ALL
    SELECT 'orders.o_totalprice:positive', pos, pos = 1.0 FROM o
    UNION ALL
    SELECT 'lineitem.l_quantity:in_1_50', in_range, in_range >= 0.99 FROM l
    UNION ALL
    SELECT 'lineitem.l_orderkey:fk_orders', ref_ok, ref_ok = 1.0 FROM ri
    UNION ALL
    SELECT 'events.user_id:complete', complete, complete = 1.0 FROM e
    UNION ALL
    SELECT 'documents.n_chars:eq_len_text', consistent, consistent = 1.0 FROM d
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality report (Deequ-style, public): six
    expectations — key uniqueness, positivity, value range, foreign-key
    integrity, completeness, derived-column consistency — each evaluated
    to a metric in [0,1] with a pass/fail verdict, emitted as one
    queryable report table.

    Scale shape: rules are FUSED per table — all orders rules ride one
    aggregate pass, all lineitem scalar rules another; only the FK rule
    needs a join (left join against the distinct key side, counted in the
    same pass; at 100 TB that is one shuffle on the key, or free if both
    sides are bucketed by it). The report itself is O(#rules) rows —
    verdicts travel, raw data never does."""
    o = table(spark, sf_dir, "orders").agg(
        F.round(F.countDistinct("o_orderkey") * 1.0 / F.count("*"), 6).alias("uniq"),
        F.round(
            F.sum((F.col("o_totalprice") > 0).cast("int")) * 1.0 / F.count("*"), 6
        ).alias("pos"),
    )
    li = table(spark, sf_dir, "lineitem")
    l = li.agg(
        F.round(
            F.sum(F.col("l_quantity").between(1, 50).cast("int")) * 1.0 / F.count("*"),
            6,
        ).alias("in_range")
    )
    ok = table(spark, sf_dir, "orders").select("o_orderkey").distinct()
    ri = (
        li.join(ok, li.l_orderkey == ok.o_orderkey, "left")
        .agg(
            F.round(
                F.sum(F.col("o_orderkey").isNotNull().cast("int")) * 1.0 / F.count("*"),
                6,
            ).alias("ref_ok")
        )
    )
    e = table(spark, sf_dir, "events").agg(
        F.round(
            F.sum(F.col("user_id").isNotNull().cast("int")) * 1.0 / F.count("*"), 6
        ).alias("complete")
    )
    d = table(spark, sf_dir, "documents").agg(
        F.round(
            F.sum((F.col("n_chars") == F.length("text")).cast("int")) * 1.0
            / F.count("*"),
            6,
        ).alias("consistent")
    )

    def row(src: DataFrame, col: str, rule: str, passed_expr) -> DataFrame:
        return src.select(
            F.lit(rule).alias("rule"),
            F.col(col).alias("metric"),
            passed_expr(F.col(col)).alias("passed"),
        )

    return (
        row(o, "uniq", "orders.o_orderkey:unique", lambda c: c == 1.0)
        .unionByName(row(o, "pos", "orders.o_totalprice:positive", lambda c: c == 1.0))
        .unionByName(
            row(l, "in_range", "lineitem.l_quantity:in_1_50", lambda c: c >= 0.99)
        )
        .unionByName(
            row(ri, "ref_ok", "lineitem.l_orderkey:fk_orders", lambda c: c == 1.0)
        )
        .unionByName(row(e, "complete", "events.user_id:complete", lambda c: c == 1.0))
        .unionByName(
            row(d, "consistent", "documents.n_chars:eq_len_text", lambda c: c == 1.0)
        )
    )


@query(
    "graph_triangle_count",
    oracle="""
    WITH buckets AS (
        SELECT DISTINCT user_id,
               event_type,
               DATE_TRUNC('minute', ts) AS m
        FROM events
    ),
    edges AS (
        SELECT DISTINCT a.user_id AS u, b.user_id AS v
        FROM buckets a
        JOIN buckets b ON b.event_type = a.event_type AND b.m = a.m
                      AND a.user_id < b.user_id
    ),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT (SELECT COUNT(*) FROM edges) AS n_edges, n_triangles FROM tri
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over a behavioral co-occurrence graph: an edge
    links two users active in the same (event_type, minute) bucket; a
    triangle is three mutually linked users — the clustering-coefficient
    primitive of social/fraud graph analysis. Edges are canonicalized
    u < v, so each triangle (u < v < w) is counted exactly once as
    e1=(u,v), e2=(v,w), e3=(u,w).

    Scale shape: the classic two-join triangle plan — edges shuffle on v
    for e1⋈e2, then on (u,w) for the closing e3 probe; both are equi
    joins Catalyst can re-order, and the wedge fan-out (sum of deg² )
    is the known cost driver, handled in production by degree-ordering
    the edge direction (count wedges from the lower-degree endpoint).
    The co-occurrence edge build is itself a self-join on the bucket key
    with the same skew profile as any hot-key join — AQE splits it."""
    buckets = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.date_trunc("minute", "ts").alias("m"),
        )
        .distinct()
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    edges = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.m") == F.col("a.m"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .distinct()
    )
    e1 = edges.select(F.col("u").alias("t_u"), F.col("v").alias("t_v"))
    e2 = edges.select(F.col("u").alias("t_v"), F.col("v").alias("t_w"))
    e3 = edges.select(F.col("u").alias("t_u"), F.col("v").alias("t_w"))
    tri = e1.join(e2, "t_v").join(e3, ["t_u", "t_w"]).agg(
        F.count("*").alias("n_triangles")
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return n_edges.crossJoin(tri)
