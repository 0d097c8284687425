"""Wave-276: uplift-model evaluation via the Qini curve (the AUUC
standard) and the variance-time curve (the Leland self-similarity
diagnostic for arrival processes). Back-of-registry.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "model_qini_uplift",
    oracle="""
    WITH pts AS (
        SELECT CASE WHEN DAYOFWEEK(ts) IN (0, 6) THEN 1 ELSE 0 END AS t,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
               -- heuristic uplift score: late-night activity responds
               -- "more" (a fixed, deterministic scorer to be EVALUATED,
               -- not believed)
               (epoch_us(ts) % 86400000000) / 86400000000.0 AS score,
               event_id
        FROM events
    ),
    ranked AS (
        SELECT t, y,
               NTILE(10) OVER (ORDER BY score DESC, event_id) AS decile
        FROM pts
    ),
    cum AS (
        SELECT decile,
               SUM(SUM(CASE WHEN t = 1 THEN y ELSE 0 END))
                   OVER (ORDER BY decile) AS yt,
               SUM(SUM(CASE WHEN t = 0 THEN y ELSE 0 END))
                   OVER (ORDER BY decile) AS yc,
               SUM(SUM(t)) OVER (ORDER BY decile) AS nt,
               SUM(SUM(1 - t)) OVER (ORDER BY decile) AS nc
        FROM ranked GROUP BY decile
    ),
    tot AS (
        SELECT MAX(yt) AS yt_all, MAX(yc) AS yc_all,
               MAX(nt) AS nt_all, MAX(nc) AS nc_all
        FROM cum
    )
    SELECT c.decile,
           CAST(c.yt AS BIGINT) AS cum_treated_conv,
           CAST(c.yc AS BIGINT) AS cum_control_conv,
           ROUND(c.yt - c.yc * c.nt / CAST(c.nc AS DOUBLE), 6) AS qini,
           ROUND((t.yt_all - t.yc_all * t.nt_all
                             / CAST(t.nc_all AS DOUBLE))
                 * (c.nt + c.nc)
                 / CAST(t.nt_all + t.nc_all AS DOUBLE), 6) AS random_line
    FROM cum c CROSS JOIN tot t
    ORDER BY c.decile
    """,
)
def model_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini curve for uplift evaluation (Radcliffe, Direct Marketing
    Analytics J. 2007, public): rank units by a candidate uplift score
    (here a deterministic time-of-day heuristic — the op evaluates
    scorers, it doesn't endorse this one), then per cumulative decile
    Qini(k) = Y_t(k) - Y_c(k) * N_t(k)/N_c(k) — incremental
    conversions attributable to treating the top-k — against the
    random-targeting diagonal. The gap between curve and line is what
    an uplift model is FOR; a scorer no better than random hugs the
    diagonal, which the test asserts numerically either way.

    Exactness device: deciles via NTILE over a total order (score,
    event_id); cumulative counts stay integers until the two output
    ratios.

    Scale shape (r8 rework, VERDICT r7 item 4): the NTILE is computed
    from the two-phase sharded prefix rank (rank within equal scores +
    distinct-score cumulative offsets, rank_utils.global_row_index) —
    bit-identical to the single-partition NTILE, but no corpus-sized
    window partition; then a 10-group cumulative rollup."""
    from data_ingestor_web_app_spark.operators.rank_utils import (
        global_row_index,
        ntile_from_index,
    )

    pts = table(spark, sf_dir, "events").select(
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("t"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        (
            F.expr("unix_micros(ts) % 86400000000") / 86400000000.0
        ).alias("score"),
        "event_id",
    )
    idx = global_row_index(pts, "score", "event_id", descending=True)
    ranked = idx.crossJoin(
        F.broadcast(pts.agg(F.count("*").cast("long").alias("__n")))
    ).select(
        "t",
        "y",
        ntile_from_index(F.col("__i"), F.col("__n"), 10).alias("decile"),
    )
    per = ranked.groupBy("decile").agg(
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0)).alias("yt_d"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0)).alias("yc_d"),
        F.sum("t").alias("nt_d"),
        F.sum(1 - F.col("t")).alias("nc_d"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "decile",
        F.sum("yt_d").over(wc).alias("yt"),
        F.sum("yc_d").over(wc).alias("yc"),
        F.sum("nt_d").over(wc).alias("nt"),
        F.sum("nc_d").over(wc).alias("nc"),
    )
    tot = cum.agg(
        F.max("yt").alias("yt_all"),
        F.max("yc").alias("yc_all"),
        F.max("nt").alias("nt_all"),
        F.max("nc").alias("nc_all"),
    )
    qini = F.col("yt") - F.col("yc") * F.col("nt") / F.col("nc").cast(
        "double"
    )
    rand = (
        (
            F.col("yt_all")
            - F.col("yc_all") * F.col("nt_all") / F.col("nc_all").cast("double")
        )
        * (F.col("nt") + F.col("nc"))
        / (F.col("nt_all") + F.col("nc_all")).cast("double")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            F.col("yt").cast("long").alias("cum_treated_conv"),
            F.col("yc").cast("long").alias("cum_control_conv"),
            F.round(qini, 6).alias("qini"),
            F.round(rand, 6).alias("random_line"),
        )
        .orderBy("decile")
    )


_VT_WINDOWS = [60, 300, 900, 3600]  # seconds


@query(
    "events_variance_time_curve",
    oracle=f"""
    WITH w AS (SELECT UNNEST(ARRAY{_VT_WINDOWS}) AS win),
    counts AS (
        SELECT w.win,
               epoch_us(ts) // (CAST(w.win AS BIGINT) * 1000000) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events CROSS JOIN w
        GROUP BY w.win, bucket
    ),
    vm AS (
        SELECT win,
               CAST(COUNT(*) AS BIGINT) AS n_windows,
               AVG(CAST(c AS DOUBLE)) AS mu,
               SUM(CAST(c AS DOUBLE) * c) / COUNT(*)
                 - AVG(CAST(c AS DOUBLE)) * AVG(CAST(c AS DOUBLE)) AS v
        FROM counts GROUP BY win
    )
    SELECT win AS window_s, n_windows,
           ROUND(mu, 6) AS mean_count,
           ROUND(v / mu, 6) AS vmr
    FROM vm ORDER BY win
    """,
)
def events_variance_time_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The variance-time curve (Leland, Taqqu, Willinger & Wilson,
    IEEE/ACM ToN 1994, public — the self-similar-traffic paper's core
    diagnostic): the variance-to-mean ratio of arrival counts at
    window sizes 1/5/15/60 minutes. For Poisson traffic VMR stays ~1
    at every scale; for long-range-dependent traffic VMR GROWS like
    m^(2H-1) — the slope of log VMR against log window recovers the
    Hurst exponent, cross-checkable against events_hurst_rs and
    events_dfa_alpha (the test fits it). The one plot that decides
    whether batching smooths your load or merely relocates the burst.

    Exactness device: bucket counts are exact integer-division
    groupings; population moments per window size; one ratio.

    Scale shape: a constant 4x fan-out, one map-side-combinable
    (window, bucket) rollup, one 4-row moment pass — only active
    buckets materialize (empty-bucket correction noted in-band: the
    fixture's arrival stream has no empty minutes)."""
    e = table(spark, sf_dir, "events")
    wins = F.array(*[F.lit(w) for w in _VT_WINDOWS])
    counts = (
        e.withColumn("win", F.explode(wins))
        .groupBy(
            "win",
            F.expr("unix_micros(ts) div (win * 1000000L)").alias("bucket"),
        )
        .agg(F.count("*").cast("long").alias("c"))
    )
    cd = F.col("c").cast("double")
    vm = counts.groupBy("win").agg(
        F.count("*").cast("long").alias("n_windows"),
        F.avg(cd).alias("mu"),
        (F.sum(cd * F.col("c")) / F.count("*") - F.avg(cd) * F.avg(cd)).alias(
            "v"
        ),
    )
    return vm.select(
        F.col("win").alias("window_s"),
        "n_windows",
        F.round("mu", 6).alias("mean_count"),
        F.round(F.col("v") / F.col("mu"), 6).alias("vmr"),
    ).orderBy("window_s")
