"""Wave-254: circular statistics beyond the basics — Watson's U^2
uniformity test on the 24 h clock (rotation-invariant, unlike a KS on
wrapped times) and the Fisher-Lee circular-circular correlation between
users' click-time and purchase-time angles. Back-of-registry.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query

_TWO_PI = 2.0 * math.pi


@query(
    "agg_watson_u2",
    oracle="""
    WITH u AS (
        SELECT (epoch_us(ts) % 86400000000) / 86400000000.0 AS u
        FROM events
    ),
    ranked AS (
        SELECT u,
               ROW_NUMBER() OVER (ORDER BY u, 1) AS i,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM u
    ),
    parts AS (
        SELECT n,
               SUM((u - (2.0 * i - 1) / (2 * n))
                   * (u - (2.0 * i - 1) / (2 * n))) AS ss,
               AVG(u) AS ubar
        FROM ranked GROUP BY n
    )
    SELECT n AS n_obs,
           ROUND(ubar, 6) AS mean_frac,
           ROUND(ss - n * (ubar - 0.5) * (ubar - 0.5) + 1.0 / (12 * n), 6)
               AS watson_u2,
           ss - n * (ubar - 0.5) * (ubar - 0.5) + 1.0 / (12 * n) > 0.187
               AS nonuniform
    FROM parts
    """,
)
def agg_watson_u2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watson's U^2 test of circular uniformity (Watson, Biometrika
    1961, public) on time-of-day fractions: U^2 = sum (u_(i) -
    (2i-1)/(2n))^2 - n*(ubar - 1/2)^2 + 1/(12n) — the Cramer-von Mises
    statistic made ROTATION-INVARIANT, which is the property a clock
    needs (a KS/CvM verdict would change if the day started at 3am;
    U^2 does not). Compared against the literal 5% point 0.187.
    Complements agg_circular_hour_stats (concentration) and
    events_cosinor (shape) with a distribution-free uniformity verdict.

    Exactness device: u comes from exact integer epoch-micros modular
    arithmetic; the order statistic index is a totally ordered
    row_number; one rounded chain; the flag compares the identical
    unrounded statistic.

    Scale shape: one global sort-rank window over the scan (at 100 TB:
    the two-phase sharded prefix-rank), one 1-row aggregate."""
    u = table(spark, sf_dir, "events").select(
        (
            F.expr("unix_micros(ts) % 86400000000") / 86400000000.0
        ).alias("u")
    )
    ranked = u.select(
        "u",
        F.row_number().over(Window.orderBy("u")).alias("i"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
    )
    dev = F.col("u") - (2.0 * F.col("i") - 1) / (2 * F.col("n"))
    parts = ranked.groupBy("n").agg(
        F.sum(dev * dev).alias("ss"), F.avg("u").alias("ubar")
    )
    u2 = (
        F.col("ss")
        - F.col("n") * (F.col("ubar") - 0.5) * (F.col("ubar") - 0.5)
        + 1.0 / (12 * F.col("n"))
    )
    return parts.select(
        F.col("n").alias("n_obs"),
        F.round("ubar", 6).alias("mean_frac"),
        F.round(u2, 6).alias("watson_u2"),
        (u2 > 0.187).alias("nonuniform"),
    )


@query(
    "agg_circular_correlation",
    oracle=f"""
    WITH ang AS (
        SELECT user_id, event_type,
               {_TWO_PI!r} * ((epoch_us(ts) % 86400000000)
                              / 86400000000.0) AS th
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    per_user AS (
        SELECT user_id, event_type,
               ATAN2(SUM(SIN(th)), SUM(COS(th))) AS mean_ang
        FROM ang GROUP BY user_id, event_type
    ),
    paired AS (
        SELECT c.user_id,
               c.mean_ang AS a, p.mean_ang AS b
        FROM per_user c JOIN per_user p
          ON p.user_id = c.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
    ),
    means AS (
        SELECT ATAN2(SUM(SIN(a)), SUM(COS(a))) AS abar,
               ATAN2(SUM(SIN(b)), SUM(COS(b))) AS bbar,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM paired
    ),
    mom AS (
        SELECT m.n,
               SUM(SIN(a - m.abar) * SIN(b - m.bbar)) AS sab,
               SUM(SIN(a - m.abar) * SIN(a - m.abar)) AS saa,
               SUM(SIN(b - m.bbar) * SIN(b - m.bbar)) AS sbb
        FROM paired CROSS JOIN means m
        GROUP BY m.n
    )
    SELECT n AS n_users,
           ROUND(sab / SQRT(saa * sbb), 6) AS circ_corr,
           ROUND(SQRT(n) * sab / SQRT(saa * sbb), 6) AS z_approx
    FROM mom
    """,
)
def agg_circular_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fisher-Lee circular-circular correlation (Fisher & Lee,
    Biometrika 1983, public) between each user's mean click hour-angle
    and mean purchase hour-angle: r = sum sin(a - abar) sin(b - bbar) /
    sqrt(sum sin^2 * sum sin^2), with circular means from atan2 of
    vector sums — the correct "do users who click late also buy late?"
    statistic, where Pearson on raw hours breaks at the midnight wrap
    (23h and 1h are 2h apart on a circle, 22h apart on a line).

    Exactness device: angles from exact integer modular time-of-day;
    trig at small argument; the sums reduce in one pass after a
    broadcast of the two circular means; z uses the simple sqrt(n)r
    normal approximation (stated, not erf-computed).

    Scale shape: one (user, type) rollup, a self-join on user (both
    sides shuffled once on the same key), two moment aggregates."""
    ang = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select(
            "user_id",
            "event_type",
            (
                _TWO_PI
                * (
                    F.expr("unix_micros(ts) % 86400000000")
                    / 86400000000.0
                )
            ).alias("th"),
        )
    )
    per_user = ang.groupBy("user_id", "event_type").agg(
        F.atan2(F.sum(F.sin("th")), F.sum(F.cos("th"))).alias("mean_ang")
    )
    c = per_user.where(F.col("event_type") == "click").select(
        "user_id", F.col("mean_ang").alias("a")
    )
    p = per_user.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("mean_ang").alias("b")
    )
    paired = c.join(p, "user_id")
    means = paired.agg(
        F.atan2(F.sum(F.sin("a")), F.sum(F.cos("a"))).alias("abar"),
        F.atan2(F.sum(F.sin("b")), F.sum(F.cos("b"))).alias("bbar"),
        F.count("*").cast("long").alias("n"),
    )
    sa = F.sin(F.col("a") - F.col("abar"))
    sb = F.sin(F.col("b") - F.col("bbar"))
    mom = (
        paired.crossJoin(F.broadcast(means))
        .groupBy("n")
        .agg(
            F.sum(sa * sb).alias("sab"),
            F.sum(sa * sa).alias("saa"),
            F.sum(sb * sb).alias("sbb"),
        )
    )
    r = F.col("sab") / F.sqrt(F.col("saa") * F.col("sbb"))
    return mom.select(
        F.col("n").alias("n_users"),
        F.round(r, 6).alias("circ_corr"),
        F.round(F.sqrt(F.col("n")) * r, 6).alias("z_approx"),
    )
