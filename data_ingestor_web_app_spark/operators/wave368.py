"""Wave-368: entropic optimal transport by Sinkhorn-Knopp scaling
(Cuturi, NeurIPS 2013) in exact integer arithmetic, and Welch's
heteroscedastic one-way ANOVA (Welch, Biometrika 1951).
Back-of-registry module.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query

_NB = 10  # histogram bins (pooled value deciles)
_T = 6  # Sinkhorn iterations
# Gibbs kernel K = exp(-|i-j| / eps) with eps = 1, quantized to nano as a
# PYTHON-computed literal table so neither engine's libm exp() is in the
# loop (a 1-ulp exp difference would flip a FLOOR).
_K_NANO = [int(math.floor(1e9 * math.exp(-k))) for k in range(_NB)]


def _sink_iter_sql(t: int) -> str:
    """u{t},v{t} -> v{t+1} via u{t+1}: all integer (HUGEINT interim)."""
    return f"""
    su{t} AS MATERIALIZED (
        SELECT k.i, SUM(CAST(k.kn AS HUGEINT) * v.v_nano) AS s
        FROM kmat k JOIN v{t} v ON v.j = k.j GROUP BY k.i
    ),
    u{t + 1} AS MATERIALIZED (
        SELECT a.i,
               CAST((CAST(a.a_nano AS HUGEINT)
                     * CAST(1000000000000000000 AS HUGEINT)) // su{t}.s
                    AS BIGINT) AS u_nano
        FROM amarg a JOIN su{t} ON su{t}.i = a.i
    ),
    sv{t} AS MATERIALIZED (
        SELECT k.j, SUM(CAST(k.kn AS HUGEINT) * u.u_nano) AS s
        FROM kmat k JOIN u{t + 1} u ON u.i = k.i GROUP BY k.j
    ),
    v{t + 1} AS MATERIALIZED (
        SELECT b.j,
               CAST((CAST(b.b_nano AS HUGEINT)
                     * CAST(1000000000000000000 AS HUGEINT)) // sv{t}.s
                    AS BIGINT) AS v_nano
        FROM bmarg b JOIN sv{t} ON sv{t}.j = b.j
    )"""


@query(
    "sim_sinkhorn_ot",
    oracle=f"""
    WITH x AS MATERIALIZED (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
               CASE WHEN DAYOFWEEK(CAST(ts AS DATE)) IN (0, 6)
                    THEN 1 ELSE 0 END AS we
        FROM events
    ),
    grid AS MATERIALIZED (
        SELECT v, COUNT(*) AS cnt FROM x GROUP BY v
    ),
    edges AS (
        SELECT v,
               SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cc,
               SUM(cnt) OVER () AS n
        FROM grid
    ),
    dec AS MATERIALIZED (
        SELECT CAST(d.range + 1 AS BIGINT) AS q,
               MIN(e.v) AS edge
        FROM range({_NB} - 1) d JOIN edges e
          ON e.cc * {_NB} >= (d.range + 1) * e.n
        GROUP BY d.range
    ),
    binned AS MATERIALIZED (
        SELECT x.we,
               CAST(COALESCE((SELECT COUNT(*) FROM dec
                              WHERE dec.edge < x.v), 0) AS BIGINT) AS b
        FROM x
    ),
    counts AS MATERIALIZED (
        SELECT we, b, COUNT(*) AS c FROM binned GROUP BY we, b
    ),
    bins AS MATERIALIZED (SELECT CAST(range AS BIGINT) AS b FROM range({_NB})),
    amarg AS MATERIALIZED (
        SELECT bins.b AS i,
               COALESCE((SELECT (c * CAST(1000000000 AS BIGINT))
                                // (SELECT SUM(c) FROM counts WHERE we = 1)
                         FROM counts WHERE we = 1 AND counts.b = bins.b),
                        0) AS a_nano
        FROM bins
    ),
    bmarg AS MATERIALIZED (
        SELECT bins.b AS j,
               COALESCE((SELECT (c * CAST(1000000000 AS BIGINT))
                                // (SELECT SUM(c) FROM counts WHERE we = 0)
                         FROM counts WHERE we = 0 AND counts.b = bins.b),
                        0) AS b_nano
        FROM bins
    ),
    kmat AS MATERIALIZED (
        SELECT CAST(p.range // {_NB} AS BIGINT) AS i,
               CAST(p.range % {_NB} AS BIGINT) AS j,
               ([{",".join(str(k) for k in _K_NANO)}])
                   [CAST(ABS(p.range // {_NB} - p.range % {_NB}) + 1 AS INT)]
                   AS kn
        FROM range({_NB} * {_NB}) p
    ),
    v0 AS MATERIALIZED (SELECT CAST(range AS BIGINT) AS j,
                  CAST(1000000000 AS BIGINT) AS v_nano
           FROM range({_NB})),
    {",".join(_sink_iter_sql(t) for t in range(_T))},
    plan AS (
        SELECT k.i, k.j,
               CAST(u.u_nano AS HUGEINT) * k.kn * v.v_nano AS p_scaled,
               ABS(k.i - k.j) AS cost
        FROM kmat k
        JOIN u{_T} u ON u.i = k.i
        JOIN v{_T} v ON v.j = k.j
    )
    SELECT CAST({_NB} AS BIGINT) AS n_bins,
           CAST({_T} AS BIGINT) AS iterations,
           ROUND(SUM(p_scaled) / 1e27, 6) AS total_mass,
           ROUND(SUM(cost * p_scaled) / 1e27, 6) AS sinkhorn_cost
    FROM plan
    """,
)
def sim_sinkhorn_ot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropic optimal transport (Cuturi, NeurIPS 2013) between the
    weekend and weekday spend distributions: pooled-decile histograms as
    the two marginals, ground cost |i−j| between bins, Gibbs kernel
    exp(−C/ε) at ε = 1, six Sinkhorn-Knopp scaling iterations, and the
    transported cost ⟨C, diag(u)·K·diag(v)⟩ — the differentiable
    distribution distance modern corpus-matching pipelines use where a
    plain KL ignores bin adjacency.

    Determinism: the kernel is a PYTHON-computed nano-int literal table
    (no engine libm exp in the loop); marginals, scalings and the plan
    are exact integer arithmetic with 128-bit interim products (HUGEINT
    / decimal(38,0)); two closing divisions round 6dp — the wave366
    integer-fixed-point idiom applied to matrix scaling.

    Scale shape: the corpus collapses to a distinct-value grid (decile
    edges) and a 2×10 histogram; everything after is constant-size
    (100-cell kernel, 10-row scalings per iteration).

    r11: the collapsed frames (counts, marginals, kernel, and each
    iteration's u/v) are localCheckpoint-truncated (the wave124 idiom) —
    un-truncated, every one of the 6 unrolled iterations re-expanded the
    whole upstream logical subtree at each of its 2-3 references, and
    Catalyst analysis, not execution, was the query: measured 35-49 s at
    sf0.01 for ~1 s of task work; ~2 s truncated. Checkpointing
    materializes identical 10/100-row frames — values unchanged."""
    x = table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("v"),
        F.when(F.dayofweek(F.col("ts").cast("date")).isin(1, 7), 1)
        .otherwise(0)
        .alias("we"),
    )
    grid = x.groupBy("v").agg(F.count("*").alias("cnt"))
    wv = Window.orderBy("v")
    edges = grid.select(
        "v",
        F.sum("cnt").over(wv.rowsBetween(Window.unboundedPreceding, 0)).alias("cc"),
        F.sum("cnt")
        .over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    dec = (
        spark.range(_NB - 1)
        .select((F.col("id") + 1).alias("q"))
        .join(
            edges,
            F.col("cc") * _NB >= F.col("q") * F.col("n"),
        )
        .groupBy("q")
        .agg(F.min("v").alias("edge"))
    )
    binned = x.crossJoin(
        F.broadcast(dec.agg(F.sort_array(F.collect_list("edge")).alias("es")))
    ).select(
        "we",
        F.expr("CAST(size(filter(es, e -> e < v)) AS BIGINT)").alias("b"),
    )
    counts = (
        binned.groupBy("we", "b")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)  # <= 2*NB rows; one corpus pass
    )
    bins = spark.range(_NB).select(F.col("id").alias("b"))

    def marg(we: int, out_idx: str, out_col: str) -> DataFrame:
        side = counts.where(F.col("we") == we)
        tot = side.agg(F.sum("c").alias("tot"))
        return (
            bins.join(F.broadcast(side.select("b", "c")), "b", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                F.col("b").alias(out_idx),
                F.coalesce(
                    F.expr("(c * 1000000000L) div tot"), F.lit(0)
                ).alias(out_col),
            )
        )

    amarg = marg(1, "i", "a_nano").localCheckpoint(eager=True)  # NB rows
    bmarg = marg(0, "j", "b_nano").localCheckpoint(eager=True)  # NB rows
    karr = F.array(*[F.lit(k) for k in _K_NANO])
    kmat = spark.range(_NB * _NB).select(
        (F.col("id") / _NB).cast("long").alias("i"),
        (F.col("id") % _NB).cast("long").alias("j"),
        F.element_at(
            karr,
            (
                F.abs((F.col("id") / _NB).cast("long") - F.col("id") % _NB) + 1
            ).cast("int"),
        ).alias("kn"),
    ).localCheckpoint(eager=True)  # NB*NB rows, referenced 2x per iteration
    v = bins.select(
        F.col("b").alias("j"), F.lit(1_000_000_000).cast("long").alias("v_nano")
    )
    dec38 = "decimal(38,0)"
    for _ in range(_T):
        su = (
            kmat.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(
                F.sum(F.col("kn").cast(dec38) * F.col("v_nano")).alias("s")
            )
        )
        au = F.col("a_nano").cast(dec38) * F.lit(1000000000000000000).cast(dec38)
        u = (
            amarg.join(F.broadcast(su), "i")
            .select(
                "i",
                ((au - au % F.col("s")) / F.col("s")).cast("long").alias("u_nano"),
            )
            .localCheckpoint(eager=True)
        )
        sv = (
            kmat.join(F.broadcast(u), "i")
            .groupBy("j")
            .agg(
                F.sum(F.col("kn").cast(dec38) * F.col("u_nano")).alias("s")
            )
        )
        bu = F.col("b_nano").cast(dec38) * F.lit(1000000000000000000).cast(dec38)
        v = (
            bmarg.join(F.broadcast(sv), "j")
            .select(
                "j",
                ((bu - bu % F.col("s")) / F.col("s")).cast("long").alias("v_nano"),
            )
            .localCheckpoint(eager=True)
        )
    plan = (
        kmat.join(F.broadcast(u), "i")
        .join(F.broadcast(v), "j")
        .select(
            (
                F.col("u_nano").cast(dec38)
                * F.col("kn").cast(dec38)
                * F.col("v_nano").cast(dec38)
            ).alias("p_scaled"),
            F.abs(F.col("i") - F.col("j")).cast(dec38).alias("cost"),
        )
    )
    return plan.agg(
        F.lit(_NB).cast("long").alias("n_bins"),
        F.lit(_T).cast("long").alias("iterations"),
        F.round(F.sum("p_scaled").cast("double") / 1e27, 6).alias("total_mass"),
        F.round(
            F.sum(F.col("cost") * F.col("p_scaled")).cast("double") / 1e27, 6
        ).alias("sinkhorn_cost"),
    )


@query(
    "agg_welch_anova",
    oracle="""
    WITH x AS (
        SELECT event_type AS g, CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type IN ('purchase', 'click', 'view')
    ),
    moms AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               AVG(CAST(v AS DOUBLE)) AS m,
               (SUM(CAST(v AS DOUBLE) * v)
                - SUM(CAST(v AS DOUBLE)) * SUM(CAST(v AS DOUBLE)) / COUNT(*))
                   / (COUNT(*) - 1) AS s2
        FROM x GROUP BY g
    ),
    wts AS (
        SELECT g, n, m, s2, n / s2 AS w FROM moms
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(w) AS sw,
               SUM(w * m) AS swm
        FROM wts
    )
    SELECT t.k AS k_groups,
           ROUND((SELECT SUM(w.w * (w.m - t.swm / t.sw)
                              * (w.m - t.swm / t.sw)) FROM wts w)
                 / (t.k - 1)
                 / (1.0 + 2.0 * (t.k - 2) / (t.k * t.k - 1.0)
                    * (SELECT SUM((1.0 - w.w / t.sw) * (1.0 - w.w / t.sw)
                                  / (w.n - 1)) FROM wts w)), 6)
               AS welch_f,
           ROUND((t.k * t.k - 1.0) / 3.0
                 / (SELECT SUM((1.0 - w.w / t.sw) * (1.0 - w.w / t.sw)
                               / (w.n - 1)) FROM wts w), 6) AS df2
    FROM tot t
    """,
)
def agg_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA (Biometrika 1951) across
    the purchase/click/view value distributions — the omnibus companion
    to wave367's Games-Howell pairs: groups weighted by n_j/s_j², the
    weighted grand mean, F* with Welch's small-sample correction in the
    denominator, and the Satterthwaite-style df₂ = (k²−1)/(3·Σ(1−w/Σw)²
    /(n_j−1)).

    Determinism: cents-exact moments (the integer-sum argument: all
    partial sums are exact doubles below 2⁵³); the F* fold is a fixed
    double chain over the 3-row weight frame; ROUND 6.

    Scale shape: one conditional groupBy collapse; everything after is
    a 3-row broadcast fold."""
    x = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "click", "view"))
        .select(
            F.col("event_type").alias("g"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
    )
    vd = F.col("v").cast("double")
    moms = x.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.avg(vd).alias("m"),
        (
            (F.sum(vd * F.col("v")) - F.sum(vd) * F.sum(vd) / F.count("*"))
            / (F.count("*") - 1)
        ).alias("s2"),
    )
    wts = moms.select("g", "n", "m", (F.col("n") / F.col("s2")).alias("w"), "s2")
    tot = wts.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("m")).alias("swm"),
    )
    j = wts.crossJoin(F.broadcast(tot))
    gm = F.col("swm") / F.col("sw")
    lam = (1.0 - F.col("w") / F.col("sw")) * (1.0 - F.col("w") / F.col("sw")) / (
        F.col("n") - 1
    )
    folded = j.groupBy("k").agg(
        F.sum(F.col("w") * (F.col("m") - gm) * (F.col("m") - gm)).alias("num"),
        F.sum(lam).alias("lam"),
    )
    return folded.select(
        F.col("k").alias("k_groups"),
        F.round(
            F.col("num")
            / (F.col("k") - 1)
            / (
                1.0
                + 2.0
                * (F.col("k") - 2)
                / (F.col("k") * F.col("k") - 1.0)
                * F.col("lam")
            ),
            6,
        ).alias("welch_f"),
        F.round(
            (F.col("k") * F.col("k") - 1.0) / 3.0 / F.col("lam"), 6
        ).alias("df2"),
    )
