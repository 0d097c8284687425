"""Wave-100: Tukey median polish in exact integers, blocking-quality
metrics for fuzzy dedup, and instrumental-variable 2SLS estimation.
Back-of-registry module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "agg_median_polish",
    oracle="""
    WITH cell AS (
        SELECT n_name, o_orderstatus AS st,
               CAST(MEDIAN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS v
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
        GROUP BY n_name, o_orderstatus
        HAVING COUNT(*) % 2 = 1
    ),
    full_rows AS (
        SELECT n_name FROM cell GROUP BY n_name HAVING COUNT(*) = 3
    ),
    g AS (SELECT c.* FROM cell c JOIN full_rows USING (n_name)),
    r1 AS (
        SELECT n_name, v AS re FROM (
            SELECT n_name, v,
                   ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY v, st) AS rn,
                   COUNT(*) OVER (PARTITION BY n_name) AS c
            FROM g) s WHERE rn = (c + 1) // 2
    ),
    g1 AS (
        SELECT g.n_name, st, v - re AS v FROM g JOIN r1 USING (n_name)
    ),
    c1 AS (
        SELECT st, v AS ce FROM (
            SELECT st, v,
                   ROW_NUMBER() OVER (PARTITION BY st ORDER BY v, n_name) AS rn,
                   COUNT(*) OVER (PARTITION BY st) AS c
            FROM g1) s WHERE rn = (c + 1) // 2
    ),
    g2 AS (SELECT n_name, g1.st, v - ce AS v FROM g1 JOIN c1 USING (st)),
    r2 AS (
        SELECT n_name, v AS re FROM (
            SELECT n_name, v,
                   ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY v, st) AS rn,
                   COUNT(*) OVER (PARTITION BY n_name) AS c
            FROM g2) s WHERE rn = (c + 1) // 2
    ),
    g3 AS (SELECT g2.n_name, st, v - re AS v FROM g2 JOIN r2 USING (n_name)),
    c2 AS (
        SELECT st, v AS ce FROM (
            SELECT st, v,
                   ROW_NUMBER() OVER (PARTITION BY st ORDER BY v, n_name) AS rn,
                   COUNT(*) OVER (PARTITION BY st) AS c
            FROM g3) s WHERE rn = (c + 1) // 2
    ),
    g4 AS (SELECT n_name, g3.st, v - ce AS v FROM g3 JOIN c2 USING (st))
    SELECT r1.n_name,
           CAST(r1.re + r2.re AS BIGINT) AS row_effect_cents,
           CAST(MAX(CASE WHEN st = 'F' THEN v END) AS BIGINT) AS resid_f,
           CAST(MAX(CASE WHEN st = 'O' THEN v END) AS BIGINT) AS resid_o,
           CAST(MAX(CASE WHEN st = 'P' THEN v END) AS BIGINT) AS resid_p
    FROM g4
    JOIN r1 ON r1.n_name = g4.n_name
    JOIN r2 ON r2.n_name = g4.n_name
    GROUP BY r1.n_name, r1.re, r2.re
    ORDER BY r1.n_name
    """,
)
def agg_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey median polish (EDA, 1977, public) of the nation x
    order-status median-value grid: alternately sweep out row and
    column medians (two full iterations) to decompose the two-way table
    into row effects + column effects + residuals — the robust
    two-way-ANOVA alternative that exposes interaction cells without
    being dragged by outliers. Cells are the exact per-group MEDIAN of
    integer cents, restricted to odd-count cells and complete rows so
    every median is an attained value.

    Determinism: base-cell medians are odd-count (attained integers)
    and every sweep median is a rank-SELECTED lower median (element at
    (c+1)//2), so the entire polish — medians, subtractions, residuals
    — stays in exact BIGINT arithmetic end to end; no float exists
    anywhere.

    Scale shape: one groupBy to the 75-cell grid (median via the
    engine's percentile machinery over each keyed group); every
    subsequent sweep runs on grid-sized data."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cell = (
        table(spark, sf_dir, "orders")
        .join(
            F.broadcast(table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(table(spark, sf_dir, "nation").select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.col("o_orderstatus").alias("st"))
        .agg(
            F.median(cents).cast("long").alias("v"),
            F.count("*").alias("cnt"),
        )
        .where(F.col("cnt") % 2 == 1)
        .drop("cnt")
    )
    # r11 lineage truncation (wave124 idiom): cell is the only corpus-sized
    # work (orders x customer groupBy + median); every polish sweep
    # references its input twice (the frame and its sweep median), so g4
    # otherwise embeds the cell subtree ~2^5 times. Checkpointing the
    # <=75-row grid (and each grid-sized sweep output below) makes the
    # polish run on leaves. Values are unchanged — pure materialization.
    cell = cell.localCheckpoint(eager=True)
    full_rows = cell.groupBy("n_name").agg(F.count("*").alias("k")).where(F.col("k") == 3)
    g = cell.join(full_rows.select("n_name"), "n_name")

    def lower_median(df, key, tiebreak, out_col):
        # exact SELECTED lower median: element at rank (c+1)//2 — never an
        # interpolated half-value, so the polish stays in integers even
        # when a group has an even member count
        w = Window.partitionBy(key).orderBy("v", tiebreak)
        wc = Window.partitionBy(key)
        return (
            df.select(
                key,
                "v",
                F.row_number().over(w).alias("rn"),
                F.count("*").over(wc).alias("c"),
            )
            .where(F.col("rn") == F.expr("(c + 1) div 2"))
            .select(key, F.col("v").alias(out_col))
        )

    def row_sweep(df):
        re = lower_median(df, "n_name", "st", "re")
        out = df.join(re, "n_name").select(
            "n_name", "st", (F.col("v") - F.col("re")).alias("v")
        )
        return out.localCheckpoint(eager=True), re

    def col_sweep(df):
        ce = lower_median(df, "st", "n_name", "ce")
        return df.join(ce, "st").select(
            "n_name", "st", (F.col("v") - F.col("ce")).alias("v")
        ).localCheckpoint(eager=True)

    g1, r1 = row_sweep(g)
    g2 = col_sweep(g1)
    g3, r2 = row_sweep(g2)
    g4 = col_sweep(g3)
    effects = r1.withColumnRenamed("re", "re1").join(
        r2.withColumnRenamed("re", "re2"), "n_name"
    )
    return (
        g4.groupBy("n_name")
        .agg(
            F.max(F.when(F.col("st") == "F", F.col("v"))).cast("long").alias("resid_f"),
            F.max(F.when(F.col("st") == "O", F.col("v"))).cast("long").alias("resid_o"),
            F.max(F.when(F.col("st") == "P", F.col("v"))).cast("long").alias("resid_p"),
        )
        .join(effects, "n_name")
        .select(
            "n_name",
            (F.col("re1") + F.col("re2")).cast("long").alias("row_effect_cents"),
            "resid_f",
            "resid_o",
            "resid_p",
        )
        .orderBy("n_name")
    )


@query(
    "dedup_blocking_quality",
    oracle="""
    WITH sub AS (
        SELECT s_suppkey AS k, s_name AS nm FROM supplier
    ),
    truth AS (
        SELECT a.k AS ka, b.k AS kb
        FROM sub a JOIN sub b ON a.k < b.k
        WHERE levenshtein(a.nm, b.nm) <= 1
    ),
    blocked AS (
        SELECT DISTINCT a.k AS ka, b.k AS kb
        FROM sub a JOIN sub b
          ON a.k < b.k
         AND (SUBSTR(a.nm, 1, LENGTH(a.nm) // 2)
                  = SUBSTR(b.nm, 1, LENGTH(b.nm) // 2)
              OR SUBSTR(a.nm, LENGTH(a.nm) // 2 + 1)
                  = SUBSTR(b.nm, LENGTH(b.nm) // 2 + 1))
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items FROM sub),
    counts AS (
        SELECT
          CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
          CAST((SELECT COUNT(*) FROM blocked) AS BIGINT) AS n_candidates,
          CAST((SELECT COUNT(*) FROM truth t
                JOIN blocked bl ON bl.ka = t.ka AND bl.kb = t.kb) AS BIGINT)
              AS n_found
    )
    SELECT n_items, n_true, n_candidates, n_found,
           ROUND(n_found * 1.0 / n_true, 6) AS pair_completeness,
           ROUND(1 - n_candidates * 2.0 / (n_items * (n_items - 1)), 6)
               AS reduction_ratio
    FROM counts, n
    """,
)
def dedup_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality audit (the record-linkage evaluation pair
    from Christen's framework, public): for the half-string blocking
    scheme used by dedup_fuzzy_names, measure PAIR COMPLETENESS (what
    fraction of true levenshtein<=1 pairs survive blocking — it must be
    1.0 here, since an edit distance of 1 leaves at least one exact
    half) and REDUCTION RATIO (what fraction of the quadratic pair
    space blocking prunes) — the two numbers that justify any blocking
    key before it ships.

    Determinism: pure set counting on exact pairs; two divisions
    rounded 6dp. The quadratic 'truth' join is the AUDIT, bounded by
    the supplier dimension (the oracle of the production blocking, not
    its plan).

    Scale shape: the blocked-candidates join is the production shape
    (equi-join on each half key); the truth join is dimension-sized by
    design."""
    sub = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"), F.col("s_name").alias("nm")
    )
    a = sub.select(F.col("k").alias("ka"), F.col("nm").alias("na"))
    b = sub.select(F.col("k").alias("kb"), F.col("nm").alias("nb"))
    truth = a.join(
        b,
        (F.col("ka") < F.col("kb"))
        & (F.levenshtein(F.col("na"), F.col("nb")) <= 1),
    ).select("ka", "kb")
    half_a1 = F.substring(F.col("na"), 1, (F.length("na") / 2).cast("int"))
    half_b1 = F.substring(F.col("nb"), 1, (F.length("nb") / 2).cast("int"))
    half_a2 = F.col("na").substr(
        (F.length("na") / 2).cast("int") + 1, F.length("na")
    )
    half_b2 = F.col("nb").substr(
        (F.length("nb") / 2).cast("int") + 1, F.length("nb")
    )
    blocked = (
        a.join(
            b,
            (F.col("ka") < F.col("kb")) & ((half_a1 == half_b1) | (half_a2 == half_b2)),
        )
        .select("ka", "kb")
        .distinct()
    )
    # the four cardinalities folded in as 1-row broadcasts — one deferred
    # plan, no build-time count jobs (VERDICT r8 item 7)
    nif = sub.agg(F.count("*").cast("long").alias("n_items"))
    ntf = truth.agg(F.count("*").cast("long").alias("n_true"))
    ncf = blocked.agg(F.count("*").cast("long").alias("n_candidates"))
    nff = (
        truth.join(blocked, ["ka", "kb"])
        .agg(F.count("*").cast("long").alias("n_found"))
    )
    return (
        nif.crossJoin(F.broadcast(ntf))
        .crossJoin(F.broadcast(ncf))
        .crossJoin(F.broadcast(nff))
        .select(
            "n_items",
            "n_true",
            "n_candidates",
            "n_found",
            F.when(
                F.col("n_true") > 0,
                F.round(F.col("n_found") / F.col("n_true").cast("double"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("pair_completeness"),
            F.round(
                1
                - F.col("n_candidates")
                * 2.0
                / (F.col("n_items") * (F.col("n_items") - 1)),
                6,
            ).alias("reduction_ratio"),
        )
    )


@query(
    "model_iv_2sls",
    oracle="""
    WITH x AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS z,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS xv,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(z) AS BIGINT) AS sz,
               CAST(SUM(xv) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(z * xv) AS BIGINT) AS szx,
               CAST(SUM(z * y) AS BIGINT) AS szy,
               CAST(SUM(CAST(xv AS HUGEINT) * xv) AS DOUBLE) AS sxx
        FROM x
    )
    SELECT n,
           ROUND((CAST(n AS DOUBLE) * szy - CAST(sz AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * szx - CAST(sz AS DOUBLE) * sx) * 1e6, 6)
               AS beta_iv_per_1e6,
           ROUND((CAST(n AS DOUBLE) * szx - CAST(sz AS DOUBLE) * sx)
                 / (CAST(n AS DOUBLE) * sz - CAST(sz AS DOUBLE) * sz) / 100, 4)
               AS first_stage_effect,
           ROUND((CAST(n AS DOUBLE) * szy - CAST(sz AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sz - CAST(sz AS DOUBLE) * sz), 6)
               AS reduced_form_effect
    FROM m
    """,
)
def model_iv_2sls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumental-variables estimation (Wright 1928 / two-stage least
    squares, public) with a single binary instrument — the Wald
    estimator beta_IV = cov(z,y)/cov(z,x): urgent-priority flag as the
    instrument, order value as the endogenous regressor, fulfilled
    status as the outcome. Also reports the first stage (does the
    instrument move x?) and the reduced form (does it move y?) — the
    two regressions every IV analysis must show. Completes the causal
    family (DiD, CUPED, matching) with the unmeasured-confounding
    design.

    Determinism: all cross-moments are exact integers (x² in
    HUGEINT/DECIMAL(38,0) though only reported effects need it); the
    three effects are fixed double ratios of n-scaled covariances,
    rounded for display (beta scaled per 1e6 cents for legibility).

    Scale shape: one projection + one scalar moment aggregate —
    map-side combined, single pass, any number of instruments adds
    columns only."""
    x = table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).cast("long").alias("z"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("xv"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).cast("long").alias("y"),
    )
    m = x.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("z").cast("long").alias("sz"),
        F.sum("xv").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("z") * F.col("xv")).cast("long").alias("szx"),
        F.sum(F.col("z") * F.col("y")).cast("long").alias("szy"),
        F.sum(F.col("xv").cast("decimal(38,0)") * F.col("xv")).cast("double").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    szd, sxd, syd = (F.col(c).cast("double") for c in ("sz", "sx", "sy"))
    cov_zy = nd * F.col("szy") - szd * syd
    cov_zx = nd * F.col("szx") - szd * sxd
    var_z = nd * F.col("sz") - szd * szd
    return m.select(
        "n",
        F.round(cov_zy / cov_zx * 1e6, 6).alias("beta_iv_per_1e6"),
        F.round(cov_zx / var_z / 100, 4).alias("first_stage_effect"),
        F.round(cov_zy / var_z, 6).alias("reduced_form_effect"),
    )
