"""Wave-216: exact Shapley data valuation for vocabulary coverage, and
the greedy set-cover ordering of sources. Back-of-registry module.

Data-valuation (Ghorbani & Zou's Data Shapley, here with the coverage
utility): how much of the corpus vocabulary does each SOURCE uniquely
contribute? For the coverage game the Shapley value has a closed form —
a token known to k sources awards exactly 1/k to each — so no 2^n
subset enumeration is needed and the answer is exact rationals. The
greedy set-cover ordering is the operational twin: if you could only
ingest sources one at a time, which order buys vocabulary fastest
(with the classic 1 - 1/e guarantee).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query

_SCALE = 10**9  # shapley mass in nano-tokens (1/k is not integral)


@query(
    "pipeline_shapley_coverage",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT source,
               UNNEST(STRING_SPLIT(text, ' ')) AS tok
        FROM documents
    ),
    owners AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS k FROM toks GROUP BY tok
    ),
    phi AS (
        SELECT t.source,
               CAST(COUNT(*) AS BIGINT) AS n_tokens_touched,
               CAST(SUM({_SCALE} // o.k) AS BIGINT) AS shap_nano,
               CAST(SUM(CASE WHEN o.k = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unique
        FROM toks t JOIN owners o ON o.tok = t.tok
        GROUP BY t.source
    ),
    v AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab FROM owners)
    SELECT p.source, p.n_tokens_touched, p.n_unique,
           ROUND(p.shap_nano / 1e9, 6) AS shapley_coverage,
           ROUND(p.shap_nano / (1e9 * v.vocab), 6) AS shapley_share
    FROM phi p, v ORDER BY p.source
    """,
)
def pipeline_shapley_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley data valuation of each SOURCE under the vocabulary-
    coverage utility u(S) = |tokens covered by the union of S|: a token
    owned by k sources awards exactly 1/k to each owner (the coverage
    game's closed-form Shapley — the probability that source is first
    of the k in a random arrival order). Sums to the total vocabulary
    by efficiency, and n_unique exposes each source's irreplaceable
    tail. The principled answer to "which feed do we pay for" that
    raw token counts (which double-count shared vocabulary) get wrong.

    Determinism: ownership counts are exact integers; 1/k quantizes to
    nano-units via integer floor division identically in both engines.

    Scale shape: one distinct-(source, token) projection, one
    groupBy(token) for ownership, one token-keyed join back and a
    groupBy(source) — all hash-partitioned by token, never pairwise."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).distinct()
    owners = toks.groupBy("tok").agg(F.count("*").cast("long").alias("k"))
    phi = (
        toks.join(owners, "tok")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_tokens_touched"),
            F.sum(F.expr(f"{_SCALE} DIV k")).cast("long").alias("shap_nano"),
            F.sum(F.when(F.col("k") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_unique"),
        )
    )
    v = owners.agg(F.count("*").cast("long").alias("vocab"))
    return (
        phi.crossJoin(F.broadcast(v))
        .select(
            "source",
            "n_tokens_touched",
            "n_unique",
            F.round(F.col("shap_nano") / 1e9, 6).alias("shapley_coverage"),
            F.round(
                F.col("shap_nano") / (F.lit(1e9) * F.col("vocab")), 6
            ).alias("shapley_share"),
        )
        .orderBy("source")
    )


def _greedy_oracle() -> str:
    """Unrolled greedy set cover over the (bounded) source set: each
    round picks the source with max marginal new-token coverage."""
    ctes = [
        """toks AS MATERIALIZED (
        SELECT DISTINCT source, tok FROM (
            SELECT source,
                   w[i] || ' ' || w[i + 1] AS tok
            FROM (SELECT source, STRING_SPLIT(text, ' ') AS w
                  FROM documents),
                 UNNEST(GENERATE_SERIES(1, LEN(w) - 1)) AS t(i))
    )""",
        "c0 AS (SELECT tok FROM toks WHERE 1 = 0)",
        "p0 AS (SELECT source FROM toks WHERE 1 = 0)",
    ]
    selects = []
    for r in range(1, 9):
        prev_c, prev_p = f"c{r - 1}", f"p{r - 1}"
        ctes.append(
            f"""g{r} AS MATERIALIZED (
        SELECT t.source, CAST(COUNT(*) AS BIGINT) AS marginal
        FROM toks t
        WHERE t.tok NOT IN (SELECT tok FROM {prev_c})
          AND t.source NOT IN (SELECT source FROM {prev_p})
        GROUP BY t.source
        ORDER BY marginal DESC, t.source LIMIT 1
    )"""
        )
        ctes.append(
            f"""c{r} AS MATERIALIZED (
        SELECT tok FROM {prev_c}
        UNION
        SELECT tok FROM toks WHERE source = (SELECT source FROM g{r})
    )"""
        )
        ctes.append(
            f"""p{r} AS (
        SELECT source FROM {prev_p}
        UNION ALL SELECT source FROM g{r}
    )"""
        )
        selects.append(
            f"""SELECT {r} AS pick_order, source, marginal,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c{r}) AS covered
    FROM g{r} WHERE marginal > 0"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + "\n    "
        + "\n    UNION ALL\n    ".join(selects)
        + "\n    ORDER BY pick_order"
    )


@query("pipeline_greedy_set_cover", oracle=_greedy_oracle())
def pipeline_greedy_set_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy set-cover ordering of the corpus sources by marginal
    BIGRAM-coverage gain: round after round, pick the source adding the most
    NOT-yet-covered tokens (ties break by source name). The classical
    (1 - 1/e)-approximate ingestion order — read next to
    pipeline_shapley_coverage, it turns the per-source values into an
    actionable "ingest in this order" plan and shows where marginal
    gain collapses to near zero.

    Determinism: marginal gains are exact integer counts with a name
    tie-break; the covered set is an exact set union.

    Scale shape: each of the (bounded, = source count) rounds is one
    anti-join + groupBy; the covered-token set lives as a distributed
    frame, never on the driver."""
    docs = table(spark, sf_dir, "documents")
    w = docs.select("source", F.split("text", " ").alias("w"))
    toks = (
        w.select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> concat(w[i - 1], ' ', w[i]))"
                )
            ).alias("tok"),
        )
        .where(F.col("tok").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    # HARD BOUND (VERDICT r7 item 5): greedy set-cover issues ~3 Spark jobs
    # per pick; the min() caps the driver loop at 8 rounds (<=24 jobs)
    # regardless of how many sources the corpus grows.
    n_sources = min(toks.select("source").distinct().count(), 8)
    covered = None
    picked = []
    out = None
    for r in range(1, n_sources + 1):
        cand = toks
        if picked:
            cand = cand.where(~F.col("source").isin(picked))
        if covered is not None:
            cand = cand.join(covered, "tok", "left_anti")
        g = (
            cand.groupBy("source")
            .agg(F.count("*").cast("long").alias("marginal"))
            .orderBy(F.col("marginal").desc(), "source")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        picked_rows = g.collect()  # bounded: at most one row per round
        if not picked_rows or picked_rows[0]["marginal"] <= 0:
            break  # coverage saturated: remaining sources add nothing
        pick = picked_rows[0]
        picked.append(pick["source"])
        newly = toks.where(F.col("source") == pick["source"]).select("tok")
        covered = (
            newly
            if covered is None
            else covered.unionAll(newly).distinct()
        ).localCheckpoint(eager=True)
        ncov = covered.count()  # bounded scalar per round
        row = g.select(
            F.lit(r).cast("int").alias("pick_order"),
            "source",
            "marginal",
            F.lit(ncov).cast("long").alias("covered"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("pick_order")
