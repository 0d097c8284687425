"""Wave-362/363 semantics: Elo replay vs python fold, Littlewood
optimality, Kemeny exhaustive-minimum, Törnqvist index identities."""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.operators.wave362 import _ELO_K, _fide_pct
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_elo_replay_matches_python_fold(spark):
    daily = sorted(
        (r["day"], r["c"], r["p"])
        for r in table(spark, SF, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "p"
            ),
        )
        .collect()
    )
    d = 0
    expect = {}
    for day, c, p in daily:
        s = 100 if c > p else (0 if c < p else 50)
        a = d // 1000 if d >= 0 else (-d) // 1000
        e = _fide_pct(a) if d >= 0 else 100 - _fide_pct(a)
        d += _ELO_K * 10 * (s - e)
        expect[day.strftime("%Y-%m-%d")] = (s, 1500000 + d, 1500000 - d)
    rows = QUERIES["model_elo_replay"](spark, SF).collect()
    assert len(rows) == len(expect)
    for r in rows:
        s, rc, rp = expect[r["day"]]
        assert (r["s_click_pct"], r["r_click_milli"], r["r_purchase_milli"]) == (
            s,
            rc,
            rp,
        )
    # zero-sum invariant: ratings always mirror around 1500
    assert all(r["r_click_milli"] + r["r_purchase_milli"] == 3000000 for r in rows)


def test_littlewood_protection_is_optimal_fractile(spark):
    row = QUERIES["opt_littlewood_protection"](spark, SF).first()
    demands = [
        r["dh"]
        for r in table(spark, SF, "orders")
        .groupBy("o_orderdate")
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0)
            ).alias("dh")
        )
        .collect()
    ]
    n = len(demands)
    assert row["n_days"] == n
    r_crit = row["fare_low"] / row["fare_high"]
    ystar = row["protection_level"]

    def cdf(y):
        return sum(1 for v in demands if v <= y) / n

    # y* is the SMALLEST y with F(y) >= 1 - r  (discrete critical fractile)
    assert cdf(ystar) >= 1 - r_crit - 1e-9
    assert all(
        cdf(y) < 1 - r_crit - 1e-9 for y in sorted(set(demands)) if y < ystar
    )
    # expected-marginal-revenue optimality on the empirical distribution:
    # protecting y* maximizes f_h*E[min(D,y)] + f_l*(y_max - y) ... the
    # discrete marginal condition: f_h * P(D > y) >= f_l for y < y*, < for y >= y*
    fh, fl = row["fare_high"], row["fare_low"]
    surv = lambda y: sum(1 for v in demands if v > y) / n
    if ystar > 0:
        assert fh * surv(ystar - 1) >= fl - 1e-6
    assert fh * surv(ystar) < fl + 1e-6


def test_kemeny_is_exhaustive_minimum(spark):
    daily = {}
    for r in (
        table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(F.count("*").alias("c"))
        .collect()
    ):
        daily.setdefault(r["day"], {})[r["event_type"]] = r["c"]
    names = sorted({t for d in daily.values() for t in d})
    m = len(names)
    w = {}
    for d in daily.values():
        for i, a in enumerate(names):
            for j, b in enumerate(names):
                if i != j and a in d and b in d and d[a] > d[b]:
                    w[(i, j)] = w.get((i, j), 0) + 1

    def score(perm):
        pos = {c: k for k, c in enumerate(perm)}
        return sum(
            wt for (a, b), wt in w.items() if pos[b] < pos[a]
        )

    best = min((score(p), p) for p in permutations(range(m)))
    row = QUERIES["model_kemeny_ranking"](spark, SF).first()
    assert row["kemeny_score"] == best[0]
    assert row["consensus_order"] == ">".join(names[i] for i in best[1])


def test_tornqvist_index_identities(spark):
    """Mean-value theorems that hold EXACTLY for any data (the Diewert
    'close approximation' result needs smooth price-quantity correlation,
    which synthetic random unit prices don't have):
    - every index is a (generalized) mean of the per-part price relatives
      p1/p0, so it lies within [min relative, max relative];
    - Marshall-Edgeworth is a CONVEX COMBINATION of Laspeyres and Paasche
      (ME = (L*p0q0 + P*p0q1) / (p0q0 + p0q1)), so it lies between them."""
    row = QUERIES["agg_price_index_tornqvist"](spark, SF).first()
    fisher = QUERIES["agg_price_index_fisher"](spark, SF).first()
    assert row["n_parts"] > 0
    # per-part price relatives (same construction as the query)
    li = (
        table(spark, SF, "lineitem")
        .join(table(spark, SF, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("l_partkey").alias("pk"),
            F.when(F.col("o_orderdate") < F.lit("1995-06-17").cast("date"), 0)
            .otherwise(1)
            .alias("period"),
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("price"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .groupBy("pk", "period")
        .agg((F.sum(F.col("price") * F.col("qty")) / F.sum("qty")).alias("p"))
        .groupBy("pk")
        .agg(
            F.max(F.when(F.col("period") == 0, F.col("p"))).alias("p0"),
            F.max(F.when(F.col("period") == 1, F.col("p"))).alias("p1"),
            F.countDistinct("period").alias("np"),
        )
        .where(F.col("np") == 2)
        .select((F.col("p1") / F.col("p0")).alias("rel"))
        .agg(F.min("rel").alias("lo"), F.max("rel").alias("hi"))
        .first()
    )
    lo, hi = li["lo"] - 1e-9, li["hi"] + 1e-9
    for col in ("tornqvist", "walsh", "marshall_edgeworth"):
        assert lo <= row[col] <= hi, (col, row[col], lo, hi)
    d = fisher.asDict()
    lp_lo, lp_hi = sorted((d["laspeyres"], d["paasche"]))
    assert lp_lo - 1e-6 <= row["marshall_edgeworth"] <= lp_hi + 1e-6
