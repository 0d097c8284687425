"""Wave-332: Allan variance / Hjorth-Petrosian / secretary rule vs
python replays of the daily series and the order arrival sequence."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily(spark):
    rows = table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d", "CAST(ROUND(value*100) AS LONG) AS p"
    ).collect()
    agg = {}
    for r in rows:
        n, s = agg.get(r["d"], (0, 0))
        agg[r["d"]] = (n + 1, s + r["p"])
    days = sorted(agg)
    return [agg[d][1] / 100.0 / agg[d][0] for d in days]


def test_allan_variance_replay(spark):
    m = _daily(spark)
    got = {
        r["tau_days"]: r
        for r in QUERIES["events_allan_variance"](spark, SF).collect()
    }
    for tau in (1, 2, 5):
        blocks = [
            sum(m[i : i + tau]) / tau
            for i in range(0, len(m) - len(m) % tau, tau)
        ]
        dys = [blocks[i + 1] - blocks[i] for i in range(len(blocks) - 1)]
        avar = sum(d * d for d in dys) / (2 * len(dys))
        row = got[tau]
        assert row["m_pairs"] == len(dys)
        assert abs(row["allan_var"] - avar) < 1e-6
        assert abs(row["allan_dev"] - math.sqrt(avar)) < 1e-6
    # white-ish noise: avar should not grow with tau
    assert got[5]["allan_var"] < got[1]["allan_var"] * 2


def test_hjorth_petrosian_replay(spark):
    m = _daily(spark)
    n = len(m)
    mu = sum(m) / n
    act = sum(x * x for x in m) / n - mu * mu
    dm = [m[i] - m[i - 1] for i in range(1, n)]
    ddm = [m[i] - 2 * m[i - 1] + m[i - 2] for i in range(2, n)]
    v1 = sum(x * x for x in dm) / len(dm)
    v2 = sum(x * x for x in ddm) / len(ddm)
    mob = math.sqrt(v1 / act)
    comp = math.sqrt(v2 / v1) / mob

    def sgn(x):
        return (x > 0) - (x < 0)

    flips = sum(
        1 for i in range(1, len(dm)) if sgn(dm[i]) != sgn(dm[i - 1])
    )
    pfd = math.log(n) / (math.log(n) + math.log(n / (n + 0.4 * flips)))
    row = QUERIES["events_hjorth_petrosian"](spark, SF).first()
    assert row["n_days"] == n
    assert row["n_sign_changes"] == flips
    assert abs(row["activity"] - act) < 1e-6
    assert abs(row["mobility"] - mob) < 1e-6
    assert abs(row["complexity"] - comp) < 1e-6
    assert abs(row["petrosian_fd"] - pfd) < 1e-6


def test_secretary_rule_replay(spark):
    rows = table(spark, SF, "orders").selectExpr(
        "o_orderkey", "o_orderdate", "CAST(ROUND(o_totalprice*100) AS LONG) AS p"
    ).collect()
    seq = sorted(rows, key=lambda r: (r["o_orderdate"], r["o_orderkey"]))
    n = len(seq)
    obs = int(n / math.e)
    obs_max = max(r["p"] for r in seq[:obs])
    picked = next(
        (r for r in seq[obs:] if r["p"] > obs_max), seq[-1]
    )
    best = max(r["p"] for r in seq)
    row = QUERIES["opt_secretary_stopping"](spark, SF).first()
    assert row["n_candidates"] == n and row["n_observed"] == obs
    assert row["picked_orderkey"] == picked["o_orderkey"]
    assert abs(row["picked_price"] - picked["p"] / 100.0) < 1e-9
    assert abs(row["best_price"] - best / 100.0) < 1e-9
    assert row["picked_is_best"] == (picked["p"] == best)
