"""Wave-327: finance/risk shelf vs a pure-python replay of the daily
return series at sf0.001."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily(spark):
    """(date, n, centi_sum) sorted by day — the exact daily frame."""
    rows = table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d",
        "CAST(ROUND(value*100) AS LONG) AS p",
        "event_type",
        "event_id",
    ).collect()
    agg = {}
    for r in rows:
        n, s = agg.get(r["d"], (0, 0))
        agg[r["d"]] = (n + 1, s + r["p"])
    days = sorted(agg)
    m = [agg[d][1] / 100.0 / agg[d][0] for d in days]
    return rows, days, m


def _rets(m):
    return [m[i] / m[i - 1] - 1.0 for i in range(1, len(m))]


def test_var_cvar_matches_order_stats(spark):
    row = QUERIES["events_var_cvar"](spark, SF).first()
    _, _, m = _daily(spark)
    r = sorted(_rets(m))
    n = len(r)
    k = math.ceil(0.05 * n)
    assert row["n_ret"] == n and row["k_tail"] == k
    assert abs(row["var_95"] - (-r[k - 1])) < 1e-6
    assert abs(row["cvar_95"] - (-sum(r[:k]) / k)) < 1e-6
    # CVaR dominates VaR (coherence)
    assert row["cvar_95"] >= row["var_95"] - 1e-9


def test_sharpe_sortino_calmar_replay(spark):
    row = QUERIES["events_sharpe_sortino"](spark, SF).first()
    _, _, m = _daily(spark)
    r = _rets(m)
    n = len(r)
    mu = sum(r) / n
    sd = math.sqrt((sum(x * x for x in r) - n * mu * mu) / (n - 1))
    dsd = math.sqrt(sum(x * x for x in r if x < 0) / n)
    cm, maxdd = m[0], 0.0
    for x in m:
        cm = max(cm, x)
        maxdd = max(maxdd, (cm - x) / cm)
    assert row["n_ret"] == n
    assert abs(row["mean_daily_ret"] - mu) < 1e-6
    assert abs(row["sd_daily_ret"] - sd) < 1e-6
    assert abs(row["sharpe_ann"] - mu / sd * math.sqrt(365)) < 1e-5
    assert abs(row["sortino_ann"] - mu / dsd * math.sqrt(365)) < 1e-5
    assert abs(row["max_drawdown"] - maxdd) < 1e-6
    assert abs(row["calmar"] - mu * 365 / maxdd) < 1e-5


def test_macd_fir_replay(spark):
    from data_ingestor_web_app_spark.operators.wave327 import (
        _FAST,
        _SIG,
        _SLOW,
    )

    out = {r["d"]: r for r in QUERIES["events_macd_signal"](spark, SF).collect()}
    _, days, m = _daily(spark)

    def fir(series, i, ws):
        return sum(
            w * (series[i - k] if i - k >= 0 else 0.0)
            for k, w in enumerate(ws)
        )

    macd = [fir(m, i, _FAST) - fir(m, i, _SLOW) for i in range(len(m))]
    sig = [fir(macd, i, _SIG) for i in range(len(m))]
    assert len(out) == len(days) - 15
    for i in range(15, len(days)):
        row = out[days[i].isoformat()]
        assert abs(row["macd"] - macd[i]) < 1e-5
        assert abs(row["signal"] - sig[i]) < 1e-5
        assert abs(row["histogram"] - (macd[i] - sig[i])) < 1e-5
        assert row["bullish"] == (1 if macd[i] > sig[i] else 0)


def test_vwap_twap_exact_integer_replay(spark):
    rows, days, _ = _daily(spark)
    got = {r["d"]: r for r in QUERIES["events_vwap_twap"](spark, SF).collect()}
    assert len(got) == len(days)
    agg = {}
    for r in rows:
        v = 1 + r["event_id"] % 5
        n, sp, sv, spv = agg.get(r["d"], (0, 0, 0, 0))
        agg[r["d"]] = (n + 1, sp + r["p"], sv + v, spv + r["p"] * v)
    for d, (n, sp, sv, spv) in agg.items():
        row = got[d.isoformat()]
        assert row["volume"] == sv
        assert abs(row["vwap"] - spv / sv / 100.0) < 1e-6
        assert abs(row["twap"] - sp / n / 100.0) < 1e-6
        assert (
            abs(row["vwap_premium"] - (spv / sv - sp / n) / (sp / n)) < 1e-6
        )


def test_capm_beta_replay(spark):
    row = QUERIES["agg_capm_beta"](spark, SF).first()
    rows, days, m = _daily(spark)
    agg = {}
    for r in rows:
        if r["event_type"] == "purchase":
            n, s = agg.get(r["d"], (0, 0))
            agg[r["d"]] = (n + 1, s + r["p"])
    mkt = dict(zip(days, m))
    joint = sorted(set(agg) & set(mkt))
    ma = [agg[d][1] / 100.0 / agg[d][0] for d in joint]
    mm = [mkt[d] for d in joint]
    ra = _rets(ma)
    rm = _rets(mm)
    n = len(ra)
    mua, mum = sum(ra) / n, sum(rm) / n
    cov = sum(a * b for a, b in zip(ra, rm)) - n * mua * mum
    varm = sum(b * b for b in rm) - n * mum * mum
    vara = sum(a * a for a in ra) - n * mua * mua
    beta = cov / varm
    assert row["n_ret"] == n
    assert abs(row["beta"] - beta) < 1e-5
    assert abs(row["alpha"] - (mua - beta * mum)) < 1e-6
    assert abs(row["corr_r"] - cov / math.sqrt(varm * vara)) < 1e-5
    assert -1 - 1e-9 <= row["corr_r"] <= 1 + 1e-9
