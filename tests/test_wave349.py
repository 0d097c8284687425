"""Wave-349: VAR(1) vs a Cramer-rule replay; sup-F vs a per-break
two-segment OLS loop."""

from __future__ import annotations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _series(spark, etype):
    rows = table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d", "event_type",
        "CAST(ROUND(value*100) AS LONG) AS p",
    ).collect()
    agg = {}
    for r in rows:
        if r["event_type"] != etype:
            continue
        n, s = agg.get(r["d"], (0, 0))
        agg[r["d"]] = (n + 1, s + r["p"])
    return agg


def test_var1_replay(spark):
    px = _series(spark, "purchase")
    cx = _series(spark, "click")
    days = sorted(set(px) & set(cx))
    x = [px[d][1] / 100 / px[d][0] for d in days]
    y = [cx[d][1] / 100 / cx[d][0] for d in days]
    xs, ys, xl, yl = x[1:], y[1:], x[:-1], y[:-1]
    n = len(xs)

    def c(u, v):
        mu, mv = sum(u) / n, sum(v) / n
        return sum(a * b for a, b in zip(u, v)) - n * mu * mv

    cxx, cyy, cxy = c(xl, xl), c(yl, yl), c(xl, yl)
    den = cxx * cyy - cxy * cxy
    a11 = (c(xs, xl) * cyy - c(xs, yl) * cxy) / den
    a12 = (c(xs, yl) * cxx - c(xs, xl) * cxy) / den
    a21 = (c(ys, xl) * cyy - c(ys, yl) * cxy) / den
    a22 = (c(ys, yl) * cxx - c(ys, xl) * cxy) / den
    tr, det = a11 + a22, a11 * a22 - a12 * a21
    disc = tr * tr - 4 * det
    import math

    if disc >= 0:
        mod = max(
            abs((tr + math.sqrt(disc)) / 2), abs((tr - math.sqrt(disc)) / 2)
        )
    else:
        mod = math.sqrt(abs(det))
    row = QUERIES["events_var1_stability"](spark, SF).first()
    assert row["n_obs"] == n
    for name, val in (("a11", a11), ("a12", a12), ("a21", a21), ("a22", a22)):
        assert abs(row[name] - val) < 1e-6
    assert abs(row["eig_max_modulus"] - mod) < 1e-6
    assert row["stable"] == (mod < 1.0)


def test_quandt_sup_f_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d", "CAST(ROUND(value*100) AS LONG) AS p"
    ).collect()
    agg = {}
    for r in rows:
        n, s = agg.get(r["d"], (0, 0))
        agg[r["d"]] = (n + 1, s + r["p"])
    y = [agg[d][1] / 100 / agg[d][0] for d in sorted(agg)]
    n = len(y)
    ts = list(range(1, n + 1))

    def ssr(idx):
        m = len(idx)
        st = sum(ts[i] for i in idx)
        sy = sum(y[i] for i in idx)
        sty = sum(ts[i] * y[i] for i in idx)
        stt = sum(ts[i] ** 2 for i in idx)
        syy = sum(y[i] ** 2 for i in idx)
        return (syy - sy * sy / m) - (sty - st * sy / m) ** 2 / (
            stt - st * st / m
        )

    full = ssr(range(n))
    best_f, best_k = -1.0, None
    for k in range(8, n - 7):
        split = ssr(range(k)) + ssr(range(k, n))
        fk = ((full - split) / 2) / (split / (n - 4))
        if fk > best_f + 1e-15:
            best_f, best_k = fk, k
    row = QUERIES["events_quandt_sup_f"](spark, SF).first()
    assert row["n_days"] == n
    assert row["break_t"] == best_k
    assert abs(row["sup_f"] - best_f) < 1e-5
    assert row["break_detected"] == (best_f > 8.68)
    assert row["sup_f"] >= 0
