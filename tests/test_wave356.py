"""Wave-356: Hotelling T2 vs a python Mahalanobis replay."""

from __future__ import annotations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
UCL = 9.21034


def test_hotelling_t2_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d", "event_type",
        "CAST(ROUND(value*100) AS LONG) AS p",
    ).collect()
    agg = {}
    for r in rows:
        key = (r["d"], r["event_type"])
        n, s = agg.get(key, (0, 0))
        agg[key] = (n + 1, s + r["p"])
    days = sorted(
        d
        for d in {d for d, _ in agg}
        if (d, "purchase") in agg and (d, "click") in agg
    )
    xs = [agg[(d, "purchase")][1] / 100 / agg[(d, "purchase")][0] for d in days]
    ys = [agg[(d, "click")][1] / 100 / agg[(d, "click")][0] for d in days]
    n = len(days)
    mx, my = sum(xs) / n, sum(ys) / n
    vxx = (sum(x * x for x in xs) - n * mx * mx) / (n - 1)
    vyy = (sum(y * y for y in ys) - n * my * my) / (n - 1)
    vxy = (sum(x * y for x, y in zip(xs, ys)) - n * mx * my) / (n - 1)
    det = vxx * vyy - vxy * vxy
    got = {r["d"]: r for r in QUERIES["events_hotelling_t2"](spark, SF).collect()}
    assert len(got) == n
    total_above = 0
    for d, x, y in zip(days, xs, ys):
        dx, dy = x - mx, y - my
        t2 = (dx * dx * vyy - 2 * dx * dy * vxy + dy * dy * vxx) / det
        row = got[d.isoformat()]
        assert abs(row["purchase_mean"] - x) < 1e-6
        assert abs(row["click_mean"] - y) < 1e-6
        assert abs(row["hotelling_t2"] - t2) < 1e-5
        assert row["out_of_control"] == (t2 > UCL)
        total_above += t2 > UCL
    # phase-I identity: sum of T2 over the fitting sample = p(n-1) = 2(n-1)
    s = sum(
        ((x - mx) ** 2 * vyy - 2 * (x - mx) * (y - my) * vxy + (y - my) ** 2 * vxx)
        / det
        for x, y in zip(xs, ys)
    )
    assert abs(s - 2 * (n - 1)) < 1e-6
