"""Wave-275: Lindley queue vs an ACTUAL sequential discrete-event
simulation (the engine uses the prefix-min identity; the replay runs
the recursion customer by customer — independent algebra), bounds
audit vs a counting replay plus the theorem assertions."""

from __future__ import annotations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_lindley_queue_replay(spark):
    row = QUERIES["events_lindley_queue"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "unix_micros(ts) AS t", "event_id"
    ).collect()
    ts = sorted((r.t, r.event_id) for r in ev)
    ia = [(b[0] - a[0]) / 1e6 for a, b in zip(ts, ts[1:])]
    s = 0.8 * sum(ia) / len(ia)
    # sequential Lindley recursion
    w = 0.0
    waits = []
    for a in ia:
        w = max(0.0, w + s - a)
        waits.append(w)
    n = len(waits)
    assert row.n_customers == n
    assert abs(row.service_s - round(s, 6)) < 1e-9
    assert abs(row.mean_wait_s - round(sum(waits) / n, 6)) < 1e-5
    assert abs(row.max_wait_s - round(max(waits), 6)) < 1e-6
    frac = sum(1 for w_ in waits if w_ > 0) / n
    assert abs(row.frac_delayed - round(frac, 6)) < 1e-6
    # rho = 0.8 < 1: the queue is stable, waits exist but are bounded
    assert 0 < row.frac_delayed < 1


def test_concentration_bounds_replay(spark):
    rows = {r.k: r for r in QUERIES["agg_concentration_bounds"](spark, SF).collect()}
    vals = [r.value for r in table(spark, SF, "events").select("value").collect()]
    n = len(vals)
    mu = sum(vals) / n
    var = sum(v * v for v in vals) / n - mu * mu
    for k in (2, 3, 5):
        p = sum(1 for v in vals if v > k * mu) / n
        r = rows[k]
        assert abs(r.p_empirical - round(p, 6)) < 1e-9
        assert abs(r.markov_bound - round(1 / k, 6)) < 1e-9
        cheb = min(1.0, var / ((k - 1) * mu) ** 2)
        cant = min(1.0, var / (var + ((k - 1) * mu) ** 2))
        assert abs(r.chebyshev_bound - round(cheb, 6)) < 1e-6
        assert abs(r.cantelli_bound - round(cant, 6)) < 1e-6
        # theorems: the bounds must actually bound the empirical tail
        # (Cantelli needs X - mu > (k-1)mu which is what we measured)
        assert p <= 1 / k + 1e-12 or mu <= 0  # Markov needs X >= 0
        assert p <= cant + 1e-12
        assert bool(r.cantelli_holds)
        # Cantelli is never looser than Chebyshev
        assert r.cantelli_bound <= r.chebyshev_bound + 1e-9
