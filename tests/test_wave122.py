"""Wave-122 semantic checks."""

from __future__ import annotations

from collections import Counter
from datetime import date, timedelta

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from data_ingestor_web_app_spark.streaming.wave122 import PH_LAMBDA_MILLI
from tests.conftest import SF_SMALL


def test_cochran_q_matches_python(spark):
    r = QUERIES["agg_cochran_q"](spark, SF_SMALL).first()
    pdf = table(spark, SF_SMALL, "events").select("user_id", "event_type").toPandas()
    counts = Counter(zip(pdf["user_id"], pdf["event_type"]))
    k = len(set(pdf["event_type"]))
    per_user = Counter(pdf["user_id"])
    # binary outcome: type claims more than the user's fair 1/k share
    hits = {
        (u, e): 1 if c * k > per_user[u] else 0 for (u, e), c in counts.items()
    }
    users = sorted(per_user)
    L = {u: sum(v for (uu, _), v in hits.items() if uu == u) for u in users}
    G = Counter()
    for (u, e), v in hits.items():
        G[e] += v
    sl = sum(L.values())
    sl2 = sum(v * v for v in L.values())
    sg2 = sum(v * v for v in G.values())
    q = (k - 1) * (k * sg2 - sl * sl) / (k * sl - sl2)
    assert r.n_users == len(users)
    assert r.k == k
    assert r.df == k - 1
    assert abs(r.q_stat - round(q, 6)) < 2e-6
    # the Wilson-Hilferty 5% critical value is sane for chi2(k-1)
    assert r.crit_05 > k - 1
    assert r.significant == (1 if q > r.crit_05 else 0)


def test_date_edge_cases_semantics(spark):
    rows = QUERIES["fn_date_edge_cases"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        d = date.fromisoformat(r.day)
        # month_end is the last day of d's month
        me = date.fromisoformat(r.month_end)
        assert me.month == d.month and (me + timedelta(days=1)).day == 1
        # plus_month clamps (Jan 31 + 1 month -> Feb 28/29)
        pm = date.fromisoformat(r.plus_month)
        assert 28 <= (pm - d).days <= 31
        # isodow: Monday=1..Sunday=7
        assert r.isodow == d.isoweekday()
        assert r.doy == d.timetuple().tm_yday
        # next_monday is strictly after d and is a Monday
        nm = date.fromisoformat(r.next_monday)
        assert nm.isoweekday() == 1 and 1 <= (nm - d).days <= 7
        # ISO year via the Thursday rule
        assert r.iso_year == d.isocalendar()[0]
        assert r.qtr == (d.month - 1) // 3 + 1
        assert r.days_since_1995 == (d - date(1995, 1, 1)).days


def test_stream_page_hinkley_matches_sequential_replay(spark):
    out = {
        r.event_type: r
        for r in QUERIES["stream_page_hinkley"](spark, SF_SMALL).collect()
    }
    pdf = (
        table(spark, SF_SMALL, "events")
        .select("event_type", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["ts", "event_id"])
    )
    for etype, g in pdf.groupby("event_type"):
        n = cum = u = run_min = max_dev = n_alarms = 0
        for v in g["value"]:
            x = int(round(v * 1000))
            n += 1
            cum += x
            u += x - cum // n
            run_min = min(run_min, u)
            dev = u - run_min
            max_dev = max(max_dev, dev)
            if dev > PH_LAMBDA_MILLI:
                n_alarms += 1
        r = out[etype]
        assert r.n_events == n
        assert r.u_milli == u
        assert r.run_min_milli == run_min
        assert r.max_dev_milli == max_dev
        assert r.n_alarms == n_alarms
