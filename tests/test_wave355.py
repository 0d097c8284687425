"""Wave-355: Shapley-Shubik/Johnston/Deegan-Packel vs a python
bitmask-lattice replay on the same game as Banzhaf."""

from __future__ import annotations

from math import factorial

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_power_indices_replay(spark):
    counts = {
        r["event_type"]: r["count"]
        for r in table(spark, SF, "events").groupBy("event_type").count().collect()
    }
    types = sorted(counts)
    k = len(types)
    wts = [counts[t] for t in types]
    quota = sum(wts) // 2 + 1
    ss = {t: 0 for t in types}
    jo = {t: 0 for t in types}
    dp = {t: 0 for t in types}
    for m in range(1, 2**k):
        members = [i for i in range(k) if (m >> i) & 1]
        cw = sum(wts[i] for i in members)
        if cw < quota:
            continue
        swingers = [i for i in members if cw - wts[i] < quota]
        s = len(members)
        for i in swingers:
            ss[types[i]] += factorial(s - 1) * factorial(k - s)
            jo[types[i]] += 60 // len(swingers)
        if len(swingers) == s:  # minimal winning coalition
            for i in members:
                dp[types[i]] += 60 // s
    got = {
        r["event_type"]: r
        for r in QUERIES["model_power_indices_extra"](spark, SF).collect()
    }
    jt, dt = sum(jo.values()), sum(dp.values())
    for t in types:
        row = got[t]
        assert row["weight"] == counts[t]
        assert row["ss_num"] == ss[t], t
        assert row["johnston_units"] == jo[t]
        assert row["dp_units"] == dp[t]
        assert abs(row["shapley_shubik"] - ss[t] / 120) < 1e-6
        assert abs(row["johnston_index"] - jo[t] / jt) < 1e-6
        assert abs(row["deegan_packel"] - dp[t] / dt) < 1e-6
    # Shapley-Shubik efficiency: numerators sum to k! = 120
    assert sum(ss.values()) == 120
    assert sum(r["ss_num"] for r in got.values()) == 120
