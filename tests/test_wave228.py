"""Wave-228: rate-ratio test vs closed form; Hosmer-Lemeshow vs a
python train/test replay."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_rate_ratio_closed_form(spark):
    row = QUERIES["events_rate_ratio_test"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").select("ts").collect()
    from datetime import date

    x1 = x2 = 0
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        if d < 7:
            x1 += 1
        elif d < 14:
            x2 += 1
    rr = x2 / x1
    hw = 1.959963984540054 * math.sqrt(1 / x1 + 1 / x2)
    z = (abs(x2 - (x1 + x2) / 2) - 0.5) / math.sqrt((x1 + x2) / 4)
    assert row["week1_events"] == x1
    assert row["week2_events"] == x2
    assert abs(row["rate_ratio"] - rr) < 1e-6
    assert abs(row["ci_lo"] - math.exp(math.log(rr) - hw)) < 1e-5
    assert abs(row["ci_hi"] - math.exp(math.log(rr) + hw)) < 1e-5
    assert abs(row["z_stat"] - z) < 1e-5
    assert row["significant_5pct"] == (z > 1.959963984540054)
    assert row["ci_lo"] <= row["rate_ratio"] <= row["ci_hi"]


def test_hosmer_lemeshow_replay(spark):
    row = QUERIES["model_hosmer_lemeshow"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").select("ts", "event_type").collect()
    from datetime import date

    train_n, train_y = Counter(), Counter()
    test = defaultdict(lambda: [0, 0])
    for r in ev:
        dow = (r["ts"].date().isoweekday() % 7) + 1
        y = 1 if r["event_type"] == "purchase" else 0
        if (r["ts"].date() - date(2024, 1, 1)).days < 7:
            train_n[dow] += 1
            train_y[dow] += y
        else:
            test[dow][0] += 1
            test[dow][1] += y
    h = 0.0
    n_test = 0
    for dow in sorted(test):
        p = train_y[dow] / train_n[dow]
        n, obs = test[dow]
        n_test += n
        h += (obs - n * p) ** 2 / (n * p * (1 - p))
    assert row["n_groups"] == len(test)
    assert row["n_test"] == n_test
    assert abs(row["hl_stat"] - h) < 1e-4
    assert row["dof"] == len(test) - 2
    assert row["miscalibrated_5pct"] == (h > 11.070497693516351)
    # the dow model was FIT on the same generating process: a synthetic
    # fixture with a stable rate should rarely flag miscalibration —
    # but assert only that the statistic is a valid nonnegative number
    assert row["hl_stat"] >= 0.0
