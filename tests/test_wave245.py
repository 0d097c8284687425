"""Wave-245: P-K formula vs a python moments replay plus the algebraic
identity between its two forms; inspection paradox vs a sorted-gaps
replay plus the length-bias inequality (Cauchy-Schwarz)."""

from __future__ import annotations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_mg1_pollaczek_replay(spark):
    row = QUERIES["events_mg1_pollaczek"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr("unix_micros(ts) AS us", "value").collect()
    us = [r.us for r in ev]
    n = len(ev)
    lam = 1.0 / ((max(us) - min(us)) / 1e6 / (n - 1))
    s = [r.value / 100.0 for r in ev]
    es = sum(s) / n
    es2 = sum(x * x for x in s) / n
    rho = lam * es
    cv2 = (es2 - es * es) / (es * es)
    assert row.n == n
    assert abs(row.lambda_rate - round(lam, 6)) < 1e-5
    assert abs(row.mean_service - round(es, 6)) < 1e-6
    assert abs(row.cv2_service - round(cv2, 6)) < 1e-5
    assert abs(row.rho - round(rho, 6)) < 1e-5
    if rho < 1:
        wq = lam * es2 / (2 * (1 - rho))
        assert abs(row.wq_pk - round(wq, 6)) < 1e-4
        # the two P-K forms are the same number (identity check)
        assert abs(row.wq_pk - row.wq_mm1_adjusted) < 2e-6
    else:
        assert row.wq_pk == -1.0 and row.wq_mm1_adjusted == -1.0


def test_inspection_paradox_replay(spark):
    row = QUERIES["events_inspection_paradox"](spark, SF).collect()[0]
    ev = (
        table(spark, SF, "events")
        .selectExpr("unix_micros(ts) AS us", "event_id")
        .collect()
    )
    ordered = sorted(ev, key=lambda r: (r.us, r.event_id))
    gaps = [
        (b.us - a.us) / 1e6 for a, b in zip(ordered, ordered[1:])
    ]
    n = len(gaps)
    eg = sum(gaps) / n
    eg2 = sum(g * g for g in gaps) / n
    assert row.n_gaps == n
    assert abs(row.mean_gap_s - round(eg, 6)) < 1e-6
    assert abs(row.length_biased_mean_s - round(eg2 / eg, 6)) < 1e-5
    assert abs(row.inspection_ratio - round(eg2 / eg**2, 6)) < 1e-5
    assert abs(row.cv2_gap - round(eg2 / eg**2 - 1, 6)) < 1e-5
    assert abs(row.mean_residual_life_s - round(eg2 / (2 * eg), 6)) < 1e-5
    # Cauchy-Schwarz: the length-biased mean never undershoots the mean
    assert row.length_biased_mean_s >= row.mean_gap_s - 1e-9
    assert row.inspection_ratio >= 1 - 1e-9
