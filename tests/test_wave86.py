"""Wave-86 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_srm_statistic_identity(spark):
    r = QUERIES["events_ab_srm_check"](spark, SF_SMALL).first()
    total = table(spark, SF_SMALL, "events").select("user_id").distinct().count()
    assert r.n_control + r.n_treat == total
    # chi-square GOF identity vs a hand computation
    e = total / 2
    chi2 = (r.n_control - e) ** 2 / e + (r.n_treat - e) ** 2 / e
    assert abs(r.chi2_stat - chi2) < 1e-6
    # the alarm is exactly the 95% gate comparison (sf0.001 has only ~15
    # users, so an unlucky-but-fair split CAN alarm — the verdict must
    # simply be consistent with the statistic)
    assert r.srm_alarm == (chi2 > 3.841459)


def test_gains_table_identities(spark):
    rows = QUERIES["model_gains_table"](spark, SF_SMALL).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    # deciles are equal-sized within 1
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # capture is monotone and ends at 1
    caps = [r.cum_capture for r in rows]
    assert caps == sorted(caps)
    assert abs(caps[-1] - 1.0) < 1e-9
    # final lift is exactly 1 (whole population)
    assert abs(rows[-1].cum_lift - 1.0) < 1e-6
    # total responders consistent
    total_pos = sum(r.pos for r in rows)
    expect_pos = (
        table(spark, SF_SMALL, "lineitem").where(F.col("l_returnflag") == "R").count()
    )
    assert total_pos == expect_pos


def test_contingency_residuals_near_normal(spark):
    rows = QUERIES["agg_contingency_residuals"](spark, SF_SMALL).collect()
    # O and E totals agree
    obs = sum(r.observed for r in rows)
    exp = sum(r.expected for r in rows)
    assert abs(obs - exp) < 0.5
    # residuals standardized: mean ~0, few extreme values
    res = np.array([r.std_residual for r in rows])
    assert abs(res.mean()) < 1.0
    assert (np.abs(res) > 5).sum() == 0
