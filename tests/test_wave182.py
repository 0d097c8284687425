"""Wave-182: PQ-ADC vs numpy recompute; Breusch-Pagan vs the textbook
residual regression in numpy."""

from __future__ import annotations

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_pq_adc_matches_numpy(spark):
    rows = QUERIES["sim_pq_adc_exact"](spark, SF).collect()
    emb = {
        r["vec_id"]: np.floor(np.array(r["embedding"], dtype=np.float64) * 1e6).astype(np.int64)
        for r in table(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    }
    n = len(emb)
    E = np.stack([emb[i] for i in range(n)])  # (n, 64)
    S = E.reshape(n, 8, 8)  # subvectors
    CB = S[:16]  # (16, 8, 8): codebook per subspace
    # assign: for each vector, subspace -> argmin centroid (ties lowest cid)
    d = ((S[:, None, :, :] - CB[None, :, :, :]) ** 2).sum(axis=3)  # (n, 16, 8)
    codes = d.argmin(axis=1)  # (n, 8) argmin returns lowest index on ties
    for qid in range(5):
        lut = d[qid]  # (16, 8): query's distance to each centroid per subspace
        adc = np.array(
            [lut[codes[v], range(8)].sum() if v != qid else np.iinfo(np.int64).max for v in range(n)]
        )
        order = sorted(range(n), key=lambda v: (adc[v], v))[:5]
        got = sorted(
            ((r["rk"], r["vec_id"], r["adc_dist2"]) for r in rows if r["qid"] == qid)
        )
        assert [g[1] for g in got] == order, qid
        for rk, vid, dist in got:
            assert dist == adc[vid]


def test_breusch_pagan_matches_textbook_regression(spark):
    row = QUERIES["model_breusch_pagan"](spark, SF).collect()[0]
    ev = (
        table(spark, SF, "events")
        .selectExpr("CAST(ts AS DATE) AS d", "CAST(FLOOR(value) AS BIGINT) AS v")
        .collect()
    )
    from collections import defaultdict

    per_day = defaultdict(lambda: [0, 0])
    for r in ev:
        per_day[r["d"]][0] += 1
        per_day[r["d"]][1] += r["v"]
    x = np.array([v[0] for v in per_day.values()], dtype=np.float64)
    y = np.array([v[1] for v in per_day.values()], dtype=np.float64)
    n = len(x)
    b, a = np.polyfit(x, y, 1)
    e2 = (y - (a + b * x)) ** 2
    r = np.corrcoef(x, e2)[0, 1]
    lm = n * r * r
    assert row["n_days"] == n
    assert abs(row["lm_stat"] - lm) < 1e-4, (row["lm_stat"], lm)
    assert row["heteroscedastic_95"] == (lm > 3.841458820694124)
