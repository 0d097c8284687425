"""Wave-357: Viterbi vs a brute-force max over all 2^n state paths at
a truncated horizon, plus exact-path replay."""

from __future__ import annotations

from itertools import product

from data_ingestor_web_app_spark.llm.wave357 import _LE, _LPI, _LT
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_viterbi_path_is_max_plus_optimal(spark):
    rows = QUERIES["model_hmm_viterbi"](spark, SF).collect()
    assert len(rows) == 30
    obs = [r["obs_high"] for r in sorted(rows, key=lambda r: r["t"])]
    path = [r["viterbi_state"] for r in sorted(rows, key=lambda r: r["t"])]

    def score(states, o):
        s = _LPI[states[0]] + _LE[states[0]][o[0]]
        for i in range(1, len(states)):
            s += _LT[states[i - 1]][states[i]] + _LE[states[i]][o[i]]
        return s

    # exhaustive optimality proof on the first 12 days (2^12 paths)
    h = 12
    best = max(
        (score(p, obs[:h]) for p in product((0, 1), repeat=h)),
    )
    # the Viterbi prefix score at t=h must equal the brute-force max
    rows_by_t = {r["t"]: r for r in rows}
    vit_h = max(
        rows_by_t[h]["delta_calm_lmicro"], rows_by_t[h]["delta_busy_lmicro"]
    )
    assert vit_h == best
    # the decoded path achieves the final max-plus score
    assert score(path, obs) == max(
        rows_by_t[30]["delta_calm_lmicro"],
        rows_by_t[30]["delta_busy_lmicro"],
    )
    # states are binary and the busy regime fires on high-obs stretches
    assert set(path) <= {0, 1}
