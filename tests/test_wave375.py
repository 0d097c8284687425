"""Wave-375 independent replays: LB_Keogh recomputed in pure Python from
the raw events (envelope by explicit slicing, not window functions) plus
the DTW-lower-bound property check against a real DTW; head/tail breaks
replayed by the textbook iterative mean-split loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
R = 2


def _profiles(spark):
    rows = (
        table(spark, SF, "events")
        .select(
            F.weekday("ts").alias("dow"),
            F.hour("ts").alias("h"),
            F.col("ts").cast("date").alias("day"),
        )
        .collect()
    )
    counts: dict[tuple[int, int], int] = {}
    days: dict[int, set] = {}
    for r in rows:
        counts[(r["dow"], r["h"])] = counts.get((r["dow"], r["h"]), 0) + 1
        days.setdefault(r["dow"], set()).add(r["day"])
    prof = {}
    for (dow, h), c in counts.items():
        prof.setdefault(dow, {})[h] = 1000 * c // len(days[dow])
    return prof


def _dtw_band(q, c, r):
    """Sakoe-Chiba band-constrained DTW — the alignment LB_Keogh bounds."""
    n, m = len(q), len(c)
    inf = float("inf")
    d = [[inf] * (m + 1) for _ in range(n + 1)]
    d[0][0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(1, i - r), min(m, i + r) + 1):
            cost = (q[i - 1] - c[j - 1]) ** 2
            d[i][j] = cost + min(d[i - 1][j], d[i][j - 1], d[i - 1][j - 1])
    return d[n][m]


def test_lb_keogh_python_replay_and_bound(spark):
    prof = _profiles(spark)
    got = {
        (r["query_dow"], r["cand_dow"]): r
        for r in QUERIES["events_lb_keogh"](spark, SF).collect()
    }
    dows = sorted(prof)
    n_pairs = 0
    for qd in dows:
        for cd in dows:
            if qd == cd:
                continue
            hours = sorted(set(prof[qd]) & set(prof[cd]))
            lb = out = 0
            for h in hours:
                window = [
                    prof[cd][hh]
                    for hh in prof[cd]
                    if abs(hh - h) <= R
                ]
                u, lo = max(window), min(window)
                qv = prof[qd][h]
                if qv > u:
                    lb += (qv - u) ** 2
                    out += 1
                elif qv < lo:
                    lb += (lo - qv) ** 2
                    out += 1
            row = got[(qd, cd)]
            assert row["lb_keogh_sq_milli"] == lb
            assert row["n_hours_outside"] == out
            n_pairs += 1
            # LB_Keogh must LOWER-BOUND the radius-R band-constrained DTW
            # (the alignment it indexes; the unconstrained DTW can be
            # smaller than the bound — that is the whole point of bands):
            q = [prof[qd][h] for h in hours]
            c = [prof[cd][h] for h in hours]
            assert lb <= _dtw_band(q, c, R) + 1e-9
    assert n_pairs == len(got)


def test_head_tail_breaks_loop_replay(spark):
    vals = [
        r[0]
        for r in table(spark, SF, "documents")
        .select(F.length("text"))
        .collect()
    ]
    got = {r["round"]: r for r in QUERIES["model_head_tail_breaks"](spark, SF).collect()}
    cur = vals
    for rnd in range(1, 5):
        cnt, s = len(cur), sum(cur)
        head = [v for v in cur if v * cnt > s]
        row = got[rnd]
        assert row["n_values"] == cnt
        assert row["mean_len"] == round(s / cnt, 4)
        assert row["head_n"] == len(head)
        assert row["head_share"] == round(len(head) / cnt, 6)
        # structural invariants: the head is a strict minority subset and
        # the split always makes progress (every round strictly shrinks)
        assert 0 < len(head) < cnt
        cur = head
