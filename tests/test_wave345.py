"""Wave-345: SimRank vs an integer python fixed-point replay."""

from __future__ import annotations

from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
N, UNIT = 25, 1_000_000


def _simrank():
    in_nbrs = {v: [(v - k) % N for k in (1, 2, 3)] for v in range(N)}
    s = {(a, b): UNIT if a == b else 0 for a in range(N) for b in range(N)}
    for _ in range(3):
        nxt = {}
        for a in range(N):
            for b in range(N):
                if a == b:
                    nxt[(a, b)] = UNIT
                else:
                    tot = sum(
                        s[(u, v)] for u in in_nbrs[a] for v in in_nbrs[b]
                    )
                    nxt[(a, b)] = 8 * tot // 90
        s = nxt
    return s


def test_simrank_top10_replay(spark):
    s = _simrank()
    pairs = sorted(
        ((a, b, s[(a, b)]) for a in range(N) for b in range(a + 1, N)),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:10]
    rows = QUERIES["graph_simrank_unrolled"](spark, SF).collect()
    assert len(rows) == 10
    for row, (a, b, sim) in zip(rows, pairs):
        assert (row["a"], row["b"], row["sim_micro"]) == (a, b, sim)
        assert abs(row["simrank"] - sim / 1e6) < 1e-6
    # symmetry held implicitly; similarity bounded by the diagonal
    assert all(0 <= r["sim_micro"] <= UNIT for r in rows)
