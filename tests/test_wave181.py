"""Wave-181: FIFO allocation vs a pure-Python layer walk; RLE vs the
pixel formula."""

from __future__ import annotations

from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_fifo_cogs_matches_python_layer_walk(spark):
    out = {r["part_key"]: r for r in QUERIES["warehouse_fifo_cogs"](spark, SF).collect()}
    li = table(spark, SF, "lineitem").selectExpr(
        "l_partkey",
        "CAST(l_quantity AS BIGINT) AS qty",
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents",
        "DATE_FORMAT(CAST(l_shipdate AS DATE), 'yyyy-MM-dd') AS d",
        "l_orderkey",
        "l_linenumber",
    ).collect()
    layers = defaultdict(list)
    for r in li:
        layers[r["l_partkey"]].append(
            (r["d"], r["l_orderkey"], r["l_linenumber"], r["cents"], r["qty"])
        )
    assert set(layers) == set(out)
    for pk, rows in layers.items():
        rows.sort()
        total = sum(q for *_, q in rows)
        demand = total // 2
        left, cogs, touched, last_d = demand, 0, 0, None
        for d, _, _, cents, qty in rows:
            take = max(0, min(qty, left))
            left -= take
            if take > 0:
                cogs += take * cents // qty
                touched += 1
                last_d = d
        got = out[pk]
        assert got["total_qty"] == total and got["demand_qty"] == demand, pk
        assert got["cogs_cents"] == cogs, pk
        assert got["n_layers_touched"] == touched, pk
        assert got["last_layer_date"] == last_d, pk


def test_rle_matches_pixel_formula(spark):
    rows = {r["doc_id"]: r for r in QUERIES["mm_image_rle"](spark, SF).collect()}
    assert len(rows) == 200
    for doc_id in (0, 7, 123):
        w, h = 16 + doc_id % 16, 16 + (doc_id * 3) % 16
        lvl = [
            ((x * 7 + y * 13 + doc_id) % 256) // 64
            for y in range(h)
            for x in range(w)
        ]
        runs = 1 + sum(1 for a, b in zip(lvl, lvl[1:]) if a != b)
        r = rows[doc_id]
        assert r["n_pixels"] == w * h
        assert r["n_runs"] == runs
        assert r["compression_ratio"] == (w * h) / runs
        assert 1 <= r["max_run"] <= r["n_pixels"]
