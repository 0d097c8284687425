"""Wave-242: LBP and block-energy vs a pure-python per-pixel replay on
the generator's closed form (no numpy vectorization — an independent
construction from the engine's ring-shift/reshape arithmetic)."""

from __future__ import annotations

from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
OFFS = [(-1, -1), (0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0)]


def _img(doc_id):
    w, h = 16 + doc_id % 16, 16 + (doc_id * 3) % 16
    return w, h, lambda x, y: (x * 7 + y * 13 + doc_id) % 256


def test_lbp_replay(spark):
    rows = {r.doc_id: r for r in QUERIES["mm_image_lbp"](spark, SF).collect()}
    assert rows and all(d < 200 for d in rows)
    for doc_id, r in rows.items():
        w, h, pix = _img(doc_id)
        n = sum_code = n_unif = 0
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                c = pix(x, y)
                bits = [1 if pix(x + dx, y + dy) >= c else 0 for dx, dy in OFFS]
                code = sum(b << k for k, b in enumerate(bits))
                trans = sum(abs(bits[k] - bits[(k + 1) % 8]) for k in range(8))
                n += 1
                sum_code += code
                n_unif += 1 if trans <= 2 else 0
        assert r.n_interior == n == (w - 2) * (h - 2)
        assert r.sum_code == sum_code
        assert r.n_uniform == n_unif
        assert abs(r.uniform_frac - n_unif / n) < 1e-12
        assert 0 <= r.uniform_frac <= 1


def test_block_energy_replay(spark):
    rows = {r.doc_id: r for r in QUERIES["mm_image_block_energy"](spark, SF).collect()}
    for doc_id, r in rows.items():
        w, h, pix = _img(doc_id)
        wb, hb = w // 8, h // 8
        sum_dc = ac = dce = 0
        for by in range(hb):
            for bx in range(wb):
                vs = [
                    pix(bx * 8 + i, by * 8 + j)
                    for j in range(8)
                    for i in range(8)
                ]
                dc = sum(vs)
                sq = sum(v * v for v in vs)
                sum_dc += dc
                ac += 64 * sq - dc * dc
                dce += dc * dc
        assert r.n_blocks == wb * hb
        assert r.sum_dc == sum_dc
        assert r.ac_energy == ac
        assert abs(r.dc_energy_share - dce / (dce + ac)) < 1e-12
        # Parseval sanity: AC energy is non-negative (Cauchy-Schwarz)
        assert r.ac_energy >= 0
        assert 0 < r.dc_energy_share < 1
