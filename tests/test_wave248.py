"""Wave-248: LPC-2 vs a pure-python Levinson-Durbin replay on the
generator formula (plus stability |k| < 1 and positive prediction gain),
projection profiles vs a per-pixel replay."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_lpc2_replay(spark):
    rows = {r.doc_id: r for r in QUERIES["mm_audio_lpc2"](spark, SF).collect()}
    assert rows
    for doc_id, r in rows.items():
        n = 800 + (doc_id % 10) * 80
        s = [((i * (doc_id + 7)) % 2048) - 1024 for i in range(n)]
        r0 = sum(x * x for x in s)
        r1 = sum(a * b for a, b in zip(s, s[1:]))
        r2 = sum(a * b for a, b in zip(s, s[2:]))
        k1 = r1 / r0
        e1 = r0 * (1 - k1 * k1)
        k2 = (r2 - k1 * r1) / e1
        assert r.n == n
        assert abs(r.k1 - k1) < 1e-12
        assert abs(r.a2 - k2) < 1e-12
        assert abs(r.a1 - k1 * (1 - k2)) < 1e-12
        gain = 10 * math.log10(r0 / (e1 * (1 - k2 * k2)))
        assert abs(r.prediction_gain_db - round(gain, 6)) < 1e-5
        # Levinson-Durbin stability: reflection coefficients inside (-1, 1)
        assert -1 < r.k1 < 1 and -1 < r.a2 < 1
        # a predictor can only help: gain >= 0 dB
        assert r.prediction_gain_db >= -1e-9


def test_projection_profile_replay(spark):
    rows = {
        r.doc_id: r
        for r in QUERIES["mm_image_projection_profile"](spark, SF).collect()
    }
    for doc_id, r in rows.items():
        w, h = 16 + doc_id % 16, 16 + (doc_id * 3) % 16
        pix = lambda x, y: (x * 7 + y * 13 + doc_id) % 256
        p = [sum(pix(x, y) for x in range(w)) for y in range(h)]
        q = [sum(pix(x, y) for y in range(h)) for x in range(w)]

        def var(a):
            n = len(a)
            sa, s2 = sum(a), sum(v * v for v in a)
            return (s2 - float(sa) * sa / n) / n

        assert r.n_rows == h and r.n_cols == w
        assert r.peak_row == max(range(h), key=lambda y: (p[y], -y))
        assert r.peak_col == max(range(w), key=lambda x: (q[x], -x))
        assert abs(r.var_row - var(p)) < 1e-9 * max(1, var(p))
        assert abs(r.var_col - var(q)) < 1e-9 * max(1, var(q))
        vexp = -1.0 if var(q) == 0 else var(p) / var(q)
        assert abs(r.anisotropy - vexp) < 1e-9 * max(1, abs(vexp))
