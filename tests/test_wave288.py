"""Wave-288: Goertzel bank vs a numpy full-DFT replay — the dominant
DTMF bin must match the nearest-bin reading of the actual spectrum."""

from __future__ import annotations

import math

import numpy as np

from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
DTMF = [697.0, 770.0, 852.0, 941.0, 1209.0, 1336.0, 1477.0, 1633.0]


def test_goertzel_bank_replay(spark):
    rows = {r.doc_id: r for r in QUERIES["mm_audio_goertzel_bank"](spark, SF).collect()}
    assert rows
    for doc_id, r in rows.items():
        n = 800 + (doc_id % 10) * 80
        s = np.array(
            [((i * (doc_id + 7)) % 2048) - 1024 for i in range(n)],
            dtype=np.float64,
        )
        i = np.arange(n, dtype=np.float64)
        energies = {}
        for f in DTMF:
            w = 2 * math.pi * f / 8000.0
            c = float(s @ np.cos(w * i))
            sn = float(s @ np.sin(w * i))
            energies[f] = (c * c + sn * sn) / (n * n)
        best_f = min(energies, key=lambda f: (-energies[f], f))
        etot = sum(energies.values())
        assert r.dominant_hz == round(best_f, 1), doc_id
        assert abs(r.dominant_energy - round(energies[best_f], 2)) < 0.05
        assert abs(r.dominance_share - round(energies[best_f] / etot, 6)) < 1e-5
        assert 0 < r.dominance_share <= 1
        # Parseval sanity: no single probe can exceed the signal's
        # total normalized power mean(s^2)
        assert energies[best_f] <= float(s @ s) / n + 1e-6
