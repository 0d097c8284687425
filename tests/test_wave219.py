"""Wave-219: Hu invariants vs cv2-free numpy moments (+translation
invariance property); IPS/SNIPS vs a dict replay (+dominance sanity)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _hu123(img: np.ndarray):
    h, w = img.shape
    ys, xs = np.mgrid[0:h, 0:w]
    img = img.astype(np.float64)
    m00 = img.sum()
    xbar = (img * xs).sum() / m00
    ybar = (img * ys).sum() / m00
    mu = lambda p, q: (img * (xs - xbar) ** p * (ys - ybar) ** q).sum()
    eta = lambda p, q: mu(p, q) / m00 ** (1 + (p + q) / 2)
    n20, n02, n11 = eta(2, 0), eta(0, 2), eta(1, 1)
    n30, n21, n12, n03 = eta(3, 0), eta(2, 1), eta(1, 2), eta(0, 3)
    return (
        n20 + n02,
        (n20 - n02) ** 2 + 4 * n11**2,
        (n30 - 3 * n12) ** 2 + (3 * n21 - n03) ** 2,
    )


def test_hu_moments_numpy_and_invariance(spark):
    rows = {r["doc_id"]: r for r in QUERIES["mm_image_hu_moments"](spark, SF).collect()}
    assert set(rows) == set(range(200))
    for doc_id in [0, 7, 33, 120, 199]:
        w, h = 16 + doc_id % 16, 16 + (doc_id * 3) % 16
        xs, ys = np.meshgrid(np.arange(w), np.arange(h))
        img = ((xs * 7 + ys * 13 + doc_id) % 256).astype(np.int64)
        i1, i2, i3 = _hu123(img)
        r = rows[doc_id]
        assert r["mass"] == int(img.sum())
        assert abs(r["hu1_milli"] - 1e3 * i1) < 1e-3
        assert abs(r["hu2_micro"] - 1e6 * i2) < 1e-2
        assert abs(r["hu3_nano"] - 1e9 * i3) < 1e-1
        # translation invariance: padding the image with zeros on two
        # sides must not change the invariants
        padded = np.pad(img, ((3, 0), (5, 0)))
        j1, j2, j3 = _hu123(padded)
        assert abs(i1 - j1) < 1e-12
        assert abs(i2 - j2) < 1e-12
        assert abs(i3 - j3) < 1e-12


def test_offpolicy_ips_replay(spark):
    row = QUERIES["events_offpolicy_ips"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").select("ts", "event_type", "value").collect()
    logged = []
    for r in ev:
        dow = (r["ts"].date().isoweekday() % 7) + 1
        logged.append(
            (dow, r["event_type"], int(math.floor(r["value"] * 100 + 0.5)))
        )
    na = Counter((d, a) for d, a, _ in logged)
    nctx = Counter(d for d, _, _ in logged)
    sr = defaultdict(int)
    for d, a, r_ in logged:
        sr[(d, a)] += r_
    pi = {}
    for d in nctx:
        acts = sorted(
            {a for (dd, a) in na if dd == d},
            key=lambda a: (-sr[(d, a)] / na[(d, a)], a),
        )
        pi[d] = acts[0]
    s_ips = s_w = 0
    for d, a, r_ in logged:
        hit = 1 if a == pi[d] else 0
        w = nctx[d] / na[(d, a)]
        s_ips += math.floor(hit * w * r_ * 1e3)
        s_w += math.floor(hit * w * 1e6)
    n = len(logged)
    s_r = sum(r_ for _, _, r_ in logged)
    assert row["n_logged"] == n
    assert abs(row["logged_value"] - s_r / (100.0 * n)) < 1e-6
    assert abs(row["ips_value"] - s_ips / (1e3 * n * 100)) < 1e-6
    assert abs(row["snips_value"] - (s_ips / 1e3) / (s_w / 1e6) / 100) < 1e-6
    # playing the per-context best action should beat the logged mix
    assert row["ips_value"] > row["logged_value"]
