"""Wave-331: pair-counting validity and purity vs sklearn-free python
replays; the set-similarity shelf vs direct token-set math."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _conting(spark):
    rows = table(spark, SF, "embeddings").collect()
    cells = Counter()
    for r in rows:
        e = r["embedding"]
        pred = (
            4 * (1 if e[0] > 0 else 0)
            + 2 * (1 if e[1] > 0 else 0)
            + (1 if e[2] > 0 else 0)
        )
        cells[(pred, r["label"])] += 1
    return cells


def test_rand_ari_fm_pair_counting(spark):
    cells = _conting(spark)
    n = sum(cells.values())
    p = sum(c * (c - 1) // 2 for c in cells.values())
    arow = Counter()
    brow = Counter()
    for (pr, tr), c in cells.items():
        arow[pr] += c
        brow[tr] += c
    a = sum(c * (c - 1) // 2 for c in arow.values())
    b = sum(c * (c - 1) // 2 for c in brow.values())
    tot = n * (n - 1) // 2
    rand = (tot + 2 * p - a - b) / tot
    ari = (p - a * b / tot) / ((a + b) / 2 - a * b / tot)
    fm = p / math.sqrt(a * b)
    row = QUERIES["sim_rand_ari_fm"](spark, SF).first()
    assert row["n_points"] == n
    assert row["pairs_both"] == p
    assert row["pairs_pred"] == a and row["pairs_true"] == b
    assert abs(row["rand_index"] - rand) < 1e-6
    assert abs(row["adjusted_rand"] - ari) < 1e-6
    assert abs(row["fowlkes_mallows"] - fm) < 1e-6
    # ARI <= Rand-ish bounds
    assert -1 <= row["adjusted_rand"] <= 1
    assert 0 <= row["fowlkes_mallows"] <= 1


def test_purity_replay(spark):
    cells = _conting(spark)
    n = sum(cells.values())
    best_pred = Counter()
    best_true = Counter()
    for (pr, tr), c in cells.items():
        best_pred[pr] = max(best_pred[pr], c)
        best_true[tr] = max(best_true[tr], c)
    pu = sum(best_pred.values()) / n
    ip = sum(best_true.values()) / n
    row = QUERIES["sim_cluster_purity"](spark, SF).first()
    assert row["n_points"] == n
    assert abs(row["purity"] - pu) < 1e-6
    assert abs(row["inverse_purity"] - ip) < 1e-6
    assert abs(row["purity_f1"] - 2 * pu * ip / (pu + ip)) < 1e-6
    assert 0 < row["purity"] <= 1


def test_set_similarity_shelf_replay(spark):
    docs = (
        table(spark, SF, "documents")
        .where("lang IN ('en','fr')")
        .select("lang", "text")
        .collect()
    )
    cnt = {"en": Counter(), "fr": Counter()}
    for r in docs:
        for t in r["text"].split(" "):
            t = t.lower()
            if t:
                cnt[r["lang"]][t] += 1
    sa, sb = set(cnt["en"]), set(cnt["fr"])
    na, nb, ni = len(sa), len(sb), len(sa & sb)
    cmin = sum(
        min(cnt["en"][t], cnt["fr"][t]) for t in sa | sb
    )
    ctot = sum(cnt["en"].values()) + sum(cnt["fr"].values())
    row = QUERIES["text_set_similarity_shelf"](spark, SF).first()
    assert (row["n_tokens_en"], row["n_tokens_fr"], row["n_shared"]) == (
        na,
        nb,
        ni,
    )
    assert abs(row["jaccard"] - ni / (na + nb - ni)) < 1e-6
    assert abs(row["sorensen_dice"] - 2 * ni / (na + nb)) < 1e-6
    assert abs(row["overlap_coef"] - ni / min(na, nb)) < 1e-6
    assert abs(row["ochiai"] - ni / math.sqrt(na * nb)) < 1e-6
    assert (
        abs(
            row["tversky_07_03"]
            - ni / (ni + 0.7 * (na - ni) + 0.3 * (nb - ni))
        )
        < 1e-6
    )
    assert abs(row["bray_curtis"] - (1 - 2 * cmin / ctot)) < 1e-6
    # shelf ordering: overlap >= dice >= jaccard
    assert (
        row["overlap_coef"] + 1e-9
        >= row["sorensen_dice"] + 1e-9
        >= row["jaccard"]
    )
