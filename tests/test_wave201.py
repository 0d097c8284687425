"""Wave-201: ARI/FM/purity and NMI/V-measure vs sklearn-free python
recomputes on the replayed contingency table; funnel vs a rule loop."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.llm.vector_common import hyperplanes
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _contingency(spark):
    emb = table(spark, SF, "embeddings").collect()
    planes = np.array(hyperplanes())[:3]
    cont = Counter()
    for r in emb:
        x = np.array(r["embedding"], dtype=np.float64)
        b = 0
        for p in range(3):
            d = int(np.floor(x * planes[p] * 1e9).sum())
            if d > 0:
                b |= 1 << p
        cont[(r["label"], b)] += 1
    return cont


def test_cluster_agreement_python(spark):
    row = QUERIES["sim_cluster_agreement"](spark, SF).collect()[0]
    cont = _contingency(spark)
    a = Counter()
    b = Counter()
    for (u, v), c in cont.items():
        a[u] += c
        b[v] += c
    n = sum(cont.values())
    c2 = lambda x: x * (x - 1) // 2
    sij = sum(c2(c) for c in cont.values())
    sa = sum(c2(c) for c in a.values())
    sb = sum(c2(c) for c in b.values())
    cn = c2(n)
    ari = (2 * (sij * cn - sa * sb)) / ((sa + sb) * cn - 2 * sa * sb)
    fm = sij / math.sqrt(sa * sb)
    best = defaultdict(int)
    for (u, v), c in cont.items():
        best[v] = max(best[v], c)
    purity = sum(best.values()) / n
    assert row["n"] == n
    assert row["k_true"] == len(a)
    assert row["k_pred"] == len(b)
    assert abs(row["ari"] - ari) < 1e-5
    assert abs(row["fowlkes_mallows"] - fm) < 1e-5
    assert abs(row["purity"] - purity) < 1e-6


def test_cluster_nmi_python(spark):
    row = QUERIES["sim_cluster_nmi"](spark, SF).collect()[0]
    cont = _contingency(spark)
    a, b = Counter(), Counter()
    for (u, v), c in cont.items():
        a[u] += c
        b[v] += c
    n = sum(cont.values())
    i_uv = sum(
        c * math.log(n * c / (a[u] * b[v])) for (u, v), c in cont.items()
    ) / n
    hu = -sum(c / n * math.log(c / n) for c in a.values())
    hv = -sum(c / n * math.log(c / n) for c in b.values())
    h, c_ = i_uv / hu, i_uv / hv
    assert abs(row["mutual_info"] - i_uv) < 1e-5
    assert abs(row["nmi_sqrt"] - i_uv / math.sqrt(hu * hv)) < 1e-5
    assert abs(row["homogeneity"] - h) < 1e-5
    assert abs(row["completeness"] - c_) < 1e-5
    assert abs(row["v_measure"] - 2 * h * c_ / (h + c_)) < 1e-5
    assert 0 <= row["nmi_sqrt"] <= 1


def test_filter_funnel_rule_loop(spark):
    rows = sorted(
        QUERIES["pipeline_filter_funnel"](spark, SF).collect(),
        key=lambda r: r["stage"],
    )
    docs = sorted(
        table(spark, SF, "documents").select("doc_id", "text").collect(),
        key=lambda r: r["doc_id"],
    )
    seen = set()
    passed = [0] * 6
    passed[0] = len(docs)
    for d in docs:
        text = d["text"]
        toks = text.split(" ")
        sum_len = len(text.replace(" ", ""))
        max_tok = max(Counter(toks).values())
        first = text not in seen
        seen.add(text)
        conds = [
            len(text) >= 100,
            len(toks) >= 20,
            25 * len(toks) <= 10 * sum_len <= 80 * len(toks),
            10 * max_tok <= len(toks),
            first,
        ]
        ok = True
        for i, c in enumerate(conds, 1):
            ok = ok and c
            if ok:
                passed[i] += 1
    for i, r in enumerate(rows, 1):
        assert r["stage"] == i
        assert r["docs_in"] == passed[i - 1]
        assert r["docs_out"] == passed[i]
        assert r["dropped"] == passed[i - 1] - passed[i]
    # monotone funnel
    assert all(passed[i] >= passed[i + 1] for i in range(5))
