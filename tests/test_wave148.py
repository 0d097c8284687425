"""Wave-148: pass@k estimator properties, self-BLEU reference."""

from __future__ import annotations

from collections import Counter, defaultdict
from math import comb

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_pass_at_k_matches_python(spark):
    r = QUERIES["model_pass_at_k"](spark, SF).collect()[0]
    per = defaultdict(lambda: [0, 0])
    for row in (
        table(spark, SF, "events")
        .select("user_id", F.round(F.col("value") * 1000).cast("long").alias("m"))
        .collect()
    ):
        a = per[row["user_id"]]
        a[0] += 1
        a[1] += 1 if row["m"] > 800 else 0
    total, certain, n_tasks = 0, 0, 0
    for n, c in per.values():
        if n < 5:
            continue
        n_tasks += 1
        if n - c < 5:
            micro = 1000000
            certain += 1
        else:
            micro = 1000000 - round(1e6 * comb(n - c, 5) / comb(n, 5))
        total += micro
    assert r["n_tasks"] == n_tasks
    assert r["n_certain"] == certain
    assert r["pass_k_micro_sum"] == total
    assert 0.0 <= r["mean_pass_at_k"] <= 1.0


def test_self_bleu2_matches_python(spark):
    r = QUERIES["text_self_bleu2"](spark, SF).collect()[0]
    docs = [
        (d["doc_id"], d["lang"], d["text"].split(" "))
        for d in table(spark, SF, "documents").collect()
        if d["doc_id"] < 40 and len(d["text"].split(" ")) >= 2
    ]
    grams = {
        did: Counter(" ".join(t[i : i + 2]) for i in range(len(t) - 1))
        for did, _lang, t in docs
    }
    clipped_sum = gram_sum = 0
    for did, lang, _t in docs:
        best = 0
        for od, ol, _ot in docs:
            if od == did or ol != lang:
                continue
            clip = sum(min(c, grams[od][g]) for g, c in grams[did].items())
            best = max(best, clip)
        clipped_sum += best
        gram_sum += sum(grams[did].values())
    assert r["n_docs"] == len(docs)
    assert r["clipped_sum"] == clipped_sum
    assert r["gram_sum"] == gram_sum
    assert 0.0 <= r["self_bleu2"] <= 1.0
