"""Wave-192: chunk dedup vs a dict-based keep-first replay; systematic
sampler vs the integer point-placement definition; Cochran-Armitage vs
a scipy-free closed-form recompute."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_dup_paragraph_keep_first_replay(spark):
    rows = {r["doc_id"]: r for r in QUERIES["pipeline_dup_paragraph_removal"](spark, SF).collect()}
    docs = sorted(
        table(spark, SF, "documents").select("doc_id", "text").collect(),
        key=lambda r: r["doc_id"],
    )
    seen = set()
    expect = {}
    for r in docs:
        toks = r["text"].split(" ")
        n_chunks = math.ceil(len(toks) / 10)
        kept = kept_toks = 0
        for i in range(n_chunks):
            part = toks[i * 10 : i * 10 + 10]
            chunk = " ".join(part)
            if chunk not in seen:
                seen.add(chunk)
                kept += 1
                kept_toks += len(part)
        expect[r["doc_id"]] = (n_chunks, kept, kept_toks)
    assert set(rows) == set(expect)
    for doc_id, (n_chunks, kept, kept_toks) in expect.items():
        got = rows[doc_id]
        assert got["n_chunks"] == n_chunks
        assert got["kept_chunks"] == kept
        assert got["kept_tokens"] == kept_toks
        assert abs(got["dup_chunk_ratio"] - round(1 - kept / n_chunks, 6)) < 1e-9


def test_systematic_sampler_point_placement(spark):
    rows = {r["doc_id"]: r for r in QUERIES["sample_weighted_systematic"](spark, SF).collect()}
    docs = sorted(
        table(spark, SF, "documents").select("doc_id", "n_chars").collect(),
        key=lambda r: r["doc_id"],
    )
    total = sum(r["n_chars"] for r in docs)
    # definition: point m (m = 1..50) sits at position m*total/50; a doc
    # spanning (lo, cum] is picked once per point inside its span —
    # checked by exact cross-multiplication, no float ever
    cum = 0
    expect = {}
    for r in docs:
        lo, cum = cum, cum + r["n_chars"]
        c = sum(1 for m in range(1, 51) if lo * 50 < m * total <= cum * 50)
        if c:
            expect[r["doc_id"]] = (r["n_chars"], cum, c)
    # engine emits copies = floor(cum*50/total) - floor(cum_before*50/total);
    # recompute that formula independently too
    expect2 = {}
    cum = 0
    for r in docs:
        lo, cum = cum, cum + r["n_chars"]
        c = (cum * 50) // total - (lo * 50) // total
        if c:
            expect2[r["doc_id"]] = (r["n_chars"], cum, c)
    assert set(rows) == set(expect2)
    for doc_id, (w, c, n) in expect2.items():
        assert rows[doc_id]["w"] == w
        assert rows[doc_id]["cum"] == c
        assert rows[doc_id]["n_copies"] == n
    # the floor-difference formula and the point-placement definition are
    # the same function — and the total is exactly 50, zero variance
    assert expect == expect2
    assert sum(r["n_copies"] for r in rows.values()) == 50


def test_cochran_armitage_closed_form(spark):
    row = QUERIES["agg_cochran_armitage"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").select("ts", "event_type").collect()
    cells_n, cells_r = Counter(), Counter()
    for r in ev:
        dose = (r["ts"].date().isoweekday() % 7) + 1  # Sunday=1 .. Saturday=7
        cells_n[dose] += 1
        cells_r[dose] += r["event_type"] == "purchase"
    n = sum(cells_n.values())
    rr = sum(cells_r.values())
    swr = sum(d * c for d, c in cells_r.items())
    swn = sum(d * c for d, c in cells_n.items())
    sw2n = sum(d * d * c for d, c in cells_n.items())
    num = n * swr - rr * swn
    den = math.sqrt(rr * (n - rr) * (n * sw2n - swn * swn) / n)
    assert row["n_groups"] == len(cells_n)
    assert row["n_total"] == n
    assert row["n_success"] == rr
    assert row["t_num"] == num
    assert abs(row["z_stat"] - num / den) < 1e-5
