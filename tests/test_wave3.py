"""Semantic invariants for the wave-3 additions (tpch_more, pipeline_extra,
recursive). Oracle hash-parity is covered by tools/check_oracle.py; these
pin down properties a hash can't express — determinism across reruns,
conservation laws, and plan shapes for the new operators.
"""

from __future__ import annotations

import pytest

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

WAVE3 = [
    "tpch_q7", "tpch_q8", "tpch_q13", "tpch_q15",
    "pipeline_split_train_eval", "sample_stratified", "text_ngram_counts",
    "vq_int8_quantize", "pipeline_pack_offsets",
    "recursive_hierarchy", "recursive_graph_paths",
]


@pytest.mark.parametrize("name", WAVE3)
def test_wave3_runs_nonempty(spark, sf_small, name):
    df = QUERIES[name](spark, sf_small)
    assert len(df.columns) > 0
    assert df.count() > 0, f"{name} returned no rows at sf0.001"


def test_q13_distribution_conserves_customers(spark, sf_small):
    rows = QUERIES["tpch_q13"](spark, sf_small).collect()
    total = sum(r.custdist for r in rows)
    n_cust = table(spark, sf_small, "customer").count()
    assert total == n_cust  # every customer lands in exactly one c_count bin
    # zero-order customers (if the fixture has any) survive the outer join
    n_with_orders = (
        table(spark, sf_small, "orders").select("o_custkey").distinct().count()
    )
    zero_bin = next((r.custdist for r in rows if r.c_count == 0), 0)
    assert zero_bin == n_cust - n_with_orders


def test_q15_winner_is_global_max(spark, sf_small):
    import pyspark.sql.functions as F

    winners = QUERIES["tpch_q15"](spark, sf_small).collect()
    assert len(winners) >= 1
    li = table(spark, sf_small, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    best = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("r"))
        .agg(F.max("r").alias("m"))
        .collect()[0].m
    )
    for w in winners:
        assert w.total_revenue == best


def test_split_is_exhaustive_and_near_80_10_10(spark, sf_small):
    rows = {r.split: r.n_docs for r in QUERIES["pipeline_split_train_eval"](spark, sf_small).collect()}
    n_docs = table(spark, sf_small, "documents").count()
    assert sum(rows.values()) == n_docs
    assert set(rows) == {"train", "val", "test"}
    # md5 buckets are uniform; at n=500 docs the 80% band is comfortably wide
    assert 0.70 <= rows["train"] / n_docs <= 0.90


def test_split_and_sample_are_deterministic_across_runs(spark, sf_small):
    a = sorted(QUERIES["sample_stratified"](spark, sf_small).collect())
    b = sorted(QUERIES["sample_stratified"](spark, sf_small).collect())
    assert a == b  # pure md5 predicate: same kept set on every rerun
    kept = {r.lang: 0 for r in a}
    for r in a:
        kept[r.lang] += 1
    totals = {
        r.lang: r.n
        for r in table(spark, sf_small, "documents").groupBy("lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    # en is downsampled hardest; everything else keeps more
    assert kept["en"] / totals["en"] < 0.5
    for lang in ("de", "fr", "es"):
        assert kept[lang] == totals[lang]  # rate 1000/1000 keeps all


def test_vq_checksum_bounded_and_error_small(spark, sf_small):
    import pyspark.sql.functions as F

    df = QUERIES["vq_int8_quantize"](spark, sf_small)
    dim = 64
    bad = df.where((F.abs(F.col("q_checksum")) > 127 * dim) | (F.col("sq_err") < 0)).count()
    assert bad == 0
    # int8 quantization of a max-normalized vector: per-dim residual < scale/254
    stats = df.agg(F.max("sq_err").alias("m")).collect()[0]
    assert stats.m < dim * 1.0  # loose sanity bound; exact parity is the oracle's job


def test_pack_offsets_monotone_per_source(spark, sf_small):
    rows = QUERIES["pipeline_pack_offsets"](spark, sf_small).collect()
    by_src: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.source, r.doc_id)):
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        cum = 0
        prev_pack = 0
        for r in rs:
            assert r.pack_id == cum // 512, (src, r.doc_id)
            assert r.pack_id >= prev_pack  # packs never go backwards in stream order
            prev_pack = r.pack_id
            cum += r.n_tokens


def test_recursive_hierarchy_matches_digit_walk(spark, sf_small):
    for r in QUERIES["recursive_hierarchy"](spark, sf_small).collect():
        k = r.c_custkey
        depth = 0
        while k >= 10:
            k //= 10
            depth += 1
        assert (r.root, r.depth) == (k, depth), r.c_custkey


def test_recursive_graph_paths_depth_bounded(spark, sf_small):
    rows = QUERIES["recursive_graph_paths"](spark, sf_small).collect()
    assert {r.hops for r in rows} == {1, 2, 3}
    n_nation = table(spark, sf_small, "nation").count()
    assert sum(1 for r in rows if r.hops == 1) == n_nation


def test_q7_q8_broadcast_dims(spark, sf_small):
    from tests.test_scale_plans import plan

    for name in ("tpch_q7", "tpch_q8"):
        p = plan(spark, name, sf_small)
        assert "BroadcastHashJoin" in p, name
        assert "CartesianProduct" not in p, name


def test_split_and_sample_have_no_shuffle(spark, sf_small):
    from tests.test_scale_plans import plan

    # the sampling predicate is a pure projection/filter — scan-stage only
    p = plan(spark, "sample_stratified", sf_small)
    assert "Exchange" not in p


def test_ngram_topk_uses_heap_not_global_sort(spark, sf_small):
    from tests.test_scale_plans import plan

    p = plan(spark, "text_ngram_counts", sf_small)
    assert "TakeOrderedAndProject" in p


def test_pagerank_conserves_mass_and_is_uniform_on_circulant(spark, sf_small):
    rows = QUERIES["graph_pagerank_unrolled"](spark, sf_small).collect()
    assert len(rows) == 25
    # circulant graph is vertex-transitive: every node must get the same rank
    assert len({r.rank for r in rows}) == 1
    # fixed-point floor loses < 1 micro-unit per edge per iteration
    total = sum(r.rank for r in rows)
    assert 0.999e12 < total <= 1.0e12


def test_pii_scrub_masks_every_synthesized_leak(spark, sf_small):
    import pyspark.sql.functions as F

    df = QUERIES["text_pii_scrub"](spark, sf_small)
    bad = df.where(
        (F.col("n_emails") < 1)
        # the digit run only reaches the {4,} threshold once doc_id*7919 ≥ 1000
        | ((F.col("n_nums") < 1) & (F.col("doc_id") * 7919 >= 1000))
    ).count()
    assert bad == 0  # every synthesized email + qualifying digit run is caught


def test_pack_greedy_never_overflows_budget(spark, sf_small):
    rows = QUERIES["pipeline_pack_greedy"](spark, sf_small).collect()
    packs: dict[tuple, list] = {}
    for r in rows:
        packs.setdefault((r.source, r.pack_id), []).append(r.n_tokens)
    for (src, pid), sizes in packs.items():
        # a pack exceeds 512 only when a single oversized doc forced it
        assert sum(sizes) <= 512 or len(sizes) == 1, (src, pid, sizes)


def test_countmin_sketch_estimates_within_bound(spark, sf_small):
    """Independent CMS bound check: build the sketches directly (the query
    itself now emits the probe-based proof columns instead of raw bytes —
    r7 rows-only promotion) and verify 20 users per group."""
    import pyspark.sql.functions as F

    # the query's own proof columns must all hold
    for r in QUERIES["agg_countmin_sketch"](spark, sf_small).collect():
        assert r.within_eps_bound

    e = table(spark, sf_small, "events")
    rows = (
        e.groupBy("event_type")
        .agg(
            F.count_min_sketch(
                F.col("user_id"), F.lit(0.001), F.lit(0.99), F.lit(42)
            ).alias("sketch"),
            F.count("*").alias("n_events"),
        )
        .collect()
    )
    CMS = spark._jvm.org.apache.spark.util.sketch.CountMinSketch
    for r in rows:
        sk = CMS.readFrom(bytes(r.sketch))
        exact = {
            row.user_id: row.n
            for row in e.where(F.col("event_type") == r.event_type)
            .groupBy("user_id").agg(F.count("*").alias("n")).limit(20).collect()
        }
        for uid, n in exact.items():
            est = sk.estimateCount(uid)
            assert est >= n  # CMS never underestimates
            assert est <= n + 0.001 * r.n_events + 1  # eps·N additive bound


def test_phash_close_images_have_close_hashes(spark, sf_small):
    # query-level sanity: halves stay in 32-bit range, popcount consistent
    import pyspark.sql.functions as F

    df = QUERIES["mm_phash"](spark, sf_small)
    bad = df.where(
        (F.col("dhash_lo") < 0) | (F.col("dhash_lo") >= 2**32)
        | (F.col("dhash_hi") < 0) | (F.col("dhash_hi") >= 2**32)
        | (F.col("n_bits") != F.bit_count("dhash_lo") + F.bit_count("dhash_hi"))
    ).count()
    assert bad == 0
    # codec-level: a one-pixel change moves the dHash by only a few bits
    from data_ingestor_web_app_spark.llm.codecs import png_decode_gray, png_encode_gray

    def dhash(data: bytes) -> int:
        w, h, pix = png_decode_gray(data)
        out = 0
        for y in range(8):
            sy = y * h // 8
            row = [pix[sy * w + (x * w // 9)] for x in range(9)]
            for x in range(8):
                if row[x] > row[x + 1]:
                    out |= 1 << (y * 8 + x)
        return out

    base = png_encode_gray(20, 20, lambda x, y: (x * 7 + y * 13) % 256)
    tweaked = png_encode_gray(20, 20, lambda x, y: 255 if (x, y) == (5, 5) else (x * 7 + y * 13) % 256)
    dist = bin(dhash(base) ^ dhash(tweaked)).count("1")
    assert dist <= 4  # near-identical images land within a small hamming ball


def test_fn_variant_extracts_match_raw_json(spark, sf_small):
    import json

    import pyspark.sql.functions as F

    rows = QUERIES["fn_variant"](spark, sf_small).limit(50).collect()
    raw = {
        r.event_id: r.props
        for r in table(spark, sf_small, "events")
        .where(F.col("event_id").isin([r.event_id for r in rows])).collect()
    }
    for r in rows:
        assert r.k == json.loads(raw[r.event_id])["k"]
        assert r.arr_sum == r.arr1 + (r.arr_sum - r.arr1)  # fold consistency


def test_anomaly_zscore_matches_python_fold(spark, sf_small):
    import math

    rows = QUERIES["events_anomaly_zscore"](spark, sf_small).collect()
    by_key = {(r.user_id, r.event_id): r for r in rows}
    e = sorted(
        table(spark, sf_small, "events")
        .select("user_id", "ts", "event_id", "value").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    checked = 0
    hist: dict[int, list[int]] = {}
    for r in e:
        vi = math.floor(r.value * 1000)
        prev = hist.setdefault(r.user_id, [])
        if len(prev) >= 20:
            w = prev[-20:]
            s, ss = sum(w), sum(x * x for x in w)
            expect = (20 * vi - s) ** 2 > 9 * (20 * ss - s * s)
            got = by_key[(r.user_id, r.event_id)]
            assert got.is_anomaly == expect, (r.user_id, r.event_id)
            checked += 1
        prev.append(vi)
    assert checked == len(rows)  # exactly the full-window rows are emitted


def test_rolling_distinct_bounded_by_frame_and_domain(spark, sf_small):
    import pyspark.sql.functions as F

    df = QUERIES["win_rolling_distinct"](spark, sf_small)
    n_types = table(spark, sf_small, "events").select("event_type").distinct().count()
    bad = df.where((F.col("n_types") < 1) | (F.col("n_types") > min(11, n_types))).count()
    assert bad == 0


def test_containment_pairs_probe_side_broadcasts(spark, sf_small):
    from tests.test_scale_plans import plan

    p = plan(spark, "text_containment_pairs", sf_small)
    assert "BroadcastHashJoin" in p  # bounded eval side broadcasts
    assert "CartesianProduct" not in p
    rows = QUERIES["text_containment_pairs"](spark, sf_small).collect()
    for r in rows:
        assert 0.9 <= r.containment <= 1.0
        assert r.eval_id < 50  # probe bound respected
