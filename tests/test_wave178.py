"""Wave-178: count-min guarantees, Croston recomputed in pure Python,
family-size mass conservation."""

from __future__ import annotations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_countmin_never_undercounts_and_conserves_mass(spark):
    rows = QUERIES["agg_countmin_exact"](spark, SF).collect()
    n_events = table(spark, SF, "events").count()
    assert sum(r["n_exact"] for r in rows) == n_events
    for r in rows:
        assert r["n_est"] >= r["n_exact"], r  # CM never undercounts
        assert r["overestimate"] == r["n_est"] - r["n_exact"]
    # 15 users across 4x64 buckets: some user must have a collision-free row
    assert any(r["overestimate"] == 0 for r in rows)


def test_croston_matches_pure_python_recurrence(spark):
    out = {r["s_suppkey"]: r for r in QUERIES["events_croston_intermittent"](spark, SF).collect()}
    li = (
        table(spark, SF, "lineitem")
        .selectExpr("l_suppkey", "CAST(l_shipdate AS DATE) AS d", "l_quantity")
        .collect()
    )
    from collections import defaultdict

    daily = defaultdict(float)
    for r in li:
        daily[(r["l_suppkey"], r["d"])] += r["l_quantity"]
    series = defaultdict(list)
    for (k, d), z in sorted(daily.items()):
        series[k].append((d, z))
    assert set(series) == set(out)
    for k, pts in series.items():
        z_hat = pts[0][1]
        for _, z in pts[1:]:
            z_hat = 0.5 * z + 0.5 * z_hat
        gaps = [(b[0] - a[0]).days for a, b in zip(pts, pts[1:])]
        p_hat = float(gaps[0])
        for g in gaps[1:]:
            p_hat = 0.5 * g + 0.5 * p_hat
        assert out[k]["n_demand_days"] == len(pts)
        assert out[k]["z_hat"] == z_hat, k  # dyadic fold: bit-exact
        assert out[k]["p_hat"] == p_hat, k
        assert out[k]["croston_rate"] == z_hat / p_hat, k
        assert p_hat >= 1.0  # intervals are whole days


def test_family_sizes_conserve_documents(spark):
    rows = QUERIES["dedup_family_sizes"](spark, SF).collect()
    n_docs = table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["n_docs"] == r["family_size"] * r["n_families"]
        assert r["n_removable"] == r["n_docs"] - r["n_families"]
    by_size = {r["family_size"]: r for r in rows}
    # singletons exist and no family of size 1 double-counts them
    assert by_size[1]["n_removable"] == 0
    # the fixture corpus is dup-dense by construction: some family >= 2
    assert any(s >= 2 for s in by_size)
