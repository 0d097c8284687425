"""Wave-217: KMV set ops vs a python sketch replay + accuracy bound;
parameterized SQL vs the inlined equivalent."""

from __future__ import annotations

import hashlib

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _h(u) -> int:
    return int(hashlib.md5(str(u).encode()).hexdigest()[:12], 16)


def test_kmv_set_ops_replay_and_accuracy(spark):
    row = QUERIES["agg_kmv_set_ops"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").select("user_id", "event_type").collect()
    a = {r["user_id"] for r in ev if r["event_type"] == "purchase"}
    b = {r["user_id"] for r in ev if r["event_type"] == "click"}
    assert row["true_a"] == len(a)
    assert row["true_b"] == len(b)
    assert row["true_union"] == len(a | b)
    K, MAXH = 64, float(16**12)
    ska = sorted(((_h(u), u) for u in a))[:K]
    skb = sorted(((_h(u), u) for u in b))[:K]
    merged = sorted(set(ska) | set(skb))[:K]
    theta = merged[-1][0]
    # exhaustive mode at this SF: 15 users < k, estimate is exact
    union_est = (
        float(len(merged)) if len(merged) < K else (K - 1) * MAXH / theta
    )
    in_a = {t for t in merged if t in set(ska)}
    in_b = {t for t in merged if t in set(skb)}
    n_both = len(in_a & in_b)
    assert abs(row["union_est"] - union_est) < 1e-3
    assert abs(row["intersection_est"] - n_both * union_est / len(merged)) < 1e-3
    assert abs(row["jaccard_est"] - n_both / len(merged)) < 1e-6
    # exhaustive mode: the estimate is EXACT when the union fits in k
    if row["true_union"] <= K:
        assert row["union_est"] == row["true_union"]
    # populations overlap heavily in the fixture (same users do both)
    assert row["jaccard_est"] > 0.3


def test_parameterized_sql_matches_inline(spark):
    rows = QUERIES["sql_parameterized_query"](spark, SF).collect()
    inline = spark.sql(
        """
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(value), 2) AS total
        FROM events_param_v
        WHERE value >= 10.0 AND value < 100.0
          AND event_type IN ('purchase', 'click')
        GROUP BY event_type ORDER BY event_type
        """
    ).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in inline]
    assert {r["event_type"] for r in rows} == {"purchase", "click"}
