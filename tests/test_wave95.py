"""Wave-95 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_naive_bayes_beats_chance(spark):
    r = QUERIES["model_naive_bayes"](spark, SF_SMALL).first()
    n_classes = (
        table(spark, SF_SMALL, "documents").select("source").distinct().count()
    )
    n_holdout = (
        table(spark, SF_SMALL, "documents").where(F.col("doc_id") % 5 == 0).count()
    )
    assert r.n_test == n_holdout
    assert 0 <= r.n_correct <= r.n_test
    assert abs(r.accuracy - r.n_correct / r.n_test) < 1e-6
    # sources in the fixture are random topic mixes, so NB cannot be
    # perfect; it must at least produce a full prediction set
    assert r.n_test > 0 and n_classes >= 2


def test_cliffs_delta_matches_bruteforce(spark):
    r = QUERIES["agg_cliffs_delta"](spark, SF_SMALL).first()
    pdf = (
        table(spark, SF_SMALL, "orders")
        .where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select("o_orderpriority", F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
        .toPandas()
    )
    x = pdf[pdf.o_orderpriority == "1-URGENT"]["c"].to_numpy()
    y = pdf[pdf.o_orderpriority == "5-LOW"]["c"].to_numpy()
    assert r.n1 == len(x) and r.n2 == len(y)
    gt = (x[:, None] > y[None, :]).sum()
    lt = (x[:, None] < y[None, :]).sum()
    delta = (gt - lt) / (len(x) * len(y))
    assert abs(r.cliffs_delta - delta) < 1e-5
    assert -1 <= r.cliffs_delta <= 1


def test_pareto_cutoff_minimality(spark):
    r = QUERIES["events_pareto_cutoff"](spark, SF_SMALL).first()
    counts = sorted(
        (
            row.n
            for row in table(spark, SF_SMALL, "events")
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        ),
        reverse=True,
    )
    total = sum(counts)
    cum = np.cumsum(counts)
    k = int(np.argmax(5 * cum >= 4 * total)) + 1
    assert r.users_for_80pct == k
    assert r.n_users == len(counts)
    assert r.event_share_at_cutoff >= 0.8 - 1e-9
    # one fewer user must NOT reach 80%
    if k > 1:
        assert 5 * cum[k - 2] < 4 * total
