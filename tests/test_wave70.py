"""Wave-70 semantic checks."""

from __future__ import annotations

from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_obf_boundaries_decrease_and_looks_accumulate(spark):
    rows = sorted(
        QUERIES["events_sequential_test_obrien"](spark, SF_SMALL).collect(),
        key=lambda r: r.look,
    )
    assert [r.look for r in rows] == [1, 2, 3, 4]
    bounds = [r.boundary for r in rows]
    assert bounds == sorted(bounds, reverse=True)  # OBF spends alpha late
    ns = [r.n_obs for r in rows]
    assert ns == sorted(ns)  # cumulative looks only grow
    for r in rows:
        assert r.stop_early == (abs(r.z) > r.boundary)
        # a null A/A split (md5 halves of the same population) should
        # essentially never cross the miserly early boundaries
        if r.look <= 2:
            assert not r.stop_early


def test_svd_power_iteration_unit_vector(spark):
    rows = QUERIES["model_svd_power_iteration"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    norm_sq = sum(r.v1_component ** 2 for r in rows)
    assert abs(norm_sq - 1.0) < 1e-4
    # count matrices are nonnegative: Perron-Frobenius gives a
    # nonnegative dominant vector
    assert all(r.v1_component >= 0 for r in rows)
    assert rows[0].sigma_estimate > 0


def test_hnsw_levels_geometric(spark):
    rows = {r.level: r for r in QUERIES["sim_hnsw_levels"](spark, SF_SMALL).collect()}
    assert 0 in rows
    # level 0 holds about half the nodes; occupancy decays over the
    # uncapped low levels (the capped tail at 5-6 jitters at n=500)
    assert 0.4 < rows[0].frac < 0.6
    fracs = [rows[k].frac for k in sorted(rows) if k <= 4]
    assert all(a >= b for a, b in zip(fracs, fracs[1:]))
    for k in (0, 1, 2):
        assert abs(rows[k].frac - rows[k].expected_frac) < 0.06
    total = sum(r.n_nodes for r in rows.values())
    assert total == 500
