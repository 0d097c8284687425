"""Wave-71 semantic checks."""

from __future__ import annotations

from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_audio_gate_fractions_bounded_and_mixed(spark):
    rows = QUERIES["mm_audio_energy_gate"](spark, SF_SMALL).collect()
    assert len(rows) == 200
    for r in rows:
        assert 0 <= r.n_active <= r.n_frames
        assert abs(r.active_frac - r.n_active / r.n_frames) < 1e-12
        assert 3 <= r.n_frames <= 5  # 800..1520 samples / 256
    # the sawtooth synthesis straddles the uniform noise floor: both
    # gated and passing frames must exist corpus-wide
    assert any(r.n_active > 0 for r in rows)
    assert any(r.n_active < r.n_frames for r in rows)


def test_lorenz_deciles_monotone_convex(spark):
    rows = sorted(
        QUERIES["events_lorenz_deciles"](spark, SF_SMALL).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    # tiles ordered by value: PER-USER share is nondecreasing (raw tile
    # share dips where NTILE hands a tile one fewer user — 15 users / 10
    # tiles at sf0.001)
    shares = [r.revenue_share / r.n_users for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(shares, shares[1:]))
    assert abs(rows[-1].cum_share - 1.0) < 1e-6
    # population split is even to within one user
    assert max(r.n_users for r in rows) - min(r.n_users for r in rows) <= 1


def test_loo_values_reconcile_to_corpus_mean(spark):
    rows = QUERIES["pipeline_loo_source_value"](spark, SF_SMALL).collect()
    assert len(rows) == 20
    cm = rows[0].corpus_mean_q
    for r in rows:
        assert r.corpus_mean_q == cm
        # the weighted mix of with/without must reproduce the corpus mean
        n_tot = sum(x.n for x in rows)
        recon = (r.source_mean_q * r.n + r.mean_q_without * (n_tot - r.n)) / n_tot
        assert abs(recon - cm) < 1e-4
        assert abs(r.marginal_value - (cm - r.mean_q_without)) < 1e-5
    # marginal values must split both ways around zero
    assert any(r.marginal_value > 0 for r in rows)
    assert any(r.marginal_value < 0 for r in rows)
