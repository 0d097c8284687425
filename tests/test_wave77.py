"""Wave-77 semantic checks."""

from __future__ import annotations

from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_growth_accounting_identities(spark):
    rows = sorted(
        QUERIES["events_growth_accounting"](spark, SF_SMALL).collect(),
        key=lambda r: r.d,
    )
    assert rows
    prev_dau = None
    for r in rows:
        # composition identity: DAU = new + retained + resurrected
        assert r.dau == r.n_new + r.n_retained + r.n_resurrected, r
        # flow identity: DAU_t - DAU_{t-1} = new + resurrected - churned
        if prev_dau is not None:
            assert r.dau - prev_dau == r.n_new + r.n_resurrected - r.n_churned, r
        prev_dau = r.dau
    assert rows[0].n_new == rows[0].dau  # day one: everyone is new


def test_binary_quantization_recall_bounds(spark):
    r = QUERIES["sim_binary_quantization_recall"](spark, SF_SMALL).first()
    assert r.n_queries == 20
    assert 0 <= r.recall_at_10 <= 1
    # sign bits on 64 dims retain real signal: far better than the
    # ~2% recall random top-10 of 500 would give
    assert r.recall_at_10 > 0.2
