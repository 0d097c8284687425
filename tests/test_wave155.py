"""Wave-155: UUIDv3 vs python uuid module; Beta posterior identities."""

from __future__ import annotations

import uuid

from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_uuid_v3_shape_and_determinism(spark):
    rows = QUERIES["fn_uuid_v3"](spark, SF).collect()
    assert rows
    import re

    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    seen = set()
    for r in rows:
        u = r["uuid_v3"]
        assert pat.match(u), u
        assert u not in seen  # distinct keys -> distinct uuids
        seen.add(u)
        # digits besides version/variant nibbles come straight from md5 of
        # the namespaced name (matches a python reconstruction)
        import hashlib

        hx = hashlib.md5(f"order-ns:{r['o_orderkey']}".encode()).hexdigest()
        assert u.replace("-", "")[:12] == hx[:12]
        assert u.replace("-", "")[13:16] == hx[13:16]
        assert u.replace("-", "")[17:] == hx[17:]
    # round-trip through the stdlib parser (validates RFC shape + version)
    parsed = uuid.UUID(rows[0]["uuid_v3"])
    assert parsed.version == 3


def test_beta_posteriors_consistent(spark):
    rows = QUERIES["model_beta_posterior_arms"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["alpha_post"] == 1 + r["s"]
        assert r["beta_post"] == 1 + r["n"] - r["s"]
        mean = r["alpha_post"] / (r["alpha_post"] + r["beta_post"])
        assert abs(r["post_mean"] - mean) < 1e-6
        assert r["ci_lo"] <= r["post_mean"] <= r["ci_hi"]
        assert r["post_sd"] > 0
