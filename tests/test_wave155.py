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
    ns = uuid.UUID(bytes=b"ORDERNS-DATAENG!")
    seen = set()
    for r in rows:
        u = r["uuid_v3"]
        assert pat.match(u), u
        assert u not in seen  # distinct keys -> distinct uuids
        seen.add(u)
        # full RFC 4122 interop: every id equals the stdlib's uuid3 for
        # the same namespace UUID and name (r5 ADVICE fix)
        assert u == str(uuid.uuid3(ns, f"order-{r['o_orderkey']}"))
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
