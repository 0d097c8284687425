"""Wave-175: check digits vs python reference implementations."""

from __future__ import annotations

from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"

DAMM = [
    [0,3,1,7,5,9,8,6,4,2],[7,0,9,2,1,5,4,8,6,3],[4,2,0,6,8,7,1,3,5,9],
    [1,7,5,0,9,8,3,4,2,6],[6,1,2,3,0,4,5,9,7,8],[3,6,7,4,2,0,9,5,8,1],
    [5,8,6,9,7,2,0,1,3,4],[8,9,4,5,3,6,2,0,1,7],[9,4,3,8,6,1,7,2,0,5],
    [2,5,8,1,4,3,6,7,9,0],
]


def _luhn_check(payload: str) -> int:
    total = 0
    for i, ch in enumerate(reversed(payload), start=1):
        d = int(ch)
        if i % 2 == 1:  # rightmost payload digit doubles (it becomes
            d = d * 2   # position 2 once the check digit is appended)
            if d > 9:
                d -= 9
        total += d
    return (10 - total % 10) % 10


def _damm_check(payload: str) -> int:
    interim = 0
    for ch in payload:
        interim = DAMM[interim][int(ch)]
    return interim


def test_luhn_matches_reference(spark):
    rows = QUERIES["fn_luhn_checksum"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["check_digit"] == _luhn_check(r["payload"])
        # a valid Luhn full id re-sums to a multiple of 10
        total = 0
        for i, ch in enumerate(reversed(r["full_id"]), start=1):
            d = int(ch)
            if i % 2 == 0:
                d = d * 2 - (9 if d * 2 > 9 else 0)
            total += d
        assert total % 10 == 0


def test_damm_matches_reference_and_validates_to_zero(spark):
    rows = QUERIES["fn_damm_checksum"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["check_digit"] == _damm_check(r["payload"])
        interim = 0
        for ch in r["full_id"]:
            interim = DAMM[interim][int(ch)]
        assert interim == 0  # the Damm validation invariant


def test_mod97_matches_reference(spark):
    rows = QUERIES["fn_mod97_check"](spark, SF).collect()
    assert rows
    for r in rows:
        rem = int(r["payload"]) % 97
        assert r["check_pair"] == 98 - (rem * 100) % 97
        assert r["self_validates"] is True
        # the ISO 7064 property: payload*100 + check ≡ 98 ≡ 1+97 (mod 97)
        assert (int(r["payload"]) * 100 + r["check_pair"]) % 97 == 1
