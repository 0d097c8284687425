"""Wave-135: tail dependence bounds, transfer entropy reference, geohash
vs pure-python encoder."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def test_tail_dependence_bounds(spark):
    r = QUERIES["agg_copula_tail_dependence"](spark, SF).collect()[0]
    assert 0 <= r["joint_above_q90"] <= r["joint_above_q75"]
    assert 0.0 <= r["lambda_u_q75"] <= 1.0 + 1e-9
    assert 0.0 <= r["lambda_u_q90"] <= 1.0 + 1e-9


def test_transfer_entropy_nonnegative_and_bounded(spark):
    r = QUERIES["events_transfer_entropy"](spark, SF).collect()[0]
    # plug-in TE over binary states: 0 <= TE <= H(X') <= ln 2
    assert -1e-6 <= r["te_y_to_x"] <= 0.6932


def test_geohash_matches_python_reference(spark):
    rows = QUERIES["fn_geohash_encode"](spark, SF).collect()
    assert rows
    for r in rows[:100]:
        lat = r["ilat"] - 90 + 0.5
        lon = r["ilon"] - 180 + 0.5
        # reference: textbook bisection encoder, 30 bits lon-first
        lat_lo, lat_hi = -90.0, 90.0
        lon_lo, lon_hi = -180.0, 180.0
        bits = []
        for i in range(30):
            if i % 2 == 0:  # lon bit
                mid = (lon_lo + lon_hi) / 2
                bits.append(1 if lon >= mid else 0)
                lon_lo, lon_hi = (mid, lon_hi) if lon >= mid else (lon_lo, mid)
            else:
                mid = (lat_lo + lat_hi) / 2
                bits.append(1 if lat >= mid else 0)
                lat_lo, lat_hi = (mid, lat_hi) if lat >= mid else (lat_lo, mid)
        gh = 0
        for b in bits:
            gh = gh * 2 + b
        expect = "".join(_B32[(gh >> (25 - 5 * j)) & 31] for j in range(6))
        assert r["gh30"] == gh
        assert r["geohash6"] == expect
