"""Size-probe logging contract (ADVICE r10): the escalation probe must
report through the project logger — and distinguish a truly-absent path
(WARNING, legitimately 0) from a raised FS probe (ERROR, 0 is a guess)."""

from __future__ import annotations

import logging

from data_ingestor_web_app_spark.operators.wave31 import _events_input_bytes


def test_probe_real_path_positive(spark, sf_small):
    assert _events_input_bytes(spark, sf_small) > 0


def test_probe_absent_path_warns_via_logger(spark, caplog):
    with caplog.at_level(logging.WARNING, logger="data_ingestor_web_app_spark.wave31"):
        n = _events_input_bytes(spark, "/nonexistent/sfX")
    assert n == 0
    assert any(
        "does not exist" in r.message and r.levelno == logging.WARNING
        for r in caplog.records
    )


def test_probe_fs_error_logs_error(spark, caplog):
    # an unresolvable scheme makes the Hadoop probe raise -> ERROR, not a
    # silent empty-table verdict
    with caplog.at_level(logging.ERROR, logger="data_ingestor_web_app_spark.wave31"):
        n = _events_input_bytes(spark, "bogus-scheme://nowhere/sfX")
    assert n == 0
    assert any(
        "RAISED" in r.message and r.levelno == logging.ERROR
        for r in caplog.records
    )
