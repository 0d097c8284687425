"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in ``data_ingestor_web_app_spark`` (one module
per operator family, SURVEY.md §2B); each operator registers its Spark
implementation and its DuckDB oracle side-by-side via the ``@query``
decorator in ``registry.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestor_web_app_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary, SURVEY §7 Phase 0) on
    /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["agg_groupby"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted keys are rows-only
    checks (approx/streaming-state/UDF-escaping ops, as declared in §2B)."""
    return dict(registry.ORACLES)
