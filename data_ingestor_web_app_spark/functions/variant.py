"""Semi-structured VARIANT surface (Spark 4 parse_json/variant_get).

VARIANT is Spark 4's binary semi-structured type: parse once, then typed
path extraction without per-access re-parsing — the scale answer to
schema-on-read JSON columns (the events.props column here). The oracle
extracts the same paths with DuckDB's JSON operators, plus analytic
identities for the struct round-trip, so the surface is hash-checked.

Reference parity: reference/main.go has no JSON query surface (it only
emits JSON lines, R11); SURVEY.md §2C widening.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           event_type AS et,
           user_id % 11 AS arr1,
           CAST(user_id % 7 + user_id % 11 AS BIGINT) AS arr_sum
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT round trip: (a) parse the stored JSON props column and pull a
    typed field; (b) build a nested doc (struct + array → to_json), parse it
    to VARIANT, and extract a string field, an array element by index, and
    a fold over the array. The oracle recomputes every extraction
    analytically (the doc is built from the same columns), so a hash match
    proves parse→extract loses nothing.

    Plan shape for 100 TB: parse_json is a per-row JVM expression inside
    codegen — narrow projection, zero shuffles. The production win vs
    get_json_object: one parse feeding N typed variant_get calls instead of
    N text re-parses of the same blob."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
        F.expr(
            "variant_get(parse_json(to_json(named_struct("
            "'et', event_type, 'arr', array(user_id % 7, user_id % 11)"
            "))), '$.et', 'string')"
        ).alias("et"),
        F.expr(
            "variant_get(parse_json(to_json(named_struct("
            "'et', event_type, 'arr', array(user_id % 7, user_id % 11)"
            "))), '$.arr[1]', 'bigint')"
        ).alias("arr1"),
        (
            F.expr(
                "variant_get(parse_json(to_json(named_struct("
                "'et', event_type, 'arr', array(user_id % 7, user_id % 11)"
                "))), '$.arr[0]', 'bigint')"
            )
            + F.expr(
                "variant_get(parse_json(to_json(named_struct("
                "'et', event_type, 'arr', array(user_id % 7, user_id % 11)"
                "))), '$.arr[1]', 'bigint')"
            )
        ).alias("arr_sum"),
    )


@query(
    "udf_arrow_optimized",
    oracle="""
    SELECT event_id,
           CAST(LEN(event_type) AS BIGINT) AS type_len,
           CAST(LEN(event_type) * 2 + (event_id % 7) AS BIGINT) AS mixed
    FROM events
    """,
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (Spark 4 `@udf(..., useArrow=True)`)
    — completes the Python-boundary matrix next to pandas_udf (udf_quote),
    UDTF (udtf_explode_payload), applyInPandas (udaf_gap_sessions /
    pipeline_pack_greedy) and mapInPandas (multimodal): same Arrow columnar
    transfer as a pandas_udf but with per-value Python semantics, the
    drop-in upgrade for legacy row UDFs that can't be vectorized.

    The UDF computes len(event_type); the 'mixed' column then combines the
    UDF output with JVM-side arithmetic, proving results flow back into
    codegen expressions. Oracle recomputes both analytically.

    Scale posture: still the slow path vs built-ins — keep Python off the
    hot loop; when unavoidable, Arrow batching beats pickled row UDFs by
    ~10-100× (the reason this surface exists at all)."""
    from pyspark.sql.functions import udf

    @udf("long", useArrow=True)
    def py_len(s: str):
        return len(s) if s is not None else None

    e = table(spark, sf_dir, "events")
    tl = py_len(F.col("event_type"))
    return e.select(
        "event_id",
        tl.alias("type_len"),
        (tl * 2 + F.col("event_id") % 7).alias("mixed"),
    )
