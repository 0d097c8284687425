"""mapInArrow — the last Python-boundary API in the matrix (pandas_udf →
udf_quote, Arrow-optimized udf → udf_arrow_optimized, UDTF →
udtf_explode_payload, applyInPandas → udaf_gap_sessions / events_rate_limit,
mapInPandas → multimodal): raw Arrow RecordBatches in and out, no pandas
conversion at all — the lowest-overhead Python hop Spark offers, the right
tool when the payload is already columnar (vectors, tensors).

Reference parity: SURVEY.md §2C widening (no reference counterpart — the
reference has no columnar surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "udf_map_in_arrow",
    oracle="""
    SELECT vec_id,
           CAST(LEN(embedding) AS INTEGER) AS dim,
           CAST(list_aggregate(
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                        * CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
               'sum') AS BIGINT) AS norm_sq_micro
    FROM embeddings
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector squared L2 norm in integer micro-units via mapInArrow.

    The Python side never builds pandas objects: it reads the ListArray's
    flat values buffer as one numpy view, quantizes to int64 micro-units
    (floor(x·1000) — float32 widened to float64 exactly, one IEEE
    multiply, so DuckDB's identical expression floors the identical
    double), squares, and segment-sums with np.add.reduceat over the
    list offsets — one vectorized pass per RecordBatch, zero per-row
    Python. Integer accumulation makes the result hash-exact (a float
    norm would depend on summation order; numpy pairwise-sums, SQL
    folds left — they'd drift).

    At 100 TB this is a narrow map stage: no shuffle, no state, Arrow
    batches stream through executors; the quantized norms then feed the
    similarity family (llm/similarity.py) without re-reading vectors."""
    import numpy as np
    import pyarrow as pa

    def norms(batches):
        for batch in batches:
            ids = batch.column("vec_id")
            lists = batch.column("embedding")
            if isinstance(lists, pa.ChunkedArray):  # defensive; batches are flat
                lists = lists.combine_chunks()
            offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            vals = lists.values.to_numpy(zero_copy_only=False).astype(np.float64)
            micro = np.floor(vals * 1000.0).astype(np.int64)
            sq = micro * micro
            # cumulative trick handles empty lists; reduceat can't
            csum = np.concatenate(([0], np.cumsum(sq)))
            seg = csum[offsets[1:]] - csum[offsets[:-1]]
            dims = (offsets[1:] - offsets[:-1]).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(dims, pa.int32()), pa.array(seg, pa.int64())],
                ["vec_id", "dim", "norm_sq_micro"],
            )

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInArrow(norms, "vec_id long, dim int, norm_sq_micro long")
