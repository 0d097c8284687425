"""Multimodal columns (north-star addition): image/audio/video payloads as
opaque binary columns with typed metadata.

The container has no image/audio codecs, so the DECODE step is a clearly
marked deterministic stub (structure, schema, batching are real; pixel math
is fake). Everything around it — binary columns, metadata extraction,
Arrow-batched mapInPandas plumbing, frame-row fan-out — is the production
shape: swap `_fake_decode` for PIL/libav and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "mm_metadata",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           SHA256(text) AS content_sha256,
           'application/octet-stream' AS mime,
           CAST(FLOOR(OCTET_LENGTH(CAST(text AS BLOB)) / 100) AS BIGINT) AS n_frames_est
    FROM documents
    WHERE OCTET_LENGTH(CAST(text AS BLOB)) > 0
    """,
)
def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column (documents.text cast to
    bytes stands in for image/audio blobs): size, content hash, mime,
    estimated frame count. Pure JVM expressions — metadata extraction never
    decodes the payload, so it runs at full scan speed at 100 TB."""
    d = table(spark, sf_dir, "documents")
    blob = F.col("text").cast("binary")
    n_bytes = F.octet_length(blob)
    return d.where(n_bytes > 0).select(
        "doc_id",
        n_bytes.cast("long").alias("n_bytes"),
        F.sha2(blob, 256).alias("content_sha256"),
        F.lit("application/octet-stream").alias("mime"),
        F.floor(n_bytes / 100).alias("n_frames_est"),
    )


def _fake_decode(payload: bytes) -> dict:
    """STUB: deterministic stand-in for an image/audio decoder.

    Real deployment: `PIL.Image.open(io.BytesIO(payload))` /
    `soundfile.read` here — NotImplementedError semantics are faked with
    stable arithmetic on the raw bytes so tests are reproducible without
    codec libraries."""
    n = len(payload)
    checksum = sum(payload[:64]) % 256
    return {
        "width": 32 + checksum % 32,
        "height": 32 + (checksum * 7) % 32,
        "mean_intensity": float(sum(payload[:256])) / max(1, min(n, 256)),
    }


@query("mm_decode_stub")  # rows-only: decode is a stubbed codec
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas: each batch of
    binary payloads becomes a batch of fixed-schema feature rows. The
    partition-parallel batching is exactly the production plumbing; only
    `_fake_decode`'s body is a stub (no codecs in this container)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(lambda b: _fake_decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": feats.map(lambda f: f["width"]),
                    "height": feats.map(lambda f: f["height"]),
                    "mean_intensity": feats.map(lambda f: round(f["mean_intensity"], 4)),
                }
            )

    return d.mapInPandas(
        decode_batches,
        schema="doc_id long, width int, height int, mean_intensity double",
    )


@query("mm_frame_sample")  # rows-only: frame fan-out over stubbed decode
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one payload → N frame rows (every 100th byte offset
    stands in for every Nth video frame). mapInPandas fan-out with a
    deterministic per-frame feature; the row-multiplying batch shape is what
    a real frame sampler produces."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_byte": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for idx, off in enumerate(range(0, len(raw), 100)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_byte"].append(raw[off])
            yield pd.DataFrame(out)

    return d.mapInPandas(
        sample_frames,
        schema="doc_id long, frame_idx int, frame_byte int",
    )


@query(
    "mm_binaryfile_source",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           SHA256(text) AS content_sha256
    FROM documents WHERE doc_id < 100
    """,
)
def mm_binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production loading path for image/audio/video dirs: Spark's
    binaryFile source (one row per file: path, length, content bytes).
    First 100 documents are materialized as individual payload files
    (standing in for .jpg/.wav blobs), then read back through
    format("binaryFile"); identity is recovered from the filename and the
    content hash matches the source table — proving the dir→DataFrame
    loading step is lossless. At 100 TB this reads S3/HDFS listings with
    pathGlobFilter + partition-parallel file reads."""
    import os
    import tempfile

    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    out = tempfile.mkdtemp(prefix="mm_files_")

    # one file per payload, named by doc_id (test-scale materialization;
    # rows stay executor-side via foreachPartition)
    def write_files(rows):  # noqa: ANN001
        for r in rows:
            with open(os.path.join(out, f"{r['doc_id']:06d}.bin"), "wb") as f:
                f.write(r["text"].encode("utf-8"))

    d.select("doc_id", "text").foreachPartition(write_files)

    back = spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(out)
    return back.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1).cast("long").alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.sha2("content", 256).alias("content_sha256"),
    )
