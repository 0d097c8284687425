"""PySpark-native analytics engine with the query/data-processing surface of
the reference ingest app (brianbirir/data-ingestor-web-app, see SURVEY.md).

Everything is expressed Spark-first: DataFrame/SQL plans handed to Catalyst,
Structured Streaming for the unbounded paths, Pandas UDFs only where built-in
operators cannot express the semantics (Go `%q` quoting, custom session UDAF,
multimodal decode stubs).

Layout
------
- ``session``    SparkSession builder (AQE on, UTC, tuned shuffle partitions)
- ``io``         fixture table loading / temp-view registration
- ``registry``   the query inventory: name -> (spark, sf_dir) -> DataFrame,
                 plus the DuckDB oracle SQL used by the driver's hash check
- ``operators``  relational core: scans, filters, joins, aggregates, windows,
                 sorts/set-ops
- ``functions``  scalar function families (string/hex/date/math/cond/array/json)
- ``ingest``     replication of the reference's ingest dataflow (R4-R10, R19)
- ``streaming``  Structured Streaming: windows, watermark, dedup, stateful
                 counts, observe() metrics, multi-sink foreachBatch (R11-R16)
- ``llm``        LLM-data-pipeline ops: dedup (exact/minhash/simhash), cosine
                 similarity / ANN, text analysis, multimodal binary columns
"""

from data_ingestor_web_app_spark.registry import QUERIES, ORACLES, load_all

__all__ = ["QUERIES", "ORACLES", "load_all"]
