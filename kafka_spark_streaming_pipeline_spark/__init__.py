"""kafka_spark_streaming_pipeline_spark — a PySpark-native analytics engine.

A ground-up, Spark-first rebuild of the query and data-processing
capabilities of the reference pipeline (qalqahtani/kafka-spark-streaming-pipeline):
a Kafka -> Spark Structured Streaming video-chunk pipeline with per-event
validation, per-key stateful sequence analysis, derived HLS-manifest state,
and idempotent keyed sinks — re-expressed as declarative DataFrame/SQL plans
that Catalyst optimizes and distributes, plus large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing).

Layout:
  session    — SparkSession factory (AQE, Arrow, UTC, tuned shuffle)
  catalog    — test-table loaders / temp-view registration
  schemas    — explicit StructTypes for the event streams
  functions/ — scalar & manifest-rendering column expressions
  operators/ — reusable operator builders (windows, dedup, similarity, text)
  plans/     — the oracle-checked query registry (name -> builder + SQL)
  sources/   — batch/streaming source builders (parquet, kafka, rate)
  streaming/ — Structured Streaming pipeline, keyed state, idempotent sinks
"""

__version__ = "0.1.0"
