"""Jar-gated Kafka integration tests (SURVEY.md §2.1 S1/S2/S4).

The test container ships no spark-sql-kafka connector jar and has no
network egress, so these tests auto-skip here — they are the
ACTIVATION PATH for richer environments (see COVERAGE.md): drop the
connector jar on the classpath and the schema/decode contract lights
up; point KAFKA_BOOTSTRAP at a broker and the full produce→consume
round trip runs too.  Reference behavior being matched:
spark_job/spark_streaming.py:572-599 (subscribe, offsets, rate limit,
failOnDataLoss) and producer.py:108-116 (JSON value serialization).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_spark_streaming_pipeline_spark.schemas import LIVE_CHUNK_SCHEMA
from kafka_spark_streaming_pipeline_spark.sources.kafka import (
    decode_json_values,
    kafka_batch_sink,
    kafka_stream,
)

# The canonical Kafka source schema — fixed by the connector, known
# without any broker connection.
KAFKA_COLUMNS = {
    "key",
    "value",
    "topic",
    "partition",
    "offset",
    "timestamp",
    "timestampType",
}


def _kafka_reader_or_skip(spark):
    """Build the Kafka streaming reader; skip if the connector jar is
    not resolvable.  ``.load()`` only resolves the data source and its
    fixed schema — it does NOT contact a broker — so jar presence is
    exactly what this probes."""
    try:
        return kafka_stream(
            spark,
            "probe-topic",
            brokers=os.environ.get("KAFKA_BOOTSTRAP", "localhost:9092"),
            max_offsets_per_trigger=100,
            starting_offsets="earliest",
        )
    except Exception as exc:  # AnalysisException: Failed to find data source
        pytest.skip(f"spark-sql-kafka connector jar not on classpath: {exc}")


def test_kafka_stream_schema_and_decode_contract(spark):
    """With the jar present (no broker needed): the source exposes the
    canonical Kafka schema and decode_json_values plans the
    cast->from_json->flatten projection over it."""
    raw = _kafka_reader_or_skip(spark)
    assert raw.isStreaming
    assert set(raw.columns) == KAFKA_COLUMNS
    decoded = decode_json_values(raw, LIVE_CHUNK_SCHEMA)
    # every event field surfaces as a top-level column; the Kafka
    # record timestamp is preserved under its non-colliding name
    assert set(LIVE_CHUNK_SCHEMA.fieldNames()) <= set(decoded.columns)
    assert "kafka_timestamp" in decoded.columns


@pytest.mark.skipif(
    "KAFKA_BOOTSTRAP" not in os.environ,
    reason="set KAFKA_BOOTSTRAP=<host:port> to run the broker round trip",
)
def test_kafka_roundtrip_produce_consume(spark, tmp_path):
    """Full S1+S3+S4 path against a real broker: batch-produce JSON
    events, stream-consume them, decode, land in a memory sink."""
    brokers = os.environ["KAFKA_BOOTSTRAP"]
    topic = "it-roundtrip"
    events = spark.createDataFrame(
        [("s1", 0, 1000), ("s1", 1, 1001)],
        "stream_id string, chunk_index long, size_bytes long",
    )
    kafka_batch_sink(events, topic, brokers=brokers)

    raw = kafka_stream(spark, topic, brokers=brokers, starting_offsets="earliest")
    schema = "stream_id string, chunk_index long, size_bytes long"
    q = (
        raw.select(F.from_json(F.col("value").cast("string"), schema).alias("d"))
        .select("d.*")
        .writeStream.format("memory")
        .queryName("kafka_rt")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r.stream_id, r.chunk_index, r.size_bytes)
        for r in spark.sql("SELECT * FROM kafka_rt").collect()
    }
    assert {("s1", 0, 1000), ("s1", 1, 1001)} <= got
