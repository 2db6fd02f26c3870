"""Kafka source/sink builders (SURVEY.md §2.1 S1-S4).

Mirrors the reference's consumer configuration
(spark_job/spark_streaming.py:572-599): subscribe, latest offsets,
per-trigger rate limit, tolerate data loss.  The Kafka connector jar
is not present in the test container, so these builders only assemble
configuration; ``.load()`` raises a clear error if the connector is
missing (tests use the file/rate sources instead — sources/files.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Topology constants from the reference deployment
# (docker-compose.yml:130-139, .env.example).
VOD_TOPIC = "vod-chunks"
LIVE_TOPIC = "live-chunks"
DEFAULT_BROKERS = "localhost:9092"


def kafka_stream(
    spark: SparkSession,
    topic: str,
    brokers: str = DEFAULT_BROKERS,
    max_offsets_per_trigger: int | None = None,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Streaming DataFrame over a Kafka topic — the engine's S1/S2.

    Rate limiting via maxOffsetsPerTrigger (reference uses 10 for VOD,
    100 for live: spark_streaming.py:578,595); failOnDataLoss=false
    matches the reference's tolerance for expired offsets."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def decode_json_values(
    raw: DataFrame, schema: T.StructType, dead_letter: bool = False
) -> DataFrame:
    """S3 — executor-side JSON decode replacing the reference's
    driver-side per-row json.loads (spark_streaming.py:513,536):
    ``CAST(value AS STRING)`` -> ``from_json`` -> flatten.  Malformed
    rows surface as a null struct (filterable), not an exception.

    ``dead_letter=True`` adds a ``_raw_value`` column carrying the
    ORIGINAL payload for every row that did not decode CLEANLY —
    unparseable JSON and partially-corrupt records alike (PERMISSIVE
    ``from_json`` with columnNameOfCorruptRecord sets it on any
    malformed field, while possibly still decoding the others).  The
    routing contract is therefore a PARTITION on this one column:
    main path = ``filter(_raw_value IS NULL)``, quarantine =
    ``filter(_raw_value IS NOT NULL)`` — never route on a decoded
    field's nullness, or a partially-corrupt record would reach both
    sinks.  This replaces the reference's log-and-drop
    (spark_streaming.py:536) with inspect-and-replay."""
    if "timestamp" in raw.columns:  # kafka record timestamp (P1's projection)
        raw = raw.withColumnRenamed("timestamp", "kafka_timestamp")
    extra = ["kafka_timestamp"] if "kafka_timestamp" in raw.columns else []
    if dead_letter:
        dl_schema = T.StructType(
            list(schema.fields) + [T.StructField("_raw_value", T.StringType())]
        )
        decoded = raw.withColumn(
            "data",
            F.from_json(
                F.col("value").cast("string"),
                dl_schema,
                {"columnNameOfCorruptRecord": "_raw_value"},
            ),
        )
    else:
        decoded = raw.withColumn(
            "data", F.from_json(F.col("value").cast("string"), schema)
        )
    return decoded.select("data.*", *extra)


def kafka_batch_sink(df: DataFrame, topic: str, brokers: str = DEFAULT_BROKERS) -> None:
    """S4 — batch write of records to Kafka: serialize the row to JSON
    in the value column (the engine-side analog of the reference's
    producer with acks=all, producer.py:108-116)."""
    (
        df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .save()
    )
