"""Kafka source/sink builders (S1/S2/S5/S6 transport in SURVEY §2.1).

The reference consumes/produces JSON on 7 topics with kafka-python
(consumers/db_writer.py:45-52, producers/*). Here each topic becomes a
``readStream.format("kafka")`` with the topic's StructType applied at the
silver boundary, and sinks are ``writeStream.format("kafka")`` with
``to_json(struct(*))`` — the F4 serialize the producers do by hand.

This environment has no Kafka broker or spark-sql-kafka jars, so builders
only *construct* the plan; ``kafka_available()`` gates tests. The offsets
semantics map: reference auto-commit at-least-once -> Spark checkpoints
(exactly-once to idempotent sinks, SURVEY T6), startingOffsets mirrors the
per-service earliest/latest choices (db_writer earliest at :48,
ws_manager latest at :10-16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark import schemas


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark.readStream.format("kafka").option("subscribe", "probe").option(
            "kafka.bootstrap.servers", "localhost:9092"
        ).load()
        return True
    except Exception:
        return False


def read_topic_stream(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka topic -> bronze-shaped streaming DataFrame (schemas.BRONZE):
    raw value string preserved for reprocessability, offsets kept for dedup."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("kafka_timestamp"),
        F.current_timestamp().alias("ingested_at"),
        F.col("value").cast("string").alias("payload"),
    )


def write_topic_stream(df: DataFrame, bootstrap: str, topic: str, checkpoint: str):
    """JSON-serialize all columns to the Kafka value (F4) and start the sink."""
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def parse_topic(bronze: DataFrame, topic: str) -> DataFrame:
    """Apply the topic StructType to the raw payload (schema-on-read done
    once, at the silver boundary — the engine's answer to JSONB)."""
    return bronze.withColumn(
        "j", F.from_json("payload", schemas.TOPIC_SCHEMAS[topic])
    ).select("topic", "partition", "offset", "kafka_timestamp", "ingested_at", "j.*")
