"""Sources layer: REST micro-batch ingest (S3/S4) and Kafka plan builders
(S1/S2/S5/S6). No broker/network in this environment, so the REST fetcher is
injected and the Kafka tests only assert plan construction + the silver-side
payload parse (which is plain batch code, testable on static DataFrames)."""

from __future__ import annotations

import json

import pytest

from kafka_streaming_polymarket_pipeline_spark import schemas
from kafka_streaming_polymarket_pipeline_spark.sources import kafka as ksrc
from kafka_streaming_polymarket_pipeline_spark.sources import rest


def test_fetch_to_bronze_envelope(spark, tmp_path):
    markets = [
        {"market_id": "m1", "question": "Bitcoin Up or Down?", "active": True},
        {"market_id": "m2", "question": "ETH?", "active": False},
    ]
    out = str(tmp_path / "bronze_markets")
    df = rest.fetch_to_bronze(spark, lambda: markets, "market-updates", out)
    rows = df.collect()
    assert [f.name for f in df.schema.fields] == [
        "topic", "partition", "offset", "kafka_timestamp", "ingested_at", "payload",
    ]
    assert {r.topic for r in rows} == {"market-updates"}
    assert {json.loads(r.payload)["market_id"] for r in rows} == {"m1", "m2"}
    # persisted bronze is readable back with the same schema
    back = spark.read.parquet(out)
    assert back.count() == 2


def test_fetch_to_bronze_pushdown_params_match_reference():
    # Source-side pushdown stays in the ingest parameters (SURVEY §4).
    assert rest.GAMMA_MARKETS_PARAMS == {"tag_id": 102467, "closed": "false"}
    assert rest.GOLDSKY_TOP_K == 1000
    assert rest.GOLDSKY_ORDER == ("balance", "desc")


def test_parse_topic_applies_schema(spark):
    payloads = [
        {"symbol": "BTC-USD", "price": 97000.5, "timestamp": "2026-01-01T00:00:00", "volume": 1.5},
        {"symbol": "BTC-USD", "price": 97001.0, "timestamp": "2026-01-01T00:00:01", "volume": 2.0},
    ]
    bronze = rest.fetch_to_bronze(spark, lambda: payloads, "asset-prices")
    typed = ksrc.parse_topic(bronze, "asset-prices")
    got = {r.price for r in typed.select("price").collect()}
    assert got == {97000.5, 97001.0}
    # schema-on-read: typed columns come from the topic StructType
    names = {f.name for f in typed.schema.fields}
    for f in schemas.TOPIC_SCHEMAS["asset-prices"].fieldNames():
        assert f in names


def test_kafka_builders_construct_or_gate(spark):
    # No spark-sql-kafka jars here: the availability probe must say so, and
    # the builder must fail only at .load() (i.e. our plan code is sound).
    if ksrc.kafka_available(spark):
        df = ksrc.read_topic_stream(spark, "localhost:9092", "asset-prices")
        assert df.isStreaming
    else:
        with pytest.raises(Exception):
            ksrc.read_topic_stream(spark, "localhost:9092", "asset-prices")
