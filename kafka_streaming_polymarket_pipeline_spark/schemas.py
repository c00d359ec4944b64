"""Typed StructTypes for every message family on the reference's wire.

Wire shapes are documented in FIXTURES.md and cited to producer code in
/root/reference — field names/types match the wire exactly (including the
reference's quirks we then *fix* at the silver layer: ISO-8601 string
timestamps, string-typed final prices at market_resolution.py:96-97,
stringified numeric arrays at market_discovery.py:85-95).

One superset struct per multiplexed topic (discriminator column), per
SURVEY §7 "hard parts": bronze keeps every variant's fields nullable so
a single parse covers the topic; silver fans out per type.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str) -> T.StructField:
    return T.StructField(name, T.StringType(), True)


def _d(name: str) -> T.StructField:
    return T.StructField(name, T.DoubleType(), True)


def _l(name: str) -> T.StructField:
    return T.StructField(name, T.LongType(), True)


# Topic: asset-prices (producers/coinbase_producer.py:36-41)
ASSET_PRICE = T.StructType([_s("symbol"), _d("price"), _s("timestamp"), _d("volume")])

# Topic: market-updates (producers/market_discovery.py:97-112)
MARKET_UPDATE = T.StructType(
    [
        _s("market_id"),
        _s("condition_id"),
        _s("question"),
        _d("yes_price"),
        _d("no_price"),
        T.StructField("token_ids", T.ArrayType(T.StringType()), True),
        _s("start_time"),
        _s("end_time"),
        T.StructField("active", T.BooleanType(), True),
        _d("best_bid"),
        _d("best_ask"),
        _s("liquidity"),  # API passthrough string (market_discovery.py:107-110)
        _s("volume"),
        _s("slug"),
    ]
)

# Topic: polymarket-prices — superset of orderbook_summary | price_change |
# trade | unknown, discriminated by `type`
# (producers/polymarket_ws_manager.py:90-160)
POLYMARKET_PRICE = T.StructType(
    [
        _s("type"),
        _s("market_id"),
        _s("asset_id"),
        _s("condition_id"),
        _s("outcome"),
        _s("side"),
        _s("timestamp"),
        _d("price"),
        _d("size"),
        _d("best_bid_price"),
        _d("best_bid_size"),
        _d("best_ask_price"),
        _d("best_ask_size"),
        _d("total_bid_volume"),
        _d("total_ask_volume"),
        _d("largest_bid_size"),
        _d("largest_bid_price"),
        _d("largest_ask_size"),
        _d("largest_ask_price"),
        _d("book_imbalance"),
        _s("original_event_type"),
        _s("raw_data"),  # retained raw JSON blob for the unknown variant
    ]
)

# RAW upstream CLOB WS frames — engine-side reprocessing input
# (producers/polymarket_ws_manager.py:48-162; level prices/sizes are strings)
BOOK_LEVEL = T.StructType([_s("price"), _s("size")])
RAW_WS_EVENT = T.StructType(
    [
        T.StructField("event_type", T.StringType(), True),
        _s("asset_id"),
        _s("market"),
        T.StructField("bids", T.ArrayType(BOOK_LEVEL), True),
        T.StructField("asks", T.ArrayType(BOOK_LEVEL), True),
        T.StructField(
            "price_changes",
            T.ArrayType(
                T.StructType([_s("asset_id"), _s("price"), _s("size"), _s("side")])
            ),
            True,
        ),
        _s("price"),
        _s("size"),
        _s("side"),
    ]
)

# Topic: market-resolutions (producers/market_resolution.py:92-101)
# final prices are strings on the wire — the reference quirk at :96-97
MARKET_RESOLUTION = T.StructType(
    [
        _s("market_id"),
        _s("market_slug"),
        _s("winner"),
        _s("final_yes_price"),
        _s("final_no_price"),
        _s("volume"),
        _s("resolution_status"),
        _s("resolved_at"),
    ]
)

# Topic: market-resolution-failures (producers/market_resolution.py:53-58)
RESOLUTION_FAILURE = T.StructType(
    [_s("slug"), _s("reason"), _s("failed_at"), _s("last_known_status")]
)

# Topic: user-positions — position | position_snapshot_empty
# (producers/user_positions_tracker.py:67-100)
USER_POSITION = T.StructType(
    [
        _s("type"),
        _s("market_id"),
        _s("condition_id"),
        _s("snapshot_time"),
        _s("user"),
        _s("asset_id"),
        _s("outcome"),
        _l("outcome_index"),
        _l("balance"),
        _l("position_count"),  # only on the empty marker
    ]
)

# Topic: service-errors — heterogeneous, discriminator `error_type`
# (producers/coinbase_producer.py:64-70; user_positions_tracker.py:140-149,201-211)
SERVICE_ERROR = T.StructType(
    [
        _s("service_name"),
        _s("error_type"),
        _l("retry_attempts"),
        _l("downtime"),
        _l("error_threshold"),
        _l("consecutive_errors"),
        _s("market_id"),
        _s("condition_id"),
        _s("error_message"),
        _s("market_start"),
        _s("market_end"),
        _s("restart_time"),
        _l("estimated_missed_snapshots"),
        _s("timestamp"),
    ]
)

# Bronze envelope (init.sql:8-76): id / ingested_at / payload — plus Kafka
# lineage columns the Spark bronze keeps for exactly-once dedup (SURVEY T6).
BRONZE = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("kafka_timestamp", T.TimestampType(), True),
        T.StructField("ingested_at", T.TimestampType(), False),
        T.StructField("payload", T.StringType(), False),
    ]
)

TOPIC_SCHEMAS: dict[str, T.StructType] = {
    "asset-prices": ASSET_PRICE,
    "market-updates": MARKET_UPDATE,
    "polymarket-prices": POLYMARKET_PRICE,
    "market-resolutions": MARKET_RESOLUTION,
    "market-resolution-failures": RESOLUTION_FAILURE,
    "user-positions": USER_POSITION,
    "service-errors": SERVICE_ERROR,
}
