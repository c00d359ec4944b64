"""Silver layer: bronze JSON envelopes -> typed tables.

Re-expresses the reference's dbt models (data/polymarket_analytics/models/
silver/*.sql) plus the typed tables dbt never built but whose shapes the
producers define (SURVEY §7 step 3). Every function takes a bronze
DataFrame (schemas.BRONZE shape: raw JSON string in `payload`) and returns
the typed silver DataFrame. Works identically on batch and streaming
inputs — these are pure column transformations.

Engine fixes over the reference (SURVEY §7 "reference bugs not to
replicate"): all timestamps parsed to UTC TimestampType (vs naive-local
ISO strings), final resolution prices cast to double (vs strings,
market_resolution.py:96-97), stringified arrays double-parsed once here
(market_discovery.py:85-95).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark import schemas


def parse_payload(bronze: DataFrame, topic: str) -> DataFrame:
    """PERMISSIVE parse of the raw JSON payload against the topic schema;
    corrupt payloads yield null structs (quarantined by corrupt_records)."""
    schema = schemas.TOPIC_SCHEMAS[topic]
    return bronze.withColumn("j", F.from_json("payload", schema))


def corrupt_records(bronze: DataFrame, topic: str) -> DataFrame:
    """T9 quarantine stream: rows whose payload failed the topic schema.

    PERMISSIVE from_json surfaces malformed input in the designated
    corrupt-record column (an all-null struct otherwise looks like data).
    """
    from pyspark.sql import types as T

    base = schemas.TOPIC_SCHEMAS[topic]
    # copy — StructType.add mutates in place and the registry is shared
    schema = T.StructType(list(base.fields) + [T.StructField("_corrupt_record", T.StringType())])
    parsed = bronze.withColumn(
        "j",
        F.from_json("payload", schema, {"columnNameOfCorruptRecord": "_corrupt_record"}),
    )
    return parsed.filter(
        F.col("j").isNull() | F.col("j._corrupt_record").isNotNull()
    ).select("topic", "ingested_at", "payload")


def _ts(col: str | Column) -> Column:
    """ISO-8601 string -> UTC timestamp (F7; Z or offset handled natively)."""
    return F.to_timestamp(col if isinstance(col, Column) else F.col(col))


def btc_prices(bronze: DataFrame) -> DataFrame:
    """Silver btc_prices (models/silver/btc_prices.sql:8-15): ticker symbol,
    decimal-cast price/volume, parsed event timestamp."""
    j = parse_payload(bronze, "asset-prices").select("ingested_at", "j.*")
    return j.select(
        F.col("symbol").alias("ticker"),
        F.col("price").cast("decimal(18,8)").alias("price"),
        F.col("volume").cast("decimal(24,8)").alias("volume_24h"),
        _ts("timestamp").alias("price_timestamp"),
        F.col("ingested_at"),
    )


def markets(bronze: DataFrame) -> DataFrame:
    """Silver markets (models/silver/markets.sql:7-20): typed market dim
    with parsed window bounds and decimal liquidity/volume."""
    j = parse_payload(bronze, "market-updates").select("ingested_at", "j.*")
    return j.select(
        "market_id",
        "condition_id",
        "question",
        "slug",
        F.col("yes_price").cast("decimal(10,6)").alias("yes_price"),
        F.col("no_price").cast("decimal(10,6)").alias("no_price"),
        "token_ids",
        _ts("start_time").alias("start_time"),
        _ts("end_time").alias("end_time"),
        "active",
        F.col("best_bid").cast("decimal(10,6)").alias("best_bid"),
        F.col("best_ask").cast("decimal(10,6)").alias("best_ask"),
        F.col("liquidity").cast("decimal(24,8)").alias("liquidity"),
        F.col("volume").cast("decimal(24,8)").alias("volume"),
        "ingested_at",
    )


def _polymarket(bronze: DataFrame) -> DataFrame:
    return parse_payload(bronze, "polymarket-prices").select("ingested_at", "j.*")


def orderbook_summaries(bronze: DataFrame) -> DataFrame:
    """Typed orderbook_summary rows (polymarket_ws_manager.py:90-108)."""
    j = _polymarket(bronze).filter(F.col("type") == "orderbook_summary")
    return j.select(
        "market_id", "asset_id", "condition_id", "outcome",
        _ts("timestamp").alias("event_ts"),
        "best_bid_price", "best_bid_size", "best_ask_price", "best_ask_size",
        "total_bid_volume", "total_ask_volume",
        "largest_bid_size", "largest_bid_price",
        "largest_ask_size", "largest_ask_price",
        "book_imbalance", "ingested_at",
    )


def price_changes(bronze: DataFrame) -> DataFrame:
    """Typed price_change rows (polymarket_ws_manager.py:121-130)."""
    j = _polymarket(bronze).filter(F.col("type") == "price_change")
    return j.select(
        "market_id", "asset_id", "outcome", "side",
        _ts("timestamp").alias("event_ts"), "price", "size", "ingested_at",
    )


def trades(bronze: DataFrame) -> DataFrame:
    """Typed trade rows (polymarket_ws_manager.py:139-148)."""
    j = _polymarket(bronze).filter(F.col("type") == "trade")
    return j.select(
        "market_id", "asset_id", "outcome", "side",
        _ts("timestamp").alias("event_ts"), "price", "size", "ingested_at",
    )


def unknown_events(bronze: DataFrame) -> DataFrame:
    """The unknown-variant passthrough (polymarket_ws_manager.py:154-160)."""
    j = _polymarket(bronze).filter(F.col("type") == "unknown")
    return j.select(
        "market_id", "original_event_type",
        _ts("timestamp").alias("event_ts"), "raw_data", "ingested_at",
    )


def resolutions(bronze: DataFrame) -> DataFrame:
    """Typed resolutions — fixes the string-price quirk
    (market_resolution.py:96-97) with explicit double casts."""
    j = parse_payload(bronze, "market-resolutions").select("ingested_at", "j.*")
    return j.select(
        "market_id",
        F.col("market_slug").alias("slug"),
        "winner",
        F.col("final_yes_price").cast("double").alias("final_yes_price"),
        F.col("final_no_price").cast("double").alias("final_no_price"),
        F.col("volume").cast("decimal(24,8)").alias("volume"),
        "resolution_status",
        _ts("resolved_at").alias("resolved_at"),
        "ingested_at",
    )


def resolution_failures(bronze: DataFrame) -> DataFrame:
    j = parse_payload(bronze, "market-resolution-failures").select("ingested_at", "j.*")
    return j.select(
        "slug", "reason", _ts("failed_at").alias("failed_at"),
        "last_known_status", "ingested_at",
    )


def positions(bronze: DataFrame) -> DataFrame:
    """Typed position rows; the empty-snapshot markers are position_counts()."""
    j = parse_payload(bronze, "user-positions").select("ingested_at", "j.*")
    return j.filter(F.col("type") == "position").select(
        "market_id", "condition_id",
        _ts("snapshot_time").alias("snapshot_time"),
        "user", "asset_id", "outcome", "outcome_index", "balance", "ingested_at",
    )


def empty_snapshots(bronze: DataFrame) -> DataFrame:
    j = parse_payload(bronze, "user-positions").select("ingested_at", "j.*")
    return j.filter(F.col("type") == "position_snapshot_empty").select(
        "market_id", "condition_id",
        _ts("snapshot_time").alias("snapshot_time"),
        "position_count", "ingested_at",
    )


def service_errors(bronze: DataFrame) -> DataFrame:
    j = parse_payload(bronze, "service-errors").select("ingested_at", "j.*")
    return j.select(
        "service_name", "error_type", "retry_attempts", "downtime",
        "error_threshold", "consecutive_errors", "market_id", "condition_id",
        "error_message", _ts("timestamp").alias("event_ts"), "ingested_at",
    )
