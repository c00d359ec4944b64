"""Silver-layer tests: bronze JSON envelope -> typed tables, including the
reference quirks the engine fixes (string prices, ISO-Z timestamps) and
the T9 corrupt-record quarantine."""

from __future__ import annotations

import json
from decimal import Decimal

from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark import silver
from tests import fixtures as FX


def test_btc_prices_typed(spark):
    bronze = FX.bronze_rows(spark, FX.asset_prices(5), "asset-prices")
    rows = silver.btc_prices(bronze).orderBy("price_timestamp").collect()
    assert len(rows) == 5
    assert rows[0]["ticker"] == "BTC"
    assert rows[0]["price"] == Decimal("97000.00000000")
    assert rows[0]["price_timestamp"].isoformat().startswith("2026-01-25T19:45:00")


def test_markets_typed_and_arrays(spark):
    bronze = FX.bronze_rows(spark, [FX.MARKET], "market-updates")
    row = silver.markets(bronze).collect()[0]
    assert row["token_ids"] == ["7131001", "2549002"]
    assert row["liquidity"] == Decimal("18000.50000000")  # string -> decimal
    assert (row["end_time"] - row["start_time"]).total_seconds() == 15 * 60


def test_resolution_string_prices_fixed(spark):
    bronze = FX.bronze_rows(spark, [FX.resolution()], "market-resolutions")
    row = silver.resolutions(bronze).collect()[0]
    assert row["final_yes_price"] == 1.0 and isinstance(row["final_yes_price"], float)
    assert row["winner"] == "Up"


def test_positions_and_empty_markers_split(spark):
    bronze = FX.bronze_rows(spark, FX.positions(2, 3), "user-positions")
    pos = silver.positions(bronze)
    empty = silver.empty_snapshots(bronze)
    assert pos.count() == 6
    assert empty.count() == 1 and empty.collect()[0]["position_count"] == 0
    assert pos.filter(F.col("balance") <= 0).count() == 0


def test_corrupt_record_quarantine(spark):
    msgs = FX.asset_prices(3)
    rows = [json.dumps(m) for m in msgs] + ["{not json at all", '"scalar"']
    bronze = FX.bronze_rows(spark, msgs, "asset-prices")
    import datetime

    extra = spark.createDataFrame(
        [("asset-prices", 0, 99, FX.T0, FX.T0, "{not json at all")],
        bronze.schema,
    )
    all_bronze = bronze.union(extra)
    bad = silver.corrupt_records(all_bronze, "asset-prices").collect()
    assert len(bad) == 1 and bad[0]["payload"].startswith("{not json")
    # good rows still parse
    assert silver.btc_prices(all_bronze).filter(F.col("price").isNotNull()).count() == 3
