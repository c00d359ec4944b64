"""End-to-end lifecycle test: the reference's three data paths (SURVEY §3)
composed from raw wire fixtures through silver, enrichment, gold features,
and the winner-label join — one assertion-checked pipeline run.

Mirrors: BTC price path (§3.1), orderbook path (§3.2), positions path
(§3.3), then the planned gold label join (README.md:225-229)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark import schemas, silver
from kafka_streaming_polymarket_pipeline_spark.operators import book, markets as M, positions as P
from tests import fixtures as fx


def test_full_pipeline_lifecycle(spark):
    # --- bronze: every topic lands as raw JSON envelopes ---
    b_markets = fx.bronze_rows(spark, [fx.MARKET], "market-updates")
    b_prices = fx.bronze_rows(spark, fx.asset_prices(30), "asset-prices")
    b_positions = fx.bronze_rows(spark, fx.positions(3, 5), "user-positions")
    b_resolutions = fx.bronze_rows(spark, [fx.resolution()], "market-resolutions")

    # --- silver ---
    mkts = silver.markets(b_markets)
    prices = silver.btc_prices(b_prices)
    pos = silver.positions(b_positions)
    res = silver.resolutions(b_resolutions)

    # --- orderbook path: raw WS frames -> A1-A4 summary -> J1 enrichment ---
    raw_ws = (
        fx.bronze_rows(spark, fx.raw_ws_events(), "polymarket-prices")
        .select(F.from_json("payload", schemas.RAW_WS_EVENT).alias("j"))
        .select("j.*")
    )
    dim = book.token_dimension(mkts)
    summaries = book.enrich_with_market(book.summarize_book(raw_ws), dim)
    s = {r.outcome: r for r in summaries.collect()}
    assert set(s) == {"YES", "NO"}  # empty-book + unmapped-asset rows dropped
    assert s["YES"].market_id == "543210"
    assert abs(s["YES"].book_imbalance - (6200.0 - 4800.0) / 11000.0) < 1e-12
    assert s["YES"].largest_bid_size == 5000.0 and s["YES"].largest_bid_price == 0.45

    # --- BTC price path: 15-min candle over the market's window ---
    candle = (
        prices.groupBy(F.window("price_timestamp", "15 minutes").start.alias("ws"))
        .agg(
            F.min_by("price", "price_timestamp").alias("open"),
            F.max_by("price", "price_timestamp").alias("close"),
        )
        .collect()
    )
    assert len(candle) == 1
    went_up = float(candle[0].close) > float(candle[0].open)
    assert went_up  # fixture prices rise monotonically

    # --- positions path: top-K, deltas, concentration ---
    top = P.top_holders(pos, k=2)
    assert top.count() == 2 * 3  # top-2 wallets per (market, snapshot) x 3 snapshots
    assert {r.user for r in top.collect()} == {"0xWallet003", "0xWallet004"}
    deltas = (
        P.whale_deltas(pos)
        .filter(F.col("user") == "0xWallet004")
        .orderBy("snapshot_time")
        .collect()
    )
    # wallet004 balances 5000 -> 10000 -> 15000 across the 3 snapshots
    assert [d.balance_delta for d in deltas] == [None, 5000, 5000]
    conc = P.concentration(pos, top_n=3).orderBy("snapshot_time").collect()
    assert all(c.n_wallets == 5 for c in conc)

    # --- gold: label join (J3 + F11 decode agrees with the candle) ---
    features = mkts.select("market_id", "question", "start_time")
    labeled = M.label_markets(features, res).collect()
    assert len(labeled) == 1
    assert labeled[0].winner == "Up"
    decoded = (
        res.select(M.decode_winner(F.col("final_yes_price"), F.col("final_no_price")).alias("w"))
        .collect()[0]
        .w
    )
    assert decoded == "Up"
    assert (decoded == "Up") == went_up  # resolution agrees with price action
