"""Book-summary operator tests: the reference's hand-computed expected
values (producers/polymarket_ws_manager.py:48-108 semantics) recomputed
declaratively from raw frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark import schemas, silver
from kafka_streaming_polymarket_pipeline_spark.operators import book as B
from tests import fixtures as FX


@pytest.fixture(scope="module")
def raw(spark):
    import json

    payloads = [json.dumps(e) for e in FX.raw_ws_events()]
    df = spark.createDataFrame([(p,) for p in payloads], "payload string")
    return df.select(F.from_json("payload", schemas.RAW_WS_EVENT).alias("j")).select("j.*")


@pytest.fixture(scope="module")
def token_dim(spark):
    bronze = FX.bronze_rows(spark, [FX.MARKET], "market-updates")
    return B.token_dimension(silver.markets(bronze))


def test_summarize_book_metrics(raw):
    rows = {r["asset_id"]: r for r in B.summarize_book(raw).collect()}
    # Empty-bids frame dropped (P8 guard): 7131001 appears once.
    assert len(rows) == 3
    r = rows["7131001"]
    assert r["best_bid_price"] == 0.51 and r["best_bid_size"] == 1200.0  # A3
    assert r["best_ask_price"] == 0.53 and r["best_ask_size"] == 800.0
    assert r["total_bid_volume"] == 6200.0 and r["total_ask_volume"] == 4800.0  # A1
    assert r["largest_bid_size"] == 5000.0 and r["largest_bid_price"] == 0.45  # A2
    assert r["largest_ask_size"] == 4000.0 and r["largest_ask_price"] == 0.60
    expected_imb = (6200.0 - 4800.0) / (6200.0 + 4800.0)  # A4
    assert abs(r["book_imbalance"] - expected_imb) < 1e-12
    # balanced book -> imbalance 0
    assert rows["2549002"]["book_imbalance"] == 0.0


def test_token_dimension_positional_outcomes(token_dim):
    rows = {r["asset_id"]: r["outcome"] for r in token_dim.collect()}
    assert rows == {"7131001": "YES", "2549002": "NO"}  # F12 positional decode


def test_enrichment_drops_unmapped(raw, token_dim):
    summaries = B.summarize_book(raw)
    enriched = B.enrich_with_market(summaries, token_dim)
    rows = enriched.collect()
    # 3 book summaries, but asset 9999999 is unmapped -> inner join drops it
    assert {r["asset_id"] for r in rows} == {"7131001", "2549002"}
    assert all(r["market_id"] == "543210" for r in rows)
    plan = enriched._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan  # J1 must be a broadcast join


def test_price_change_explode_buy_filter(raw):
    rows = B.explode_price_changes(raw).collect()
    assert len(rows) == 1  # SELL leg filtered (P6)
    assert rows[0]["asset_id"] == "7131001" and rows[0]["size"] == 250.0


def test_trades_and_unknown_route(raw):
    trades = B.extract_trades(raw).collect()
    assert len(trades) == 1 and trades[0]["price"] == 0.52
    unknown = B.route_unknown(raw).collect()
    assert len(unknown) == 1
    assert unknown[0]["original_event_type"] == "tick_size_change"
    assert "tick_size_change" in unknown[0]["raw_data"]
