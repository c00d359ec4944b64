"""Positions + market-lifecycle operator tests against fixture snapshots."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark import silver
from kafka_streaming_polymarket_pipeline_spark.operators import markets as M
from kafka_streaming_polymarket_pipeline_spark.operators import positions as P
from tests import fixtures as FX


@pytest.fixture(scope="module")
def pos(spark):
    bronze = FX.bronze_rows(spark, FX.positions(3, 5), "user-positions")
    return silver.positions(bronze)


def test_top_holders_rank(pos):
    top2 = P.top_holders(pos, k=2)
    per_snap = top2.groupBy("snapshot_time").count().collect()
    assert all(r["count"] == 2 for r in per_snap)
    first = top2.filter(F.col("holder_rank") == 1).select("user").distinct().collect()
    assert [r["user"] for r in first] == ["0xWallet004"]  # largest balance


def test_whale_deltas_lag(pos):
    deltas = P.whale_deltas(pos).filter(F.col("balance_delta").isNotNull())
    rows = deltas.filter(F.col("user") == "0xWallet004").orderBy("snapshot_time").collect()
    # wallet4 balance: 5000 -> 10000 -> 15000
    assert [r["balance_delta"] for r in rows] == [5000, 5000]


def test_concentration_share(pos):
    c = P.concentration(pos, top_n=2).collect()[0]
    # balances 1k..5k per snapshot: top2 share = (5+4)/15
    assert c["n_wallets"] == 5
    assert abs(c["top2_share"] - 9.0 / 15.0) < 1e-12


def test_snapshot_counts_with_empty_marker(spark, pos):
    bronze = FX.bronze_rows(spark, FX.positions(3, 5), "user-positions")
    empty = silver.empty_snapshots(bronze).select("market_id", "snapshot_time")
    domain = pos.select("market_id", "snapshot_time").distinct().union(empty)
    dense = P.snapshot_counts(pos, snapshots=domain).collect()
    counts = {r["snapshot_time"].isoformat(): r["position_count"] for r in dense}
    assert len(counts) == 4 and min(counts.values()) == 0


def test_market_filter_and_window(spark):
    bronze = FX.bronze_rows(spark, [FX.MARKET], "market-updates")
    m = silver.markets(bronze)
    assert M.btc_market_filter(m).count() == 1
    inside = F.lit("2026-01-25 19:50:00").cast("timestamp")
    outside = F.lit("2026-01-25 20:10:00").cast("timestamp")
    assert M.current_market(m, inside).count() == 1
    assert M.current_market(m, outside).count() == 0


def test_decode_winner(spark):
    df = spark.createDataFrame(
        [(1.0, 0.0), (0.0, 1.0), (0.6, 0.4)], "yes double, no double"
    )
    got = [r[0] for r in df.select(M.decode_winner(F.col("yes"), F.col("no"))).collect()]
    assert got == ["Up", "Down", "Unknown"]


def test_label_join_left_semantics(spark):
    feats = spark.createDataFrame([("543210",), ("999",)], "market_id string")
    bronze = FX.bronze_rows(spark, [FX.resolution()], "market-resolutions")
    labeled = M.label_markets(feats, silver.resolutions(bronze))
    rows = {r["market_id"]: r["winner"] for r in labeled.collect()}
    assert rows == {"543210": "Up", "999": None}
