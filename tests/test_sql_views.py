"""Pure-SQL surface: silver + gold views reachable via spark.sql, and the
A11 observe() counters."""

from __future__ import annotations

from datetime import timedelta

from kafka_streaming_polymarket_pipeline_spark import sql_views
from kafka_streaming_polymarket_pipeline_spark.streaming import jobs
from tests import fixtures as fx


def _register_all(spark):
    bronze = {
        "asset-prices": fx.bronze_rows(spark, fx.asset_prices(30), "asset-prices"),
        "market-updates": fx.bronze_rows(spark, [fx.MARKET], "market-updates"),
        "market-resolutions": fx.bronze_rows(spark, [fx.resolution()], "market-resolutions"),
        "user-positions": fx.bronze_rows(spark, fx.positions(3, 5), "user-positions"),
    }
    sql_views.register_silver_views(spark, bronze)
    sql_views.register_gold_views(spark)


def test_silver_views_queryable(spark):
    _register_all(spark)
    assert spark.sql("SELECT count(*) c FROM silver_btc_prices").collect()[0].c == 30
    m = spark.sql("SELECT market_id, slug FROM silver_markets").collect()[0]
    assert m.market_id == "543210" and m.slug == "bitcoin-up-or-down-jan-25"


def test_gold_candles_via_sql(spark):
    _register_all(spark)
    r = spark.sql("SELECT * FROM gold_btc_candles_15m").collect()
    assert len(r) == 1
    assert float(r[0].open) == 97000.0
    assert float(r[0].close) == 97000.0 + 29 * 3.5
    assert r[0].n_ticks == 30


def test_gold_labeled_markets_and_concentration(spark):
    _register_all(spark)
    lab = spark.sql(
        "SELECT market_id, winner, final_yes_price FROM gold_labeled_markets"
    ).collect()[0]
    assert lab.winner == "Up" and lab.final_yes_price == 1.0  # double, not string
    conc = spark.sql(
        "SELECT * FROM gold_concentration ORDER BY snapshot_time"
    ).collect()
    assert len(conc) == 3  # one row per snapshot
    assert all(c.n_wallets == 5 for c in conc)
    assert all(abs(c.top10_share - 1.0) < 1e-12 for c in conc)  # only 5 wallets


def test_gold_whale_deltas_lag(spark):
    _register_all(spark)
    rows = spark.sql(
        """SELECT balance_delta FROM gold_whale_deltas
           WHERE user = '0xWallet000' AND outcome = 'YES'
           ORDER BY snapshot_time"""
    ).collect()
    # balances 1000, 2000, 3000 -> deltas null, 1000, 1000
    assert [r.balance_delta for r in rows] == [None, 1000, 1000]


def test_observe_counters_streaming(spark, tmp_path):
    from tests.test_streaming import _write_bronze_jsonl

    d = tmp_path / "in"
    _write_bronze_jsonl(d / "a.jsonl", fx.asset_prices(7), "asset-prices")
    stream = jobs.with_counters(jobs.file_bronze_stream(spark, str(d)))
    captured: list[dict] = []
    q = (
        stream.writeStream.format("memory").queryName("t_obs")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    for p in q.recentProgress:
        om = p["observedMetrics"].get("counters") if p["observedMetrics"] else None
        if om:
            captured.append(om)
    assert sum(m["n_messages"] for m in captured) == 7
