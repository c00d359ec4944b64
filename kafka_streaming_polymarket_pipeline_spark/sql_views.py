"""Pure-SQL surface: every engine capability reachable via ``spark.sql``.

SURVEY §7 design stance: beside the DataFrame API, expose the domain as
views so an analyst can work entirely in SQL — the role dbt + Postgres
played in the reference (data/polymarket_analytics/models/silver/*.sql),
but over Spark's catalog.

Layers:
- base: the testdata tables (tables.register_views);
- silver: one view per typed topic table, registered from the silver.py
  transforms applied to bronze frames;
- gold: Spark-SQL view text over silver views (candles, book imbalance,
  whale deltas, concentration, labels) — declarative all the way down, so
  Catalyst sees through every view into one optimized plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streaming_polymarket_pipeline_spark import silver

SILVER_BUILDERS = {
    "silver_btc_prices": ("asset-prices", silver.btc_prices),
    "silver_markets": ("market-updates", silver.markets),
    "silver_orderbook_summaries": ("polymarket-prices", silver.orderbook_summaries),
    "silver_price_changes": ("polymarket-prices", silver.price_changes),
    "silver_trades": ("polymarket-prices", silver.trades),
    "silver_resolutions": ("market-resolutions", silver.resolutions),
    "silver_resolution_failures": ("market-resolution-failures", silver.resolution_failures),
    "silver_positions": ("user-positions", silver.positions),
    "silver_empty_snapshots": ("user-positions", silver.empty_snapshots),
    "silver_service_errors": ("service-errors", silver.service_errors),
}

# Gold views in Spark SQL over the silver views — the layer the reference
# declared but never built (dbt_project.yml:44-47 "Coming soon";
# README.md:225-229 lists the intended features).
GOLD_VIEW_SQL = {
    # 15-minute BTC candles on the market cadence (T1/F10).
    "gold_btc_candles_15m": """
        SELECT window(price_timestamp, '15 minutes').start AS window_start,
               ticker,
               min_by(price, price_timestamp) AS open,
               max(price)  AS high,
               min(price)  AS low,
               max_by(price, price_timestamp) AS close,
               count(*)    AS n_ticks
        FROM silver_btc_prices
        GROUP BY 1, 2
    """,
    # Momentum & volatility features (README.md:225-229).
    "gold_price_features": """
        SELECT ticker, price_timestamp, price,
               price - lag(price) OVER (
                   PARTITION BY ticker ORDER BY price_timestamp) AS tick_change,
               avg(price) OVER (
                   PARTITION BY ticker ORDER BY price_timestamp
                   ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)    AS ma_60,
               stddev_samp(price) OVER (
                   PARTITION BY ticker ORDER BY price_timestamp
                   ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)    AS vol_60
        FROM silver_btc_prices
    """,
    # Whale position deltas (J4): successive-snapshot balance changes.
    "gold_whale_deltas": """
        SELECT market_id, user, outcome, snapshot_time, balance,
               balance - lag(balance) OVER (
                   PARTITION BY market_id, user, outcome ORDER BY snapshot_time
               ) AS balance_delta
        FROM silver_positions
    """,
    # Participant concentration: top-10 share of total balance per snapshot.
    "gold_concentration": """
        SELECT market_id, snapshot_time,
               count(DISTINCT user) AS n_wallets,
               sum(balance) AS total_balance,
               sum(CASE WHEN rank <= 10 THEN balance ELSE 0 END) / sum(balance)
                   AS top10_share
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY market_id, snapshot_time ORDER BY balance DESC, user
            ) AS rank
            FROM silver_positions
        )
        GROUP BY market_id, snapshot_time
    """,
    # Winner-labeled markets (J3 + F11 decode).
    "gold_labeled_markets": """
        SELECT m.*, r.winner, r.final_yes_price, r.final_no_price, r.resolved_at
        FROM silver_markets m
        LEFT JOIN silver_resolutions r USING (market_id)
    """,
    # Orderbook imbalance signal stream (A4 over the summaries).
    "gold_book_signals": """
        SELECT market_id, asset_id, outcome, event_ts,
               book_imbalance,
               best_ask_price - best_bid_price AS spread,
               total_bid_volume + total_ask_volume AS depth
        FROM silver_orderbook_summaries
    """,
}


def register_silver_views(spark: SparkSession, bronze_by_topic: dict[str, DataFrame]) -> None:
    """Apply each silver transform to its topic's bronze frame and register
    the result as a temp view. Topics absent from the dict are skipped."""
    for view, (topic, fn) in SILVER_BUILDERS.items():
        if topic in bronze_by_topic:
            fn(bronze_by_topic[topic]).createOrReplaceTempView(view)


def register_gold_views(spark: SparkSession) -> list[str]:
    """Register the gold SQL views; a view whose silver dependencies are not
    registered is skipped. Returns the views registered."""
    from pyspark.errors import AnalysisException

    done = []
    for view, sql in GOLD_VIEW_SQL.items():
        try:
            spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {view} AS {sql}")
            done.append(view)
        except AnalysisException:
            continue
    return done
