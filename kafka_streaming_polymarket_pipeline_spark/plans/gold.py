"""Gold-layer feature queries — the reference's *planned* gold layer,
which it never built (declared empty at data/polymarket_analytics/
dbt_project.yml:44-47; feature list at README.md:225-229: "price momentum &
volatility, orderbook imbalance signals, whale position changes,
participant concentration metrics").

Re-expressed over the events table: momentum/volatility as sliding
event-time windows, whale deltas as lag windows, concentration as
share-of-total window ratios, and the winner-label join (J3) as the
candle-direction label for the *next* window (an ML training target).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.plans.registry import register
from kafka_streaming_polymarket_pipeline_spark.tables import load


@register(
    "g1_momentum_volatility",
    oracle="""
WITH w AS (
  SELECT event_type,
         make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
         value
  FROM events
), agg AS (
  SELECT event_type, window_start,
         avg(value) AS mean_v, stddev_samp(value) AS sd_v, count(*) AS n
  FROM w GROUP BY event_type, window_start
)
SELECT event_type, window_start,
       round(mean_v, 4) AS avg_value,
       round(coalesce(sd_v, 0.0), 4) AS volatility,
       round(mean_v - lag(mean_v) OVER (PARTITION BY event_type ORDER BY window_start), 4)
         AS momentum,
       n
FROM agg
""",
)
def g1_momentum_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold feature: per (event_type, 1h window) mean/volatility plus
    window-over-window momentum (README.md:225-229 "price momentum &
    volatility"). One shuffle for the window agg, one tiny window pass for
    the lag — at 100 TB the agg output is ~|keys|×|windows|, trivially small."""
    events = load(spark, sf_dir, "events")
    agg = events.groupBy(
        "event_type", F.window("ts", "1 hour").start.alias("window_start")
    ).agg(
        F.avg("value").alias("_mean"),
        F.stddev_samp("value").alias("_sd"),
        F.count("*").alias("n"),
    )
    w = Window.partitionBy("event_type").orderBy("window_start")
    return agg.select(
        "event_type",
        "window_start",
        F.round("_mean", 4).alias("avg_value"),
        F.round(F.coalesce(F.col("_sd"), F.lit(0.0)), 4).alias("volatility"),
        F.round(F.col("_mean") - F.lag("_mean").over(w), 4).alias("momentum"),
        "n",
    )


@register(
    "g2_whale_deltas",
    oracle="""
WITH d AS (
  SELECT user_id, event_id, ts, value,
         value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, event_id, value, round(delta, 2) AS delta
FROM d
WHERE abs(delta) > 100.0
""",
)
def g2_whale_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold feature: whale position changes — large snapshot-over-snapshot
    deltas per holder (README.md:228; snapshots keyed at
    producers/user_positions_tracker.py:94)."""
    events = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = events.withColumn("_delta", F.col("value") - F.lag("value").over(w))
    return d.filter(F.abs("_delta") > 100.0).select(
        "user_id", "event_id", "value", F.round("_delta", 2).alias("delta")
    )


@register(
    "g3_concentration",
    oracle="""
WITH per_user AS (
  SELECT event_type, user_id, sum(value) AS user_value
  FROM events GROUP BY event_type, user_id
), ranked AS (
  SELECT event_type, user_value,
         row_number() OVER (PARTITION BY event_type ORDER BY user_value DESC, user_id) AS rn,
         sum(user_value) OVER (PARTITION BY event_type) AS total_value
  FROM per_user
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_holders,
       round(sum(CASE WHEN rn <= 10 THEN user_value ELSE 0 END) / any_value(total_value), 6)
         AS top10_share
FROM ranked GROUP BY event_type
""",
)
def g3_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold feature: participant concentration — top-10 holders' share of
    total (README.md:229). Share-of-total via window sums over the
    pre-aggregated per-holder table, so the big fact table is touched once."""
    events = load(spark, sf_dir, "events")
    per_user = events.groupBy("event_type", "user_id").agg(F.sum("value").alias("user_value"))
    w_rank = Window.partitionBy("event_type").orderBy(F.desc("user_value"), F.asc("user_id"))
    w_total = Window.partitionBy("event_type")
    ranked = per_user.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "total_value", F.sum("user_value").over(w_total)
    )
    return ranked.groupBy("event_type").agg(
        F.count("*").alias("n_holders"),
        F.round(
            F.sum(F.when(F.col("rn") <= 10, F.col("user_value")).otherwise(0.0))
            / F.first("total_value"),
            6,
        ).alias("top10_share"),
    )


@register(
    "g4_winner_label",
    oracle="""
WITH b AS (
  SELECT event_type,
         make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS window_start,
         ts, event_id, value
  FROM events
), w AS (
  SELECT event_type, window_start,
         first_value(value) OVER (
           PARTITION BY event_type, window_start ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS open_w,
         last_value(value) OVER (
           PARTITION BY event_type, window_start ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close_w
  FROM b
), candles AS (
  SELECT event_type, window_start,
         any_value(open_w) AS open, any_value(close_w) AS close
  FROM w GROUP BY event_type, window_start
)
SELECT event_type, window_start, open, close,
       lead(CASE WHEN close > open THEN 'Up'
                 WHEN close < open THEN 'Down'
                 ELSE 'Unknown' END)
         OVER (PARTITION BY event_type ORDER BY window_start) AS next_winner
FROM candles
""",
)
def g4_winner_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold label join: attach the NEXT window's Up/Down resolution to each
    candle — the training label the reference's gold layer planned (J3,
    README.md:225-229) with the winner decode of
    producers/market_resolution.py:84-90. A lead window replaces the
    physical features-x-resolutions join since both sides share keys."""
    events = load(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    candles = events.groupBy(
        "event_type", F.window("ts", "15 minutes").start.alias("window_start")
    ).agg(
        F.min_by("value", order_key).alias("open"),
        F.max_by("value", order_key).alias("close"),
    )
    winner = (
        F.when(F.col("close") > F.col("open"), "Up")
        .when(F.col("close") < F.col("open"), "Down")
        .otherwise("Unknown")
    )
    w = Window.partitionBy("event_type").orderBy("window_start")
    return candles.select(
        "event_type",
        "window_start",
        "open",
        "close",
        F.lead(winner).over(w).alias("next_winner"),
    )
