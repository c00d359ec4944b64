"""Orderbook operators: recompute derived book metrics from RAW WS frames.

The reference computes orderbook_summary row-at-a-time in a WebSocket
callback (producers/polymarket_ws_manager.py:48-162) and cannot replay it —
the derived metrics exist only because the callback ran. Here the same
metrics are column expressions over the raw frames (schemas.RAW_WS_EVENT),
so the engine can recompute/backfill them from bronze at any time, batch or
streaming, at any scale:

- A1 array sums (total bid/ask volume)      — higher-order ``aggregate``
- A2 argmax over levels (largest order)     — ``array_sort`` + element 1
- A3 positional best (bids[0]/asks[0])      — documented sorted-best-first
  assumption, polymarket_ws_manager.py:67-70
- A4 book_imbalance with 0-guard            — polymarket_ws_manager.py:87-88
- J1 token->outcome dimension + broadcast enrichment join
- P5/P6 routing: price_change explode + BUY filter, trade passthrough

Everything is JVM-side expression work over arrays already colocated in
the row: zero shuffles for the summaries themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _level_sum(levels: Column) -> Column:
    """A1: sum of level sizes (string-typed on the wire -> double)."""
    return F.aggregate(
        levels, F.lit(0.0), lambda acc, lvl: acc + lvl.getField("size").cast("double")
    )


def _largest(levels: Column) -> Column:
    """A2: the level with the largest size; returns struct(size, price).

    One-pass fold keeping the running max — equivalent to the reference's
    max(levels, key=size) at polymarket_ws_manager.py:77-84.
    """
    return F.aggregate(
        levels,
        F.struct(F.lit(-1.0).alias("size"), F.lit(0.0).alias("price")),
        lambda acc, lvl: F.when(
            lvl.getField("size").cast("double") > acc.getField("size"),
            F.struct(
                lvl.getField("size").cast("double").alias("size"),
                lvl.getField("price").cast("double").alias("price"),
            ),
        ).otherwise(acc),
    )


def summarize_book(raw: DataFrame) -> DataFrame:
    """Raw `book` frames -> orderbook_summary metric columns.

    Input: schemas.RAW_WS_EVENT rows (may be pre-exploded from list frames).
    Output matches the wire shape of polymarket_ws_manager.py:90-108 minus
    the enrichment columns (market_id/outcome — join via token_dimension).
    Empty-book guard (P8, :55-60): rows with empty bids or asks dropped.
    """
    books = raw.filter(
        (F.col("event_type") == "book")
        & (F.size("bids") > 0)
        & (F.size("asks") > 0)
    )
    best_bid = F.element_at("bids", 1)  # A3: arrays arrive best-first
    best_ask = F.element_at("asks", 1)
    bid_vol = _level_sum(F.col("bids"))
    ask_vol = _level_sum(F.col("asks"))
    largest_bid = _largest(F.col("bids"))
    largest_ask = _largest(F.col("asks"))
    denom = bid_vol + ask_vol
    imbalance = F.when(denom > 0, (bid_vol - ask_vol) / denom).otherwise(0.0)  # A4
    return books.select(
        "asset_id",
        F.col("market").alias("condition_id"),
        best_bid.getField("price").cast("double").alias("best_bid_price"),
        best_bid.getField("size").cast("double").alias("best_bid_size"),
        best_ask.getField("price").cast("double").alias("best_ask_price"),
        best_ask.getField("size").cast("double").alias("best_ask_size"),
        bid_vol.alias("total_bid_volume"),
        ask_vol.alias("total_ask_volume"),
        largest_bid.getField("size").alias("largest_bid_size"),
        largest_bid.getField("price").alias("largest_bid_price"),
        largest_ask.getField("size").alias("largest_ask_size"),
        largest_ask.getField("price").alias("largest_ask_price"),
        imbalance.alias("book_imbalance"),
    )


def token_dimension(markets: DataFrame) -> DataFrame:
    """J1 dimension: one row per outcome token of each market.

    token_ids[0] = YES, token_ids[1] = NO (positional invariant,
    polymarket_ws_manager.py:279-282). Built from the silver markets table;
    two rows per market, so always broadcast-joinable.
    """
    exploded = markets.select(
        "market_id",
        "condition_id",
        "start_time",
        "end_time",
        F.posexplode("token_ids").alias("pos", "asset_id"),
    )
    return exploded.select(
        "asset_id",
        "market_id",
        "condition_id",
        "start_time",
        "end_time",
        F.when(F.col("pos") == 0, "YES").otherwise("NO").alias("outcome"),
    )


def enrich_with_market(events: DataFrame, token_dim: DataFrame, how: str = "inner") -> DataFrame:
    """J1 probe: stamp events with market_id/outcome via broadcast join on
    asset_id. Inner join drops unmapped assets — exactly the reference's
    silent-skip behavior (polymarket_ws_manager.py:61-64,117-120,135-138).
    The dimension also carries the market window, giving J2's
    current-market correlation for free when events fall in [start, end).
    """
    dim = token_dim.select("asset_id", "market_id", "outcome")
    return events.join(F.broadcast(dim), "asset_id", how)


def explode_price_changes(raw: DataFrame, buy_only: bool = True) -> DataFrame:
    """P6: unbatch the price_changes array; keep BUY side like the
    reference (polymarket_ws_manager.py:114-117)."""
    pc = raw.filter(F.col("event_type") == "price_change").select(
        F.explode("price_changes").alias("c")
    )
    out = pc.select(
        F.col("c.asset_id").alias("asset_id"),
        F.col("c.price").cast("double").alias("price"),
        F.col("c.size").cast("double").alias("size"),
        F.col("c.side").alias("side"),
    )
    return out.filter(F.col("side") == "BUY") if buy_only else out


def extract_trades(raw: DataFrame) -> DataFrame:
    """Trade passthrough (last_trade_price frames,
    polymarket_ws_manager.py:139-148)."""
    return raw.filter(F.col("event_type") == "last_trade_price").select(
        "asset_id",
        F.col("price").cast("double").alias("price"),
        F.col("size").cast("double").alias("size"),
        "side",
    )


def route_unknown(raw: DataFrame, known: tuple[str, ...] = ("book", "price_change", "last_trade_price")) -> DataFrame:
    """P5 otherwise-arm: wrap unrecognized frames (polymarket_ws_manager.py:
    151-162) preserving the original type and the raw frame as JSON."""
    return raw.filter(~F.col("event_type").isin(*known)).select(
        F.col("event_type").alias("original_event_type"),
        F.to_json(F.struct("*")).alias("raw_data"),
    )
