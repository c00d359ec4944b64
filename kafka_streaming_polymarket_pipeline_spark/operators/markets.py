"""Market-lifecycle operators: discovery filtering, 15-minute window math,
resolution winner decode.

Maps producers/market_discovery.py and producers/market_resolution.py —
the parts that are *data* semantics (filters, projections, window
alignment, winner logic). The REST/WS transport lives in sources/.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MARKET_WINDOW_MINUTES = 15


def btc_market_filter(markets: DataFrame, question_col: str = "question") -> DataFrame:
    """P1: keep markets whose lowercased question mentions bitcoin/btc
    (market_discovery.py:35-48)."""
    q = F.lower(F.col(question_col))
    return markets.filter(q.contains("bitcoin") | q.contains("btc"))


def current_market(markets: DataFrame, at: Column) -> DataFrame:
    """P2: the market whose [start_time, start_time+15min) window contains
    `at` (market_discovery.py:50-73; end = start + 15 min at :66)."""
    end = F.col("start_time") + F.expr(f"INTERVAL {MARKET_WINDOW_MINUTES} MINUTES")
    return markets.filter((F.col("start_time") <= at) & (at < end))


def align_15m(ts: Column) -> Column:
    """F10: floor to the 15-minute grid (:00/:15/:30/:45) — the discovery
    loop's alignment (market_discovery.py:114-137), as window math instead
    of sleep scheduling."""
    return F.window(ts, f"{MARKET_WINDOW_MINUTES} minutes").start


def decode_winner(yes_price: Column, no_price: Column) -> Column:
    """F11: winner decode (market_resolution.py:84-90): NO==1 -> Down,
    YES==1 -> Up, else Unknown."""
    return (
        F.when(no_price == 1.0, "Down")
        .when(yes_price == 1.0, "Up")
        .otherwise("Unknown")
    )


def is_resolved(closed: Column, status: Column) -> Column:
    """P9 (market_resolution.py:41): closed AND status == 'resolved'."""
    return closed & (status == "resolved")


def label_markets(features: DataFrame, resolutions: DataFrame) -> DataFrame:
    """J3: left-join resolution labels onto per-market features
    (README.md:225-229); unresolved markets keep null winner."""
    labels = resolutions.select("market_id", "winner", "resolved_at")
    return features.join(labels, "market_id", "left")
