"""Position-analytics operators (the user_positions_tracker's semantics,
declarative).

The reference polls GraphQL per market in a thread and fans out one Kafka
message per position (producers/user_positions_tracker.py:27-105). The
engine-side analytics over those rows:

- A5 top-K holders per market by balance
- A6 snapshot counts with explicit empty markers
- J4 whale deltas: balance change across consecutive snapshots (lag)
- concentration metrics (planned gold, README.md:229)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_holders(positions: DataFrame, k: int = 1000) -> DataFrame:
    """A5/O1: top-k positions per (market, snapshot) by balance desc —
    the `first:1000 orderBy: balance desc` the reference pushes into
    GraphQL (user_positions_tracker.py:30-47), as a window rank."""
    w = Window.partitionBy("market_id", "snapshot_time").orderBy(
        F.desc("balance"), F.asc("user"), F.asc("outcome_index")
    )
    return positions.withColumn("holder_rank", F.row_number().over(w)).filter(
        F.col("holder_rank") <= k
    )


def snapshot_counts(positions: DataFrame, snapshots: DataFrame | None = None) -> DataFrame:
    """A6: positions per (market, snapshot); when a snapshot-domain table is
    given (all polled snapshot times), zero-position snapshots appear with
    n=0 — the position_snapshot_empty marker (user_positions_tracker.py:
    65-76) as a left join instead of an imperative branch."""
    counts = positions.groupBy("market_id", "snapshot_time").agg(
        F.count("*").alias("position_count"),
        F.countDistinct("user").alias("n_wallets"),
    )
    if snapshots is None:
        return counts
    dense = snapshots.join(counts, ["market_id", "snapshot_time"], "left")
    return dense.select(
        "market_id",
        "snapshot_time",
        F.coalesce("position_count", F.lit(0).cast("long")).alias("position_count"),
        F.coalesce("n_wallets", F.lit(0).cast("long")).alias("n_wallets"),
    )


def whale_deltas(positions: DataFrame, min_abs_delta: int = 0) -> DataFrame:
    """J4: per-holder balance change between consecutive snapshots —
    the planned "whale position changes" gold feature (README.md:228) as a
    lag window over (market, user, outcome)."""
    key = ["market_id", "user", "outcome"]
    w = Window.partitionBy(*key).orderBy("snapshot_time")
    out = positions.select(
        *key,
        "snapshot_time",
        "balance",
        (F.col("balance") - F.lag("balance").over(w)).alias("balance_delta"),
    )
    if min_abs_delta > 0:
        out = out.filter(F.abs("balance_delta") >= min_abs_delta)
    return out


def concentration(positions: DataFrame, top_n: int = 10) -> DataFrame:
    """Participant concentration per (market, snapshot): wallet count and
    the top-N wallets' share of total balance (README.md:229). At scale the
    per-wallet pre-aggregation bounds the window input to |wallets|."""
    per_wallet = positions.groupBy("market_id", "snapshot_time", "user").agg(
        F.sum("balance").alias("wallet_balance")
    )
    w_rank = Window.partitionBy("market_id", "snapshot_time").orderBy(
        F.desc("wallet_balance"), F.asc("user")
    )
    w_all = Window.partitionBy("market_id", "snapshot_time")
    ranked = per_wallet.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "total_balance", F.sum("wallet_balance").over(w_all)
    )
    return ranked.groupBy("market_id", "snapshot_time").agg(
        F.count("*").alias("n_wallets"),
        (
            F.sum(F.when(F.col("rn") <= top_n, F.col("wallet_balance")).otherwise(0))
            / F.first("total_balance")
        ).alias(f"top{top_n}_share"),
    )


def missed_snapshots(latest_market_end, restart_time, interval_s: int = 10):
    """F13: estimated_missed_snapshots = elapsed/interval (the startup-gap
    check, user_positions_tracker.py:196-209) as a column expression."""
    elapsed = F.unix_timestamp(restart_time) - F.unix_timestamp(latest_market_end)
    return F.floor(elapsed / interval_s).cast("long")
