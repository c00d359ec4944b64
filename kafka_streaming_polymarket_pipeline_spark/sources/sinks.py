"""Sink builders (S5/S7/S9 in SURVEY §2.1).

The reference lands every topic row-at-a-time into Postgres JSONB with
hand-rolled retry (consumers/db_writer.py:75-109) and tails topics to the
console (consumers/simple_consumer.py:18-20). Here:

- bronze parquet/Delta-style append is the primary sink (columnar, partition
  by ingest date — the scan-pruning the reference faked with expression
  indexes, init.sql:15-76);
- JDBC lands typed silver frames per micro-batch via foreachBatch (Spark
  task retry replaces the hand-rolled backoff);
- console sink is a one-liner passthrough.

foreachBatch receives a *batch* DataFrame, so any batch writer (jdbc,
parquet, custom) applies; exactly-once comes from checkpointed batch ids
against an idempotent/transactional target (SURVEY T6).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bronze_parquet_sink(df: DataFrame, path: str, checkpoint: str):
    """Bronze append sink partitioned by ingest date: replayable source of
    truth (medallion bronze, README.md:309-313) with partition pruning."""
    out = df.withColumn("ingest_date", F.to_date("ingested_at"))
    return (
        out.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("ingest_date")
        .start()
    )


def jdbc_sink(
    df: DataFrame,
    url: str,
    table: str,
    checkpoint: str,
    mode: str = "append",
    properties: dict | None = None,
):
    """S7: per-micro-batch JDBC append (db_writer.py:75-109, minus the
    hand-rolled retry — Spark retries failed batches from the checkpoint)."""

    def write_batch(batch: DataFrame, _batch_id: int) -> None:
        batch.write.mode(mode).jdbc(url, table, properties=properties or {})

    return foreach_batch_sink(df, write_batch, checkpoint)


def foreach_batch_sink(df: DataFrame, fn: Callable[[DataFrame, int], None], checkpoint: str | None = None):
    """Generic foreachBatch sink; `fn(batch_df, batch_id)` runs per trigger."""
    w = df.writeStream.foreachBatch(fn)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def console_sink(df: DataFrame, rows: int = 20):
    """S9: topic tail (simple_consumer.py:18-20)."""
    return df.writeStream.format("console").option("numRows", rows).start()


def upsert_parquet(spark, batch: DataFrame, path: str, keys: list[str]) -> None:
    """MERGE-style upsert into a parquet table: batch rows replace existing
    rows with the same key (latest wins), everything else is kept.

    This is the dbt incremental ``unique_key`` semantic
    (models/silver/btc_prices.sql:3-6) and the landing strategy for very
    late resolutions (SURVEY T5: up to ~87 min after market end,
    market_resolution.py:25-38 — too late for any stream-stream watermark,
    so they upsert into the label table instead).

    On a real deployment this is Delta/Iceberg ``MERGE INTO`` (transactional,
    partition-pruned rewrite; delta-spark is not in this environment).
    The parquet emulation here is CRASH-SAFE by staged write + rename swap:
    the merged result lands in a staging directory first, then two renames
    swap it in. The live path is never overwritten in place, so a crash at
    any point leaves either the old table or the new table intact on disk
    (never a truncated mix); ``_recover_upsert_target`` repairs the one
    mid-swap window by restoring the previous version, and foreachBatch's
    checkpoint then replays the uncommitted batch — upsert is idempotent on
    its keys, so replay converges. Local-filesystem rename semantics; on an
    object store use Delta/Iceberg, not this.
    """
    import shutil

    from pyspark.errors import AnalysisException

    staged, prev = path + "__staged", path + "__prev"
    _recover_upsert_target(path)
    try:
        existing = spark.read.parquet(path)
    except AnalysisException:
        batch.write.mode("overwrite").parquet(staged)
        os.rename(staged, path)
        return
    merged = existing.join(
        batch.select(*keys).distinct(), keys, "left_anti"
    ).unionByName(batch)
    merged.write.mode("overwrite").parquet(staged)
    os.rename(path, prev)
    os.rename(staged, path)
    shutil.rmtree(prev)


def _recover_upsert_target(path: str) -> None:
    """Repair interrupted upsert swaps. States (staged=S, prev=P, live=L):
    - L only / nothing: clean.
    - L + S (crash before first rename, or stale staging): drop S.
    - P + S, no L (crash between the two renames): restore P -> L, drop S —
      conservative: the in-flight batch was not committed to the streaming
      checkpoint, so it replays.
    - L + P (crash after swap, before cleanup): drop P (new version won).
    """
    import shutil

    staged, prev = path + "__staged", path + "__prev"
    if not os.path.exists(path) and os.path.exists(prev):
        os.rename(prev, path)
    for leftover in (staged, prev):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)


def upsert_sink(df: DataFrame, path: str, keys: list[str], checkpoint: str | None = None):
    """Streaming upsert: each micro-batch MERGEs into the parquet target."""

    def write_batch(batch: DataFrame, _batch_id: int) -> None:
        upsert_parquet(batch.sparkSession, batch, path, keys)

    return foreach_batch_sink(df, write_batch, checkpoint)
