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


_KBUCKET = "__kbucket"


def upsert_parquet_bucketed(
    spark, batch: DataFrame, path: str, keys: list[str], n_buckets: int = 64
) -> None:
    """Partition-pruned MERGE emulation: the table lives hash-bucketed on
    its keys (``__kbucket=<n>/`` directory partitions), and an upsert
    rewrites ONLY the buckets its batch touches — the Delta/Iceberg
    ``MERGE INTO`` cost shape (O(touched partitions), not O(table)) that
    plain ``upsert_parquet`` cannot give. For the reference's workload —
    ~87-min-late resolution trickle (market_resolution.py:25-38) into a
    large label table — a batch touches a handful of markets, so the
    rewrite is ~|batch|/|table| of the full-table cost.

    Crash-safety is per-bucket staged-write + rename, same protocol as
    ``upsert_parquet``: merged buckets land in ``__staged`` first, then
    each touched bucket swaps live -> ``__prev`` -> new. A crash mid-swap
    leaves every bucket either old or new (never truncated);
    ``_recover_bucketed_target`` restores any bucket caught between its
    two renames, and the replayed batch (foreachBatch checkpoint) re-merges
    idempotently. Unlike Delta, cross-bucket atomicity is NOT provided —
    a crash can briefly expose a mix of old and new buckets until replay
    converges; that is the honest gap a transaction log closes.

    ``n_buckets`` is fixed at table creation (it is the directory
    layout); size it so one bucket is one executor's comfortable rewrite
    unit (e.g. 4096 buckets for a 10 TB label table -> ~2.5 GB/bucket).

    Single-writer only (the foreachBatch serialization a streaming sink
    already provides): concurrent MERGEs into the same table race on the
    staging/prev directories. Multi-writer coordination is exactly what
    a transaction log (Delta/Iceberg) adds; do not emulate it with locks
    here.
    """
    import shutil

    from pyspark.errors import AnalysisException

    bucket_expr = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int")
    keyed = batch.withColumn(_KBUCKET, bucket_expr)
    staged, prev = path + "__staged", path + "__prev"
    _recover_bucketed_target(path)
    try:
        existing = spark.read.parquet(path)
    except AnalysisException:
        keyed.write.mode("overwrite").partitionBy(_KBUCKET).parquet(path)
        return
    # Bounded driver-side list: at most n_buckets ints, never data-scale.
    touched = sorted(
        r[_KBUCKET] for r in keyed.select(_KBUCKET).distinct().collect()
    )
    if not touched:
        return
    # Partition pruning: only the touched buckets' files are read.
    merged = (
        existing.filter(F.col(_KBUCKET).isin(touched))
        .join(batch.select(*keys).distinct(), keys, "left_anti")
        .unionByName(keyed)
    )
    merged.write.mode("overwrite").partitionBy(_KBUCKET).parquet(staged)
    os.makedirs(prev, exist_ok=True)
    for b in touched:
        part = f"{_KBUCKET}={b}"
        live_part, staged_part, prev_part = (
            os.path.join(path, part),
            os.path.join(staged, part),
            os.path.join(prev, part),
        )
        if not os.path.exists(staged_part):
            # defensive only: merged always contains the batch's own rows
            # for every touched bucket, so the staged dir should exist; a
            # partial staged write from a crash is handled by recovery,
            # not here
            continue
        if os.path.exists(live_part):
            os.rename(live_part, prev_part)
        os.rename(staged_part, live_part)
    shutil.rmtree(prev, ignore_errors=True)
    shutil.rmtree(staged, ignore_errors=True)


def _recover_bucketed_target(path: str) -> None:
    """Repair an interrupted bucketed upsert. Per touched bucket the swap
    is (live -> prev, staged -> live), so a crash leaves each bucket in
    exactly one of: untouched / fully swapped / moved-to-prev-only. The
    last state is the only broken one — restore prev -> live. Then drop
    the staging/prev dirs; the uncommitted batch replays and re-merges."""
    import shutil

    staged, prev = path + "__staged", path + "__prev"
    if os.path.isdir(prev):
        for part in os.listdir(prev):
            live_part = os.path.join(path, part)
            if part.startswith(_KBUCKET + "=") and not os.path.exists(live_part):
                os.rename(os.path.join(prev, part), live_part)
    for leftover in (staged, prev):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)


def read_upserted(spark, path: str) -> DataFrame:
    """Read an upsert target, hiding the internal bucket column if the
    table uses the bucketed layout."""
    df = spark.read.parquet(path)
    return df.drop(_KBUCKET) if _KBUCKET in df.columns else df


def upsert_sink(
    df: DataFrame,
    path: str,
    keys: list[str],
    checkpoint: str | None = None,
    n_buckets: int | None = None,
):
    """Streaming upsert: each micro-batch MERGEs into the parquet target.
    ``n_buckets`` selects the partition-pruned bucketed layout (rewrite
    cost O(touched buckets)); ``None`` keeps the flat full-rewrite form."""

    def write_batch(batch: DataFrame, _batch_id: int) -> None:
        if n_buckets:
            upsert_parquet_bucketed(batch.sparkSession, batch, path, keys, n_buckets)
        else:
            upsert_parquet(batch.sparkSession, batch, path, keys)

    return foreach_batch_sink(df, write_batch, checkpoint)
