"""Sequence packing and shard writing for training-data pipelines.

Two operators a pretraining data pipeline runs after dedup/filtering:

- **Sequence packing** (concat-and-chunk): documents are laid out in a
  deterministic order as one virtual token stream; fixed ``budget``-token
  training sequences are the chunks of that stream. Each doc's placement
  is pure integer math over a prefix sum of token counts — the dominant
  packing scheme for LLM pretraining (docs may span sequence boundaries;
  attention masking handles the seams downstream).
- **Shard assignment / writer**: a deterministic pseudo-random total order
  (md5 of the id) ranked and floor-divided into strictly size-bounded
  shards, then written as one parquet partition per shard. "Shuffled" and
  "size-bounded" are both exact, not approximate, and re-runs reproduce
  the same assignment bit-for-bit.

Scale note — the prefix sum: a naive ``sum() OVER (ORDER BY id)`` is a
single-partition global sort. Both operators instead use the two-phase
form: rows are statically bucketed (fixed-width id ranges / first hex
digit of the hash — deterministic, no sampled boundaries), each bucket
computes its local prefix sum in a partitioned window, and the tiny
per-bucket totals (one row per bucket) roll up into bucket offsets that
broadcast back. Result is identical to the global window; the plan has
one narrow shuffle on the bucket key and nothing single-partition. The
DuckDB oracles use the naive global form, proving the equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators.text import token_count

PACK_BUDGET = 512
PACK_BUCKET_WIDTH = 64  # docs per prefix-sum bucket (static id ranges)


def _bucket_offsets(per_bucket: DataFrame, bucket_col: str, total_col: str) -> DataFrame:
    """(bucket, offset): exclusive prefix sum over per-bucket totals. The
    input is one row per bucket — tiny — so the unpartitioned window is a
    driver-scale sort, not a data-scale one."""
    w = Window.orderBy(bucket_col).rowsBetween(Window.unboundedPreceding, -1)
    return per_bucket.select(
        bucket_col,
        F.coalesce(F.sum(total_col).over(w), F.lit(0)).alias("_offset"),
    )


def packed_sequences(
    df: DataFrame,
    budget: int = PACK_BUDGET,
    bucket_width: int = PACK_BUCKET_WIDTH,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc packing assignment: (doc_id, n_tokens, tok_start, seq_first,
    seq_last) where tok_start is the doc's offset in the virtual token
    stream (docs ordered by id) and seq_first..seq_last are the
    ``budget``-token sequences the doc lands in (a doc longer than the
    remaining room spans consecutive sequences).

    Requires a numeric id (static range bucketing); ids need not be dense.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).alias("n_tokens"),
        F.floor(F.col(id_col) / bucket_width).alias("_b"),
    )
    wlocal = Window.partitionBy("_b").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = toks.withColumn("_cum", F.sum("n_tokens").over(wlocal))
    totals = toks.groupBy("_b").agg(F.sum("n_tokens").alias("_tot"))
    offsets = _bucket_offsets(totals, "_b", "_tot")
    placed = local.join(F.broadcast(offsets), "_b").select(
        "doc_id",
        "n_tokens",
        (F.col("_offset") + F.col("_cum") - F.col("n_tokens")).alias("tok_start"),
    )
    seq_first = F.floor(F.col("tok_start") / budget)
    seq_last = F.when(
        F.col("n_tokens") > 0,
        F.floor((F.col("tok_start") + F.col("n_tokens") - 1) / budget),
    ).otherwise(seq_first)
    return placed.select(
        "doc_id", "n_tokens", "tok_start",
        seq_first.alias("seq_first"), seq_last.alias("seq_last"),
    )


def sequence_fill(
    df: DataFrame,
    budget: int = PACK_BUDGET,
    bucket_width: int = PACK_BUCKET_WIDTH,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-sequence view of the packing: (seq_id, n_docs, n_tokens). Every
    sequence except the last holds exactly ``budget`` tokens — the packing
    invariant tests assert. Empty docs carry no tokens and are excluded."""
    placed = packed_sequences(df, budget, bucket_width, id_col, text_col).filter(
        F.col("n_tokens") > 0
    )
    spans = placed.select(
        "doc_id", "n_tokens", "tok_start",
        F.explode(F.sequence("seq_first", "seq_last")).alias("seq_id"),
    )
    in_seq = F.least(
        F.col("tok_start") + F.col("n_tokens"), (F.col("seq_id") + 1) * budget
    ) - F.greatest(F.col("tok_start"), F.col("seq_id") * budget)
    return (
        spans.withColumn("_t", in_seq)
        .groupBy("seq_id")
        .agg(F.count("*").alias("n_docs"), F.sum("_t").alias("n_tokens"))
    )


def shard_assignments(
    df: DataFrame, rows_per_shard: int = 100, id_col: str = "doc_id"
) -> DataFrame:
    """All input columns plus (shard_rank, shard): rank = position in the
    md5(id) pseudo-random total order, shard = rank // rows_per_shard.
    Every shard holds exactly ``rows_per_shard`` rows except the last —
    a strict bound, unlike hash-bucket sharding whose sizes are binomial.
    Deterministic across runs and engines (md5 keying, like x1/x2)."""
    keyed = df.withColumn(
        "_k", F.md5(F.col(id_col).cast("string"))
    ).withColumn("_b", F.substring("_k", 1, 1))
    wlocal = Window.partitionBy("_b").orderBy("_k").rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = keyed.withColumn("_cum", F.count("*").over(wlocal))
    totals = keyed.groupBy("_b").agg(F.count("*").alias("_tot"))
    offsets = _bucket_offsets(totals, "_b", "_tot")
    return (
        local.join(F.broadcast(offsets), "_b")
        .withColumn("shard_rank", F.col("_offset") + F.col("_cum") - 1)
        .withColumn("shard", F.floor(F.col("shard_rank") / rows_per_shard))
        .drop("_k", "_b", "_cum", "_offset")
    )


def write_shards(
    df: DataFrame, path: str, rows_per_shard: int = 100, id_col: str = "doc_id"
) -> int:
    """Write size-bounded shuffled shards: one parquet partition directory
    per shard (shard=<n>/). Returns the shard count. Repartitioning by the
    shard column co-locates each shard into one task, so each directory
    holds one file of exactly rows_per_shard rows (last shard excepted)."""
    assigned = shard_assignments(df, rows_per_shard, id_col)
    assigned.repartition(F.col("shard")).write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(path)
    import os

    return sum(1 for d in os.listdir(path) if d.startswith("shard="))
