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
form: rows are statically bucketed (fixed-width id ranges / a hash
prefix — deterministic, no sampled boundaries), each bucket computes its
local prefix sum in a partitioned window, and the per-bucket totals roll
up into bucket offsets that join back. The roll-up is itself two-level
(super-buckets of ``OFFSET_ROLLUP_WIDTH`` buckets), so the one
unpartitioned window in the whole plan sees O(n_buckets / 4096) rows —
at 1B docs with the default widths that is a few hundred rows, not
millions. Result is identical to the global window; the DuckDB oracles
use the naive global form, proving the equivalence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators.text import token_count

PACK_BUDGET = 512
# Docs per prefix-sum bucket (static id ranges). 1024 keeps the local
# window sort trivial while the offsets side stays ~n/1024 rows (a 1B-doc
# corpus -> ~1M narrow rows, join-able without a data-scale broadcast).
PACK_BUCKET_WIDTH = 1024
# Buckets per super-bucket in the offset roll-up: the only unpartitioned
# window input is O(n_buckets / OFFSET_ROLLUP_WIDTH) rows.
OFFSET_ROLLUP_WIDTH = 4096


def _bucket_offsets(per_bucket: DataFrame, bucket_col: str, total_col: str) -> DataFrame:
    """(bucket, offset): exclusive prefix sum over per-bucket totals,
    computed as a two-level roll-up. Level 1 partitions buckets into
    super-buckets (floor(bucket / OFFSET_ROLLUP_WIDTH)) and prefix-sums
    locally; level 2 prefix-sums the super-bucket totals — the only
    unpartitioned window, over O(n_buckets / 4096) rows. Requires a
    numeric bucket key (floor division defines the super-bucket).

    Equivalent to ``sum(total) OVER (ORDER BY bucket ROWS UNBOUNDED
    PRECEDING AND -1)`` for any input, proven by the packing oracles
    (naive global form in DuckDB) and the multi-super-bucket test."""
    sup_col = F.floor(F.col(bucket_col) / OFFSET_ROLLUP_WIDTH)
    wl = Window.partitionBy("_sb").orderBy(bucket_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = per_bucket.withColumn("_sb", sup_col).withColumn(
        "_lcum", F.coalesce(F.sum(total_col).over(wl), F.lit(0))
    )
    sup_totals = local.groupBy("_sb").agg(F.sum(total_col).alias("_stot"))
    ws = Window.orderBy("_sb").rowsBetween(Window.unboundedPreceding, -1)
    sup_offsets = sup_totals.select(
        "_sb", F.coalesce(F.sum("_stot").over(ws), F.lit(0)).alias("_soff")
    )
    return local.join(F.broadcast(sup_offsets), "_sb").select(
        bucket_col,
        (F.col("_soff") + F.col("_lcum")).alias("_offset"),
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
    from pyspark.storagelevel import StorageLevel

    # Persist the 3-long-column token-count frame: it feeds the local
    # prefix-sum window, the per-bucket totals, AND (through
    # _bucket_offsets) two broadcast builds — each a separate job that
    # would otherwise re-execute the ENTIRE upstream lineage. For bare
    # pk1/pk2 that is one extra documents scan; composed at the end of
    # an e2e corpus build it re-ran the scrub+dedup+entropy chain 3x on
    # broadcast-exchange threads (r11; part of the e2e_g/e2e_r sf0.1
    # tail). The cached rows are O(docs x 24 bytes) — model-state-sized
    # next to the corpus, the d12 persist discipline.
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).alias("n_tokens"),
        F.floor(F.col(id_col) / bucket_width).alias("_b"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
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
    Deterministic across runs and engines (md5 keying, like x1/x2).

    Buckets are the first 3 hex chars of the key — 4096 of them, so the
    per-bucket ranking window runs at parallelism 4096 and each task sorts
    ~n/4096 rows (a 1B-doc corpus: ~244k rows/task, not the ~62M a 16-way
    split would give). The numeric conv() keeps bucket order identical to
    the lexicographic _k order (fixed-length lowercase hex), so
    (bucket, _k) ordering == global _k ordering."""
    keyed = df.withColumn(
        "_k", F.md5(F.col(id_col).cast("string"))
    ).withColumn("_b", F.conv(F.substring("_k", 1, 3), 16, 10).cast("long"))
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


def epoch_shuffle(
    df: DataFrame, n_epochs: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """(id, epoch, epoch_pos): a deterministic, distinct global shuffle
    order per training epoch — epoch k ranks rows by md5("k:<id>"), so
    every epoch visits the corpus in a different reproducible
    pseudo-random order (the "reshuffle each epoch" contract of a
    pretraining data loader, with the order derivable by any worker
    without coordination).

    Same two-phase machinery as shard_assignments: the (epoch, id) rows
    bucket on epoch * 4096 + first-3-hex-chars(key), rank locally at
    4096-way parallelism per epoch, and the per-bucket totals roll up
    through `_bucket_offsets` — because the combined bucket number orders
    (epoch, bucket) lexicographically, the global offsets rank epochs as
    consecutive blocks and ``epoch_pos = global_rank - epoch * N``.
    N rides in via a broadcast 1-row aggregate, never a driver collect.

    The exploded all-epochs frame is for manifest generation at modest
    epoch counts; at 100 TB a loader materializes ONE epoch per call
    (n_epochs=1 with the epoch number folded into the salt) — cost is
    then identical to shard_assignments."""
    e = df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1))).alias("epoch"),
    )
    keyed = e.withColumn(
        "_k",
        F.md5(F.concat(F.col("epoch").cast("string"), F.lit(":"), F.col(id_col).cast("string"))),
    ).withColumn(
        "_eb",
        F.col("epoch").cast("long") * 4096
        + F.conv(F.substring("_k", 1, 3), 16, 10).cast("long"),
    )
    wlocal = Window.partitionBy("_eb").orderBy("_k").rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = keyed.withColumn("_cum", F.count("*").over(wlocal))
    totals = keyed.groupBy("_eb").agg(F.count("*").alias("_tot"))
    offsets = _bucket_offsets(totals, "_eb", "_tot")
    n = df.select(F.count("*").alias("_n"))
    return (
        local.join(F.broadcast(offsets), "_eb")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "epoch_pos",
            F.col("_offset") + F.col("_cum") - 1 - F.col("epoch").cast("long") * F.col("_n"),
        )
        .select(F.col(id_col), F.col("epoch").cast("int").alias("epoch"), "epoch_pos")
    )


# --- Z-order (morton) file layout: multi-dimensional data skipping ---

Z_ROWS_PER_FILE = 1000
Z_BLOCK_SHIFT = 22  # top 10 bits of the 32-bit key -> 1024 spatial blocks

_MORTON_EXPR = (
    "aggregate(sequence(0, 15), 0L, (acc, i) -> acc"
    " + shiftleft((_za >> i) & 1, 2 * i)"
    " + shiftleft((_zb >> i) & 1, 2 * i + 1))"
)


def zorder_layout(
    df: DataFrame,
    a_col: Column,
    b_col: Column,
    rows_per_file: int = Z_ROWS_PER_FILE,
    order_col: str = "event_id",
) -> DataFrame:
    """Per-file (file_id, n_rows, a_min/a_max, b_min/b_max) after laying
    the rows out in morton (Z-curve) order of two 16-bit dimensions —
    what Delta's OPTIMIZE ZORDER / Iceberg's sort-order rewrite does,
    re-expressed as a first-class query so the layout AND the file-level
    min/max stats (the data-skipping contract readers prune on) are
    oracle-checkable.

    Shuffle shape: the global morton rank is two-phase — the Z-prefix
    (top 10 bits) partitions rows into 1024 spatial blocks that are
    CONTIGUOUS in morton order, so a per-block window rank plus the
    rolled-up block offsets (``_bucket_offsets``, the sh1/pk1 machinery)
    reconstructs the exact global ordering with parallelism 1024 and no
    data-scale unpartitioned window. Both dims clamp to 16 bits; the
    interleave is a JVM-side fold (exact integer ops both engines).
    """
    keyed = (
        df.withColumn("_za", a_col.cast("long") % 65536)
        .withColumn("_zb", b_col.cast("long") % 65536)
        .withColumn("_zm", F.expr(_MORTON_EXPR))
        .withColumn("_blk", F.shiftright(F.col("_zm"), Z_BLOCK_SHIFT))
    )
    wlocal = Window.partitionBy("_blk").orderBy("_zm", order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = keyed.withColumn("_cum", F.count("*").over(wlocal))
    totals = keyed.groupBy("_blk").agg(F.count("*").alias("_tot"))
    offsets = _bucket_offsets(totals, "_blk", "_tot")
    placed = local.join(F.broadcast(offsets), "_blk").withColumn(
        "file_id", F.floor((F.col("_offset") + F.col("_cum") - 1) / rows_per_file)
    )
    return placed.groupBy("file_id").agg(
        F.count("*").alias("n_rows"),
        F.min("_za").alias("a_min"),
        F.max("_za").alias("a_max"),
        F.min("_zb").alias("b_min"),
        F.max("_zb").alias("b_max"),
    )
