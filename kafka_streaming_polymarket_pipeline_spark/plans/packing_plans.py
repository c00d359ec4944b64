"""Sequence-packing and sharding queries over the documents table.

The Spark side computes prefix sums in the scalable two-phase bucketed
form (operators/packing.py); the oracles use the naive single global
window — hash equality proves the two forms identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streaming_polymarket_pipeline_spark.operators import packing as P
from kafka_streaming_polymarket_pipeline_spark.plans.registry import register
from kafka_streaming_polymarket_pipeline_spark.tables import load

_TOK = "CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)"

_PLACED = f"""
tk AS (SELECT doc_id, {_TOK} AS n_tokens FROM documents),
placed AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
              AS BIGINT) AS tok_start
  FROM tk
)"""


@register(
    "pk1_pack_assignments",
    oracle=f"""
WITH {_PLACED}
SELECT doc_id, n_tokens, tok_start,
       tok_start // {P.PACK_BUDGET} AS seq_first,
       CASE WHEN n_tokens > 0 THEN (tok_start + n_tokens - 1) // {P.PACK_BUDGET}
            ELSE tok_start // {P.PACK_BUDGET} END AS seq_last
FROM placed
""",
)
def pk1_pack_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing assignment at a {budget}-token budget:
    where each document lands in the virtual token stream and which
    training sequences it spans. Two-phase prefix sum (no global sort);
    oracle is the naive global window.""".format(budget=P.PACK_BUDGET)
    return P.packed_sequences(load(spark, sf_dir, "documents"))


@register(
    "pk2_sequence_fill",
    oracle=f"""
WITH {_PLACED},
spans AS (
  SELECT doc_id, n_tokens, tok_start,
         unnest(range(tok_start // {P.PACK_BUDGET},
                      (tok_start + n_tokens - 1) // {P.PACK_BUDGET} + 1)) AS seq_id
  FROM placed WHERE n_tokens > 0
)
SELECT seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(least(tok_start + n_tokens, (seq_id + 1) * {P.PACK_BUDGET})
              - greatest(tok_start, seq_id * {P.PACK_BUDGET})) AS BIGINT) AS n_tokens
FROM spans GROUP BY seq_id
""",
)
def pk2_sequence_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence packing view: doc count and token fill per sequence
    (every non-final sequence is exactly full — the packing invariant)."""
    return P.sequence_fill(load(spark, sf_dir, "documents"))


@register(
    "sh1_shard_assignment",
    oracle="""
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1 AS BIGINT)
         AS shard_rank,
       (row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1) // 100 AS shard
FROM documents
""",
)
def sh1_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly size-bounded shuffled shard assignment (100 rows/shard):
    md5 pseudo-random total order, two-phase rank, floor-divide. The
    writer (operators/packing.write_shards) lands these as one parquet
    partition per shard; determinism is asserted in tests/test_packing.py."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    return P.shard_assignments(docs, rows_per_shard=100).select(
        "doc_id", F.col("shard_rank").cast("long"), "shard"
    )


@register(
    "sh2_epoch_shuffle",
    oracle="""
SELECT doc_id, CAST(k AS INTEGER) AS epoch,
       CAST(row_number() OVER (
              PARTITION BY k
              ORDER BY md5(CAST(k AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))
            ) - 1 AS BIGINT) AS epoch_pos
FROM documents, LATERAL (SELECT unnest(range(0, 3)) AS k)
""",
)
def sh2_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch deterministic global shuffle order (3 epochs): epoch k
    ranks the corpus by md5("k:doc_id") via the two-phase bucketed rank —
    the reshuffle-each-epoch contract of a pretraining loader,
    reproducible on any engine. The oracle is the naive global
    per-epoch window, proving the bucketed form's equivalence."""
    docs = load(spark, sf_dir, "documents")
    return P.epoch_shuffle(docs, n_epochs=3)


@register(
    "z1_zorder_layout",
    oracle=f"""
WITH e AS (
  SELECT event_id, user_id % 65536 AS za,
         (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 65536 AS zb
  FROM events
),
m AS (
  SELECT event_id, za, zb,
         list_sum(list_transform(range(0, 16),
           i -> (((za >> i) & 1)::BIGINT << (2 * i))
              + (((zb >> i) & 1)::BIGINT << (2 * i + 1)))) AS zm
  FROM e
),
r AS (SELECT *, row_number() OVER (ORDER BY zm, event_id) AS rn FROM m)
SELECT (rn - 1) // {P.Z_ROWS_PER_FILE} AS file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(za) AS a_min, max(za) AS a_max,
       min(zb) AS b_min, max(zb) AS b_max
FROM r GROUP BY 1
""",
)
def z1_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (morton) file layout over events by (user_id, hour):
    Delta OPTIMIZE ZORDER / Iceberg sort-order rewrite as a first-class
    query — per-file min/max stats (the data-skipping contract) are the
    output, hash-gated. The oracle ranks with one naive global window;
    the Spark side uses the two-phase Z-prefix-block rank (1024-way
    parallel, no data-scale unpartitioned window) — hash equality proves
    the two orderings identical."""
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events")
    return P.zorder_layout(
        ev,
        F.col("user_id"),
        F.floor(F.unix_timestamp("ts") / 3600),
        order_col="event_id",
    )
