"""Streaming incremental near-dup detection — the form a 100 TB training
pipeline actually runs continuously.

The batch operator (operators/dedup.minhash_lsh_incremental) proves the
O(|new|) math; this module makes it a standing job with a PERSISTENT
index: the corpus's MinHash signatures, band buckets, and hashed shingle
arrays live as parquet tables that each micro-batch probes and then
extends. Per batch the work is:

  1. signature + band computation for the new docs only (map-side);
  2. bucket probes: new-batch bands equi-join the stored bucket table
     (plus new-new pairs) -> band-count cut -> estimate cut -> exact
     hashed-shingle verify — the same exactness-preserving funnel as d3;
  3. index extension: the new docs' rows land under
     ``batch=<epoch_id>`` partition directories written with per-batch
     overwrite, so a foreachBatch retry after a crash REWRITES the same
     directory instead of appending duplicates (idempotent — this is
     what makes the exactly-once claim hold on the index path).

At 100 TB the index tables are bucketed by band_hash / doc_id so the
probe joins co-locate; here they are plain parquet with the same logical
shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import dedup as D

SIGS, BUCKETS, HASHED = "sigs", "buckets", "hashed"


def _index_parts(docs: DataFrame, threshold: float, n: int):
    rows, _, _ = D._lsh_params(threshold)
    sigs = D.minhash_signatures(D.shingle_index(docs, "doc_id", "text", n))
    buckets = D._band_buckets(sigs, rows)
    hashed = D.doc_shingle_arrays(docs, "doc_id", "text", n).select(
        "doc_id",
        F.transform("shingles", lambda s: F.xxhash64(s)).alias("hsh"),
        "sz",
    )
    return sigs, buckets, hashed


def write_index_batch(
    docs: DataFrame, index_path: str, batch_id: int, threshold: float = 0.5,
    n: int = 5, parts: tuple | None = None
) -> None:
    """Materialize one batch's index rows under batch=<id> partition dirs
    (overwrite -> retry-idempotent). ``parts`` lets the caller pass the
    (sigs, buckets, hashed) frames it already computed for probing, so
    the signature stage — the expensive map pass — runs once per batch,
    not twice."""
    for name, part in zip(
        (SIGS, BUCKETS, HASHED), parts or _index_parts(docs, threshold, n)
    ):
        part.write.mode("overwrite").parquet(
            os.path.join(index_path, name, f"batch={batch_id}")
        )


def _read_index(spark: SparkSession, index_path: str, name: str) -> DataFrame | None:
    p = os.path.join(index_path, name)
    if not os.path.exists(p) or not any(d.startswith("batch=") for d in os.listdir(p)):
        return None
    return spark.read.option("basePath", p).parquet(os.path.join(p, "batch=*")).drop("batch")


def checkpointed_parts(new: DataFrame, threshold: float = 0.5, n: int = 5) -> tuple:
    """The batch's (sigs, buckets, hashed) frames, eagerly materialized —
    computed once, shared by the probe and the index write."""
    return tuple(
        p.localCheckpoint(eager=True) for p in _index_parts(new, threshold, n)
    )


def incremental_pairs_against_index(
    new: DataFrame, index_path: str, threshold: float = 0.5, n: int = 5,
    parts: tuple | None = None
) -> DataFrame:
    """Near-dup pairs touching ``new``, probing the persistent index —
    never re-reading corpus text. Returns (doc_id_a, doc_id_b, jaccard)
    with the same exactness contract as the batch funnel."""
    spark = new.sparkSession
    rows, min_bands, est_cutoff = D._lsh_params(threshold)
    new_sigs, new_buckets, new_hashed = parts or checkpointed_parts(new, threshold, n)

    corpus_sigs = _read_index(spark, index_path, SIGS)
    corpus_buckets = _read_index(spark, index_path, BUCKETS)
    corpus_hashed = _read_index(spark, index_path, HASHED)

    nb = new_buckets.select(F.col("doc_id").alias("nid"), "band_id", "band_hash")
    nn = (
        nb.join(
            new_buckets.select(F.col("doc_id").alias("doc_id_b"), "band_id", "band_hash"),
            ["band_id", "band_hash"],
        )
        .filter(F.col("nid") < F.col("doc_id_b"))
        .select(F.col("nid").alias("doc_id_a"), "doc_id_b")
    )
    if corpus_buckets is not None:
        cb = corpus_buckets.select(F.col("doc_id").alias("cid"), "band_id", "band_hash")
        nc = nb.join(cb, ["band_id", "band_hash"]).select(
            F.least("nid", "cid").alias("doc_id_a"),
            F.greatest("nid", "cid").alias("doc_id_b"),
        )
        cand_src = nc.union(nn)
        sigs = corpus_sigs.union(new_sigs)
        hashed = corpus_hashed.union(new_hashed)
    else:
        cand_src = nn
        sigs = new_sigs
        hashed = new_hashed

    cand = (
        cand_src.groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") >= min_bands)
        .drop("k")
    )
    return D._verify_jaccard(D._est_filter(cand, sigs, est_cutoff), hashed, threshold)


def incremental_dedup_sink(
    docs_stream: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint: str,
    threshold: float = 0.5,
    n: int = 5,
):
    """Standing job: per micro-batch, emit near-dup pairs touching the
    batch (probing the persistent index), then extend the index. Pairs
    land under batch=<id> dirs (overwrite -> idempotent on retry)."""
    from kafka_streaming_polymarket_pipeline_spark.sources.sinks import foreach_batch_sink

    def process(batch: DataFrame, batch_id: int) -> None:
        batch = batch.localCheckpoint(eager=True)
        parts = checkpointed_parts(batch, threshold, n)
        pairs = incremental_pairs_against_index(
            batch, index_path, threshold, n, parts=parts
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_path, f"batch={batch_id}")
        )
        # reuse the probed frames: the signature map pass runs once/batch
        write_index_batch(batch, index_path, batch_id, threshold, n, parts=parts)

    return foreach_batch_sink(docs_stream, process, checkpoint)
