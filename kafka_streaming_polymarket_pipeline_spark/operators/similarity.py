"""Similarity search over embedding columns (array<float>).

Two paths:

- **Brute-force cosine top-k** — the exact baseline: broadcast the (small)
  query set against the corpus, fold dot products JVM-side, window top-k.
  O(|queries| x |corpus|); right answer at any scale where the query set
  is small, and the rerank stage for everything else.
- **IVF (inverted file) ANN** — the scale path for top-k over moderate
  similarity: assign every vector to its nearest of C sampled centroids
  (one O(n x C) pass), probe the nprobe nearest centroids per query,
  exact-rerank within. Scans ~nprobe/C of the corpus.
- **Random-hyperplane LSH ANN** — the near-dup regime (cosine >= ~0.9):
  bucket by sign pattern of NUM_PLANES projections + 1-bit multiprobe.
  Sub-linear, but recall collapses when "neighbors" are only ~45 degrees
  apart — use IVF there (see tests/test_similarity.py for the measured
  tradeoff).

No Python UDFs: dot products are higher-order-function folds inside
whole-stage codegen.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators.dedup import cosine

NUM_PLANES = 12
_DIM = 64
_rng = random.Random(7)
# Fixed random hyperplanes (unit-free; only the sign matters).
_PLANES = [[_rng.gauss(0.0, 1.0) for _ in range(_DIM)] for _ in range(NUM_PLANES)]

NUM_CENTROIDS = 16
NPROBE = 4


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector (self excluded).
    Queries are broadcast; ties break on neighbor id for determinism."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("_vc")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("_vq")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("_vq"), F.col("_vc")).alias("_c"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_c"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_c", 6).alias("cosine"), "rank")
    )


def _centroids(corpus: DataFrame, id_col: str, vec_col: str, c: int) -> DataFrame:
    """Deterministic centroid sample: every k-th vector by id (IVF-flat with
    sampled init; swap in k-means iterations offline for tighter cells)."""
    n = corpus.count()
    step = max(n // c, 1)
    return (
        corpus.filter(F.pmod(F.col(id_col), F.lit(step)) == 0)
        .orderBy(id_col)
        .limit(c)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("_vcent"),
        )
    )


def _assign(df: DataFrame, cents: DataFrame, id_out: str, vec_out: str, nprobe: int) -> DataFrame:
    """Rank centroids per vector by cosine; keep the top nprobe assignments."""
    scored = df.crossJoin(F.broadcast(cents)).select(
        id_out,
        vec_out,
        "centroid_id",
        cosine(F.col(vec_out), F.col("_vcent")).alias("_cc"),
    )
    w = Window.partitionBy(id_out).orderBy(F.desc("_cc"), F.asc("centroid_id"))
    return (
        scored.withColumn("_cr", F.row_number().over(w))
        .filter(F.col("_cr") <= nprobe)
        .select(id_out, vec_out, "centroid_id")
    )


def ivf_ann_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    n_centroids: int = NUM_CENTROIDS, nprobe: int = NPROBE,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest-centroid
    cell; each query probes its nprobe nearest cells and exact-reranks the
    union. Work ~ (nprobe/n_centroids) of brute force; one O(n x C)
    assignment pass that at 100 TB is a narrow broadcast-join stage."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("_vc")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("_vq")
    )
    cents = _centroids(corpus, id_col, vec_col, n_centroids)
    c_cells = _assign(c, cents, "neighbor_id", "_vc", nprobe=1)
    q_cells = _assign(q, cents, "query_id", "_vq", nprobe=nprobe)
    scored = (
        c_cells.join(F.broadcast(q_cells), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("_vq"), F.col("_vc")).alias("_c"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_c"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_c", 6).alias("cosine"), "rank")
    )


def _bucket(vec: Column) -> Column:
    """LSH bucket id: integer from the sign bits of NUM_PLANES projections."""
    bucket = F.lit(0)
    for i, plane in enumerate(_PLANES):
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(p) for p in plane]), lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, multiprobe: bool = True,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket
    (plus 1-bit-flip neighbor buckets when multiprobe), exact cosine rerank
    within. The corpus-side bucket is computed once (one narrow pass) and
    the join is an equi-join on bucket — no quadratic pair blowup."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_vc"),
        _bucket(F.col(vec_col).cast("array<double>")).alias("bucket"),
    )
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_vq"),
        _bucket(F.col(vec_col).cast("array<double>")).alias("_qb"),
    )
    if multiprobe:
        probes = F.array(
            F.col("_qb"), *[F.col("_qb").bitwiseXOR(F.lit(1 << i)) for i in range(NUM_PLANES)]
        )
    else:
        probes = F.array(F.col("_qb"))
    q = q0.select("query_id", "_vq", F.explode(probes).alias("bucket"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("_vq"), F.col("_vc")).alias("_c"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_c"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_c", 6).alias("cosine"), "rank")
    )
