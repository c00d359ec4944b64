"""Similarity-search queries over the embeddings table.

s1 is the exact brute-force baseline with a full SQL oracle. s2 is the
LSH-bucketed approximate path — genuinely non-SQL-expressible (the fixed
random hyperplanes live in the operator), so it has no oracle entry; its
recall against s1 is asserted in tests/test_similarity.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import similarity as S
from kafka_streaming_polymarket_pipeline_spark.plans.registry import register
from kafka_streaming_polymarket_pipeline_spark.tables import load

# 100 queries: enough to amortize the IVF corpus-assignment pass, which is
# the regime the operator exists for (a handful of queries should just brute).
N_QUERIES = 100
TOP_K = 10


@register(
    "s1_ann_bruteforce_topk",
    oracle=f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id, e FROM v WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.e, c.e)
           / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS c
  FROM q JOIN v c ON q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, round(c, 6) AS cosine, CAST(rn AS INT) AS rank FROM (
  SELECT query_id, neighbor_id, c,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
  FROM scored
) WHERE rn <= {TOP_K}
""",
)
def s1_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors: broadcast queries x corpus,
    JVM-side fold dot products, window top-k."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.brute_force_topk(emb, queries, k=TOP_K)


@register("s2_ann_ivf_topk", oracle=None)
def s2_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via IVF (16 sampled centroids, nprobe=4) + exact
    rerank — scans ~1/4 of the corpus per query. No SQL oracle (approximate
    by design); recall vs s1 is asserted in tests/test_similarity.py."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.ivf_ann_topk(emb, queries, k=TOP_K)


@register("s3_ann_lsh_topk", oracle=None)
def s3_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via 12-hyperplane sign-LSH with 1-bit multiprobe +
    exact rerank. Right tool for the near-dup regime (cosine >= ~0.9);
    included for coverage — tests document its low recall on this
    moderate-similarity corpus vs IVF."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.lsh_ann_topk(emb, queries, k=TOP_K)
