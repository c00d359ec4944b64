"""BM25 full-text retrieval over the documents table.

The training-data pipeline's lexical-retrieval primitive (quality
retrieval, targeted decontamination, RAG-index scoring). The reference
pipeline has no retrieval engine; this is one of the builder-brief
training-data extensions, implemented Spark-first:

- the inverted-index build is ONE groupBy(doc_id, token) shuffle,
  linear in corpus tokens — the same shape at 100 TB;
- document frequencies are computed only for the query vocabulary
  (broadcast semi-join on ~tens of terms), never the full vocab;
- corpus scalars (N, avgdl) ride along via a broadcast 1-row aggregate;
- per-query top-k is TWO-LEVEL: a partial top-k inside hash buckets of
  doc_id, then a global top-k over the <= n_buckets * k survivors — so
  no single reducer ever sees more than max(|bucket|, n_buckets * k)
  rows even when a query term matches the whole corpus. (A plain
  Window.partitionBy(query_id) funnels every matching doc through one
  task per query — the classic top-k skew trap.)

Scoring is Robertson/Sparck-Jones BM25 (the Okapi formulation used by
Lucene): idf = ln(1 + (N - df + .5)/(df + .5)), tf saturation k1=1.2,
length normalization b=0.75. Scores are rounded to 6 dp and ranked by
the ROUNDED score on both engines (cross-engine libm/sum-order guard,
same discipline as t11/t12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75
# Partial-top-k fan-in: survivors per query <= TOPK_BUCKETS * k. 64 keeps
# the final window input trivially small at any corpus size; raise it on
# a real cluster so |bucket| ~ n_docs / TOPK_BUCKETS stays in-memory.
TOPK_BUCKETS = 64


def _tokens(col: str = "text"):
    return F.filter(F.split(F.col(col), " "), lambda t: t != "")


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k documents per query by BM25.

    ``queries`` is a small in-code list of (query_id, query_text); query
    terms are whitespace-split and deduplicated. Returns
    (query_id, doc_id, score, rank) with score rounded to 6 dp and rank
    ties broken on doc_id ascending.
    """
    spark: SparkSession = docs.sparkSession

    # (doc_id, token, tf, doclen): one explode + one shuffle. doclen is
    # carried through the explode so no second pass over the text.
    toks = docs.select(
        "doc_id", _tokens().alias("_ts")
    ).select("doc_id", F.size("_ts").alias("doclen"), F.explode("_ts").alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(
        F.count("*").alias("tf"), F.first("doclen").alias("doclen")
    )

    # Corpus scalars as a broadcast 1-row frame (plan-shape allowlisted
    # pattern: 1-row aggregate crossJoin).
    scalars = docs.select(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_tokens())).alias("_total_len"),
    ).select("n_docs", (F.col("_total_len") / F.col("n_docs")).alias("avgdl"))

    # Query-term table: tiny, broadcast. Distinct terms per query.
    q_rows = sorted(
        {(qid, t) for qid, text in queries for t in text.split(" ") if t}
    )
    qterms = spark.createDataFrame(q_rows, "query_id int, token string")

    # df only for the query vocabulary: semi-join prunes the tf frame to
    # query-term postings BEFORE the df aggregation, so the agg input is
    # O(postings of ~tens of terms), not O(corpus vocabulary).
    postings = tf.join(F.broadcast(qterms.select("token").distinct()), "token")
    dfreq = postings.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))

    contrib = (
        postings.join(F.broadcast(dfreq), "token")
        .join(F.broadcast(qterms), "token")
        .crossJoin(F.broadcast(scalars))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("doclen") / F.col("avgdl"))
                )
            ).alias("_s"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("_s"), 6).alias("score")
    )

    # Two-level top-k: partial per (query, doc-hash bucket), then global.
    # The partial keeps each bucket's own top-k, a superset of every
    # global-top-k member, so the result is exactly the single-window
    # form (the oracle's row_number) at a fraction of the fan-in.
    order = [F.desc("score"), F.asc("doc_id")]
    part = Window.partitionBy(
        "query_id", F.pmod(F.xxhash64("doc_id"), F.lit(TOPK_BUCKETS))
    ).orderBy(*order)
    survivors = (
        scored.withColumn("_pr", F.row_number().over(part))
        .filter(F.col("_pr") <= k)
        .drop("_pr")
    )
    final = Window.partitionBy("query_id").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
