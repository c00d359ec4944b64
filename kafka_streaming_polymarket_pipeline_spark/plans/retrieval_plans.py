"""Lexical retrieval queries (BM25) over the documents table.

Builder-brief training-data extension (the reference pipeline,
/root/reference, has no text-retrieval engine — its queries are
market-data SQL). The oracle re-derives the full BM25 pipeline —
inverted index, query-vocabulary document frequencies, Okapi scoring,
top-k — in ANSI SQL, term-by-term against the Spark formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streaming_polymarket_pipeline_spark.operators import retrieval as R
from kafka_streaming_polymarket_pipeline_spark.plans.registry import register
from kafka_streaming_polymarket_pipeline_spark.tables import load

# Fixed query set over the synthetic corpus vocabulary. In-code (not a
# table) because real retrieval queries arrive from the application, not
# the warehouse; the operator broadcasts them either way.
BM25_QUERIES: list[tuple[int, str]] = [
    (0, "spark window agg"),
    (1, "customer order join"),
    (2, "vector scan filter"),
    (3, "stream batch merge"),
    (4, "hash sort key"),
]
BM25_K = 10

_Q_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, text in BM25_QUERIES for t in sorted(set(text.split()))
)


@register(
    "b1_bm25_topk",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
  FROM documents
),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf, any_value(doclen) AS doclen
  FROM (SELECT doc_id, len(ts) AS doclen, unnest(ts) AS token FROM toks)
  GROUP BY doc_id, token
),
sc AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         sum(len(ts)) * 1.0 / count(*) AS avgdl
  FROM toks
),
q(query_id, token) AS (VALUES {_Q_VALUES}),
dfreq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df
  FROM tf
  WHERE token IN (SELECT token FROM q)
  GROUP BY token
),
contrib AS (
  SELECT q.query_id, tf.doc_id,
         ln(1.0 + (sc.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * ({R.K1} + 1.0))
           / (tf.tf + {R.K1} * (1.0 - {R.B} + {R.B} * tf.doclen / sc.avgdl)) AS s
  FROM tf JOIN dfreq USING (token) JOIN q USING (token) CROSS JOIN sc
),
scored AS (
  SELECT query_id, doc_id, round(sum(s), 6) AS score
  FROM contrib GROUP BY query_id, doc_id
)
SELECT CAST(query_id AS INT) AS query_id, doc_id, score, CAST(rn AS INT) AS rank
FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
) WHERE rn <= {BM25_K}
""",
)
def b1_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents per query: one inverted-index shuffle,
    broadcast query vocabulary, two-level (bucketed) top-k so no single
    reducer sees a full posting list. Scores rounded to 6 dp and ranked
    by the rounded score on both engines."""
    docs = load(spark, sf_dir, "documents")
    return R.bm25_topk(docs, BM25_QUERIES, k=BM25_K)
