"""The end-to-end training-corpus build — the composition a real user of
this engine runs nightly, registered as ONE oracle-checked query:

  documents
    -> MinHash-LSH near-dup pairs (exact-verified, J >= 0.5)
    -> connected components (large-star/small-star), keep the canonical
       (minimum-id) document per cluster
    -> quality filter (composite score >= 0.5)
    -> deterministic mixture sampling (per-language keep rates)
    -> concat-and-chunk sequence packing at a 512-token budget

Every stage reuses an operator already hash-gated on its own (d3, d6b,
t3, x3, pk1), and the oracle re-derives the WHOLE pipeline in one SQL
statement — so this row failing while the pieces pass would localize a
composition bug (column contract drift, join key mismatch) immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import dedup as D
from kafka_streaming_polymarket_pipeline_spark.operators import packing as P
from kafka_streaming_polymarket_pipeline_spark.operators import sampling as S
from kafka_streaming_polymarket_pipeline_spark.operators import text as T
from kafka_streaming_polymarket_pipeline_spark.plans.registry import register
from kafka_streaming_polymarket_pipeline_spark.plans.sampling_plans import (
    MIX_DEFAULT,
    MIX_RATES,
)
from kafka_streaming_polymarket_pipeline_spark.tables import load

QUALITY_MIN = 0.5

_SQL_TOKENS = "list_filter(string_split({col}, ' '), x -> x <> '')"
_EN_WORDS = ", ".join(f"'{w}'" for w in T.LANG_STOPWORDS["en"])

# Composite quality score, written in the same operation order as
# operators/text.quality_score so the unrounded >= comparison is
# bit-identical across engines (rational arithmetic + fixed literals).
_QS = f"""
greatest(0.0, least(1.0,
  0.3 * (CAST(len(list_filter({_SQL_TOKENS.format(col='lower(text)')}, t -> t IN ({_EN_WORDS}))) AS BIGINT)
         / greatest(CAST(len({_SQL_TOKENS.format(col='text')}) AS BIGINT), 1))
  + 0.3 * (CAST(len(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS BIGINT)
           / greatest(CAST(len(text) AS BIGINT), 1))
  + 0.4 * (least(CAST(len({_SQL_TOKENS.format(col='text')}) AS BIGINT), 100) / 100.0)
  - 0.5 * (CAST(len(regexp_replace(lower(text), '[^0-9]', '', 'g')) AS BIGINT)
           / greatest(CAST(len(text) AS BIGINT), 1))
))"""

_MIX_KEY = "md5(concat_ws(':', lang, CAST(doc_id AS VARCHAR)))"


@register(
    "e2e_corpus_build",
    oracle=f"""
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(text) - 3, 1)),
                                 i -> substr(text, CAST(i AS INT), 5))) AS s
    FROM documents)
), sz AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_id_a, doc_id_b
  FROM inter
  JOIN sz sa ON doc_id_a = sa.doc_id
  JOIN sz sb ON doc_id_b = sb.doc_id
  WHERE i / (sa.n + sb.n - i) >= 0.5
), edges AS (
  SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
  UNION ALL
  SELECT doc_id_b, doc_id_a FROM pairs
), reach(node, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.node = e.dst
), clusters AS (
  SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
), kept AS (
  SELECT d.doc_id, d.lang, d.text
  FROM documents d JOIN clusters c ON d.doc_id = c.doc_id
  WHERE c.doc_id = c.cluster_id AND {_QS} >= {QUALITY_MIN}
), mixed AS (
  SELECT doc_id, lang, text FROM (
    SELECT doc_id, lang, text,
           CASE lang WHEN 'en' THEN 1.0 WHEN 'es' THEN 0.5
                     WHEN 'fr' THEN 0.5 WHEN 'de' THEN 0.25
                     ELSE 0.1 END AS r,
           row_number() OVER (PARTITION BY lang ORDER BY {_MIX_KEY}, doc_id) AS rn,
           count(*) OVER (PARTITION BY lang) AS n
    FROM kept
  ) WHERE rn <= CAST(ceil(r * n) AS BIGINT)
), tk AS (
  SELECT doc_id, lang,
         CAST(len({_SQL_TOKENS.format(col='text')}) AS BIGINT) AS n_tokens
  FROM mixed
), placed AS (
  SELECT doc_id, lang, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
              AS BIGINT) AS tok_start
  FROM tk
)
SELECT doc_id, lang, n_tokens, tok_start,
       tok_start // {P.PACK_BUDGET} AS seq_first,
       CASE WHEN n_tokens > 0 THEN (tok_start + n_tokens - 1) // {P.PACK_BUDGET}
            ELSE tok_start // {P.PACK_BUDGET} END AS seq_last
FROM placed
""",
)
def e2e_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full corpus materialization: dedup-canonical + quality-filtered +
    mixture-sampled documents packed into 512-token training sequences.
    Each stage is the already-verified operator; see module docstring."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(docs, threshold=0.5, n=5)
    clusters = D.neardup_clusters_star(docs, pairs)
    canonical = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    kept = docs.join(canonical, "doc_id").filter(
        T.quality_score(F.col("text")) >= QUALITY_MIN
    )
    mixed = S.mixture_sample(kept, rates=MIX_RATES, default_rate=MIX_DEFAULT)
    corpus = docs.join(mixed.select("doc_id"), "doc_id")
    packed = P.packed_sequences(corpus)
    return packed.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id", "lang", "n_tokens", "tok_start", "seq_first", "seq_last"
    )
