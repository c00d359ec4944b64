"""BPE vocabulary-learning queries (training-data ops).

The oracle replicates the ENTIRE iterative merge computation in pure
SQL: each merge level is one unrolled CTE block (pair counts -> top
pair -> ``list_reduce`` greedy fold), so DuckDB independently re-derives
the same merge rules from the data and the final segmentation is
hash-compared — the iteration itself is under the correctness gate,
not just its output shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import bpe as B
from kafka_streaming_polymarket_pipeline_spark.plans.registry import register
from kafka_streaming_polymarket_pipeline_spark.tables import load

N_MERGES = 6

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


def _bpe_cte(k: int) -> tuple[str, str]:
    """WITH-clause computing k BPE merge levels; returns (sql, final_cte)."""
    parts = [
        f"""w AS (
  SELECT t AS word, CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT unnest({_TOKS}) AS t FROM documents) GROUP BY t
),
v0 AS (
  SELECT word, wc,
         array_to_string(list_transform(generate_series(1, CAST(length(word) AS INTEGER)),
                                        i -> substr(word, i, 1)), ' ') AS seg
  FROM w
)"""
    ]
    for i in range(k):
        parts.append(
            f"""p{i} AS (
  SELECT pr.a AS a, pr.b AS b, CAST(sum(wc) AS BIGINT) AS c FROM (
    SELECT wc, unnest(list_transform(generate_series(1, len(s) - 1),
                                     i -> struct_pack(a := s[i], b := s[i + 1]))) AS pr
    FROM (SELECT wc, string_split(seg, ' ') AS s FROM v{i})
  ) GROUP BY pr.a, pr.b
),
t{i} AS (SELECT a, b FROM p{i} ORDER BY c DESC, a ASC, b ASC LIMIT 1),
v{i + 1} AS (
  SELECT word, wc,
         CASE WHEN t{i}.a IS NULL THEN seg
              ELSE list_reduce(string_split(seg, ' '), (acc, x) ->
                     CASE WHEN x = t{i}.b AND (acc = t{i}.a OR ends_with(acc, ' ' || t{i}.a))
                          THEN acc || x
                          ELSE acc || ' ' || x END)
         END AS seg
  FROM v{i} LEFT JOIN t{i} ON TRUE
)"""
        )
    return "WITH " + ",\n".join(parts), f"v{k}"


_CTE, _FINAL = _bpe_cte(N_MERGES)


@register(
    "v1_bpe_learn_vocab",
    oracle=f"""
{_CTE}
SELECT word, wc, seg,
       CAST(len(string_split(seg, ' ')) AS BIGINT) AS n_symbols
FROM {_FINAL}
""",
)
def v1_bpe_learn_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn a BPE vocabulary ({N} merges) from the corpus: one corpus
    pass for word frequencies, then every merge iteration runs over the
    distinct-word table only (tiny, broadcastable) — the Sennrich-style
    scale shape. Output: per-word final segmentation + symbol count."""
    docs = load(spark, sf_dir, "documents")
    segmented, _rules = B.learn_bpe(B.word_vocab(docs), N_MERGES)
    return segmented.select("word", "wc", "seg", "n_symbols")


@register(
    "v2_bpe_tokenize_corpus",
    oracle=f"""
{_CTE}
SELECT d.doc_id, CAST(sum(v.n_symbols) AS BIGINT) AS n_bpe_tokens
FROM (SELECT doc_id, unnest({_TOKS}) AS word FROM documents) d
JOIN (SELECT word, CAST(len(string_split(seg, ' ')) AS BIGINT) AS n_symbols
      FROM {_FINAL}) v USING (word)
GROUP BY d.doc_id
""",
)
def v2_bpe_tokenize_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE segmentation back to the corpus: per-doc
    BPE token counts via a broadcast join of the (small) vocab — the
    map-side shape corpus tokenization has at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    segmented, _rules = B.learn_bpe(B.word_vocab(docs), N_MERGES)
    return B.bpe_token_counts(docs, segmented)
