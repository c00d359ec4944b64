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


@register(
    "v3_unigram_estep",
    oracle=f"""
WITH RECURSIVE w AS (
  SELECT t AS word, CAST(count(*) AS BIGINT) AS wc, CAST(len(t) AS INT) AS L
  FROM (SELECT unnest({_TOKS}) AS t FROM documents)
  GROUP BY t
),
pos AS (
  SELECT word, wc, L, CAST(jj.j AS INT) AS j, CAST(ii.i AS INT) AS i,
         substr(word, CAST(jj.j AS INT) + 1, CAST(ii.i - jj.j AS INT)) AS piece
  FROM w,
       LATERAL (SELECT unnest(range(1, L + 1)) AS i) ii,
       LATERAL (SELECT unnest(range(0, L)) AS j) jj
  WHERE jj.j < ii.i AND ii.i - jj.j <= 4
),
occ AS (
  SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt FROM pos GROUP BY piece
),
vocab AS (
  SELECT piece, cnt FROM occ WHERE cnt >= 2 OR len(piece) = 1
),
vtot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM vocab),
vlp AS (
  SELECT piece, CAST(round(ln(cnt / tot) * 1e6) AS BIGINT) AS lp
  FROM vocab, vtot
),
cand AS (
  SELECT p.word, p.i, p.j, v.lp FROM pos p JOIN vlp v USING (piece)
),
dp(word, i, b0, b1, b2, b3, backs) AS (
  SELECT word, 0, CAST(0 AS BIGINT), CAST(NULL AS BIGINT),
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST('' AS VARCHAR)
  FROM w
  UNION ALL
  SELECT d.word, d.i + 1, best.tot, d.b0, d.b1, d.b2,
         CASE WHEN d.backs = '' THEN CAST(best.bj AS VARCHAR)
              ELSE d.backs || ',' || CAST(best.bj AS VARCHAR) END
  FROM dp d
  JOIN w ON w.word = d.word AND d.i < w.L
  JOIN LATERAL (
    SELECT CAST(max((prev + c.lp + 1099511627776) * 64 + 64 - (d.i + 1 - c.j))
                // 64 - 1099511627776 AS BIGINT) AS tot,
           CAST(d.i + 1 - 64 + max((prev + c.lp + 1099511627776) * 64
                + 64 - (d.i + 1 - c.j)) % 64 AS INT) AS bj
    FROM (
      SELECT c0.j, c0.lp,
             CASE d.i - c0.j WHEN 0 THEN d.b0 WHEN 1 THEN d.b1
                             WHEN 2 THEN d.b2 ELSE d.b3 END AS prev
      FROM cand c0 WHERE c0.word = d.word AND c0.i = d.i + 1
    ) c
    WHERE c.prev IS NOT NULL
  ) best ON TRUE
),
fin AS (
  SELECT dp.word, w.wc, dp.backs FROM dp JOIN w USING (word) WHERE dp.i = w.L
),
walk(word, wc, pos, piece) AS (
  SELECT f.word, f.wc, CAST(len(f.word) AS INT), CAST(NULL AS VARCHAR) FROM fin f
  UNION ALL
  SELECT wk.word, wk.wc,
         CAST(string_split(f.backs, ',')[wk.pos] AS INT),
         substr(wk.word, CAST(string_split(f.backs, ',')[wk.pos] AS INT) + 1,
                wk.pos - CAST(string_split(f.backs, ',')[wk.pos] AS INT))
  FROM walk wk JOIN fin f USING (word)
  WHERE wk.pos > 0
),
used AS (
  SELECT piece, CAST(sum(wc) AS BIGINT) AS new_count
  FROM walk WHERE piece IS NOT NULL GROUP BY piece
)
SELECT u.piece, u.new_count,
       CAST(round(ln(u.new_count
            / (SELECT CAST(sum(new_count) AS DOUBLE) FROM used)) * 1e6) AS BIGINT)
         AS new_lp_micro
FROM used u
""",
)
def v3_unigram_estep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer EM E-step (Kudo 2018 / SentencePiece): seed
    piece vocab from substring counts (len <= 4, min count 2, chars
    always kept), Viterbi-segment every distinct word under integer
    micro-log-probs, re-estimate piece counts. The iterative family's
    last missing member — EXPECTATION-MAXIMIZATION with the dynamic
    program itself under the hash gate: the Viterbi recurrence is exact
    BIGINT arithmetic (tie-break encoded in the comparison key, 2^40
    offset keeps div/mod nonnegative), the oracle replays it as a
    rolling-window recursive CTE (best[i] needs only best[i-4..i-1])
    plus a recursive backtrace walk, and Spark runs the same DP as a
    row-local F.aggregate fold — per DISTINCT WORD, zero UDFs, zero
    extra shuffles (v1's corpus-size-independence carries over)."""
    return B.unigram_viterbi_estep(load(spark, sf_dir, "documents"))


def _uni_dp_ctes(sfx: str, vlp: str) -> str:
    """One Viterbi round as CTEs suffixed ``sfx`` reading model ``vlp``:
    rolling-window recursive DP + recursive backtrace + piece re-count
    (the v3 oracle's core, emitted once per EM iteration)."""
    return f"""cand{sfx} AS (
  SELECT p.word, p.i, p.j, v.lp FROM pos p JOIN {vlp} v USING (piece)
),
dp{sfx}(word, i, b0, b1, b2, b3, backs) AS (
  SELECT word, 0, CAST(0 AS BIGINT), CAST(NULL AS BIGINT),
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST('' AS VARCHAR)
  FROM w
  UNION ALL
  SELECT d.word, d.i + 1, best.tot, d.b0, d.b1, d.b2,
         CASE WHEN d.backs = '' THEN CAST(best.bj AS VARCHAR)
              ELSE d.backs || ',' || CAST(best.bj AS VARCHAR) END
  FROM dp{sfx} d
  JOIN w ON w.word = d.word AND d.i < w.L
  JOIN LATERAL (
    SELECT CAST(max((prev + c.lp + 1099511627776) * 64 + 64 - (d.i + 1 - c.j))
                // 64 - 1099511627776 AS BIGINT) AS tot,
           CAST(d.i + 1 - 64 + max((prev + c.lp + 1099511627776) * 64
                + 64 - (d.i + 1 - c.j)) % 64 AS INT) AS bj
    FROM (
      SELECT c0.j, c0.lp,
             CASE d.i - c0.j WHEN 0 THEN d.b0 WHEN 1 THEN d.b1
                             WHEN 2 THEN d.b2 ELSE d.b3 END AS prev
      FROM cand{sfx} c0 WHERE c0.word = d.word AND c0.i = d.i + 1
    ) c
    WHERE c.prev IS NOT NULL
  ) best ON TRUE
),
fin{sfx} AS (
  SELECT dp{sfx}.word, w.wc, dp{sfx}.backs
  FROM dp{sfx} JOIN w USING (word) WHERE dp{sfx}.i = w.L
),
walk{sfx}(word, wc, pos, piece) AS (
  SELECT f.word, f.wc, CAST(len(f.word) AS INT), CAST(NULL AS VARCHAR)
  FROM fin{sfx} f
  UNION ALL
  SELECT wk.word, wk.wc,
         CAST(string_split(f.backs, ',')[wk.pos] AS INT),
         substr(wk.word, CAST(string_split(f.backs, ',')[wk.pos] AS INT) + 1,
                wk.pos - CAST(string_split(f.backs, ',')[wk.pos] AS INT))
  FROM walk{sfx} wk JOIN fin{sfx} f USING (word)
  WHERE wk.pos > 0
),
used{sfx} AS (
  SELECT piece, CAST(sum(wc) AS BIGINT) AS new_count
  FROM walk{sfx} WHERE piece IS NOT NULL GROUP BY piece
)"""


_UNI_PRELUDE = f"""w AS (
  SELECT t AS word, CAST(count(*) AS BIGINT) AS wc, CAST(len(t) AS INT) AS L
  FROM (SELECT unnest({_TOKS}) AS t FROM documents)
  GROUP BY t
),
pos AS (
  SELECT word, wc, L, CAST(jj.j AS INT) AS j, CAST(ii.i AS INT) AS i,
         substr(word, CAST(jj.j AS INT) + 1, CAST(ii.i - jj.j AS INT)) AS piece
  FROM w,
       LATERAL (SELECT unnest(range(1, L + 1)) AS i) ii,
       LATERAL (SELECT unnest(range(0, L)) AS j) jj
  WHERE jj.j < ii.i AND ii.i - jj.j <= 4
),
occ AS (
  SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt FROM pos GROUP BY piece
),
vocab AS (
  SELECT piece, cnt FROM occ WHERE cnt >= 2 OR len(piece) = 1
),
vtot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM vocab),
vlp AS (
  SELECT piece, CAST(round(ln(cnt / tot) * 1e6) AS BIGINT) AS lp
  FROM vocab, vtot
)"""


@register(
    "v3b_unigram_em2",
    oracle=f"""
WITH RECURSIVE {_UNI_PRELUDE},
{_uni_dp_ctes("1", "vlp")},
vocab2 AS (
  SELECT piece, new_count AS cnt FROM used1
  UNION ALL
  SELECT c.piece, CAST(1 AS BIGINT)
  FROM (SELECT DISTINCT piece FROM pos WHERE i - j = 1) c
  WHERE c.piece NOT IN (SELECT piece FROM used1)
),
vtot2 AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM vocab2),
vlp2 AS (
  SELECT piece, CAST(round(ln(cnt / tot) * 1e6) AS BIGINT) AS lp
  FROM vocab2, vtot2
),
{_uni_dp_ctes("2", "vlp2")}
SELECT u.piece, u.new_count,
       CAST(round(ln(u.new_count
            / (SELECT CAST(sum(new_count) AS DOUBLE) FROM used2)) * 1e6) AS BIGINT)
         AS new_lp_micro
FROM used2 u
""",
)
def v3b_unigram_em2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO unigram-LM EM iterations under one hash gate — v3's E-step
    chained the way t20 chains gradient steps: round 2 re-segments every
    distinct word under round 1's re-estimated probabilities (vocab 2 =
    used pieces + chars-always-survive at count 1, the SentencePiece
    rule that keeps every word segmentable as neighbors shrink the
    vocab). The oracle unrolls BOTH Viterbi dynamic programs — two
    rolling-window recursive CTEs and two recursive backtrace walks —
    in a single statement; the Spark side reruns the same row-local
    exact-BIGINT fold with the per-word frames persisted across
    rounds."""
    return B.unigram_em2(load(spark, sf_dir, "documents"))


@register(
    "v4_unigram_tokenize",
    oracle=f"""
WITH RECURSIVE {_UNI_PRELUDE},
{_uni_dp_ctes("1", "vlp")},
vocab2 AS (
  SELECT piece, new_count AS cnt FROM used1
  UNION ALL
  SELECT c.piece, CAST(1 AS BIGINT)
  FROM (SELECT DISTINCT piece FROM pos WHERE i - j = 1) c
  WHERE c.piece NOT IN (SELECT piece FROM used1)
),
vtot2 AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM vocab2),
vlp2 AS (
  SELECT piece, CAST(round(ln(cnt / tot) * 1e6) AS BIGINT) AS lp
  FROM vocab2, vtot2
),
{_uni_dp_ctes("2", "vlp2")},
seg AS (
  SELECT word, list(piece ORDER BY pos) AS pieces
  FROM walk2 WHERE piece IS NOT NULL GROUP BY word
),
dtk AS (
  SELECT d.doc_id, d.tks[CAST(ii.i AS INT)] AS tk, CAST(ii.i AS INT) AS tp
  FROM (SELECT doc_id, {_TOKS} AS tks FROM documents) d,
       LATERAL (SELECT unnest(range(1, len(d.tks) + 1)) AS i) ii
),
pd AS (
  SELECT dtk.doc_id, flatten(list(s.pieces ORDER BY dtk.tp)) AS stream
  FROM dtk JOIN seg s ON s.word = dtk.tk
  GROUP BY dtk.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(len(pd.stream), 0) AS BIGINT) AS n_pieces,
       md5(coalesce(array_to_string(pd.stream, ' '), '')) AS pieces_fp
FROM documents d LEFT JOIN pd USING (doc_id)
""",
)
def v4_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the two-iteration EM unigram model to the corpus — the
    trainer's missing half (v2 applies v1's merges, apply_quality_lr
    applies t20's weights): every document's tokens Viterbi-segmented
    under v3b's round-2 probabilities, materialized as one
    reading-order piece stream per document and fingerprinted whole
    (md5 of the space-joined stream — the segmentation itself is under
    the hash, not just its length). Segmentation stays per-DISTINCT-
    word; the corpus side is one posexplode + a word->pieces join + a
    groupBy(doc) re-assembly, the v2 apply shape."""
    return B.unigram_tokenize(load(spark, sf_dir, "documents"))


@register(
    "v5_unigram_doc_ppl",
    oracle=f"""
WITH RECURSIVE {_UNI_PRELUDE},
{_uni_dp_ctes("1", "vlp")},
vocab2 AS (
  SELECT piece, new_count AS cnt FROM used1
  UNION ALL
  SELECT c.piece, CAST(1 AS BIGINT)
  FROM (SELECT DISTINCT piece FROM pos WHERE i - j = 1) c
  WHERE c.piece NOT IN (SELECT piece FROM used1)
),
vtot2 AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM vocab2),
vlp2 AS (
  SELECT piece, CAST(round(ln(cnt / tot) * 1e6) AS BIGINT) AS lp
  FROM vocab2, vtot2
),
{_uni_dp_ctes("2", "vlp2")},
wordlp AS (
  SELECT wk.word,
         CAST(count(*) AS BIGINT) AS np_w,
         CAST(sum(v.lp) AS BIGINT) AS lp_w
  FROM walk2 wk JOIN vlp2 v ON v.piece = wk.piece
  WHERE wk.piece IS NOT NULL
  GROUP BY wk.word
),
dtk AS (
  SELECT doc_id, unnest({_TOKS}) AS word FROM documents
),
ds AS (
  SELECT dtk.doc_id,
         CAST(sum(wl.np_w) AS BIGINT) AS n_pieces,
         CAST(sum(wl.lp_w) AS BIGINT) AS total_lp_micro
  FROM dtk JOIN wordlp wl USING (word)
  GROUP BY dtk.doc_id
),
scored AS (
  SELECT d.doc_id,
         CAST(coalesce(ds.n_pieces, 0) AS BIGINT) AS n_pieces,
         CAST(coalesce(ds.total_lp_micro, 0) AS BIGINT) AS total_lp_micro,
         round(CASE WHEN coalesce(ds.n_pieces, 0) = 0 THEN 0.0
                    ELSE ds.total_lp_micro / 1e6 / ds.n_pieces END, 6) AS mean_lp
  FROM documents d LEFT JOIN ds USING (doc_id)
)
SELECT doc_id, n_pieces, total_lp_micro, mean_lp,
       round(exp(-mean_lp), 6) AS ppl
FROM scored
""",
)
def v5_unigram_doc_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under the EM-trained unigram LM — the
    CCNet quality gate (Wenzek et al. 2020) run with the model the
    pipeline just trained (v3b's round-2 probabilities) instead of an
    imported KenLM: docs scored by mean per-piece log-prob of their
    Viterbi segmentation, the statistic CCNet thresholds into
    head/middle/tail. Closes the v-tier's train->score loop the way v4
    closes train->tokenize and t20/t21 close train->eval. Per-piece
    log-probs are exact integer micro-units so (total_lp_micro,
    n_pieces) are exact BIGINT sums; ppl = exp(-mean) is computed on
    the ALREADY-6dp-ROUNDED mean (t16's discipline: libm exp
    differences operate on identical inputs). Scale: the DP never
    touches the corpus; scoring is one token explode + word-key join +
    groupBy(doc) — v2's apply shape."""
    return B.unigram_doc_logprob(load(spark, sf_dir, "documents"))


_P13 = repr(1 / 3)  # 0.3333333333333333 — round-trips to the same double
_P23 = repr(2 / 3)  # in both engines, so the cutpoint inputs are identical


@register(
    "x11_ccnet_ppl_buckets",
    oracle=f"""
WITH RECURSIVE {_UNI_PRELUDE},
{_uni_dp_ctes("1", "vlp")},
vocab2 AS (
  SELECT piece, new_count AS cnt FROM used1
  UNION ALL
  SELECT c.piece, CAST(1 AS BIGINT)
  FROM (SELECT DISTINCT piece FROM pos WHERE i - j = 1) c
  WHERE c.piece NOT IN (SELECT piece FROM used1)
),
vtot2 AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM vocab2),
vlp2 AS (
  SELECT piece, CAST(round(ln(cnt / tot) * 1e6) AS BIGINT) AS lp
  FROM vocab2, vtot2
),
{_uni_dp_ctes("2", "vlp2")},
wordlp AS (
  SELECT wk.word,
         CAST(count(*) AS BIGINT) AS np_w,
         CAST(sum(v.lp) AS BIGINT) AS lp_w
  FROM walk2 wk JOIN vlp2 v ON v.piece = wk.piece
  WHERE wk.piece IS NOT NULL
  GROUP BY wk.word
),
dtk AS (
  SELECT doc_id, unnest({_TOKS}) AS word FROM documents
),
ds AS (
  SELECT dtk.doc_id,
         CAST(sum(wl.np_w) AS BIGINT) AS n_pieces,
         CAST(sum(wl.lp_w) AS BIGINT) AS total_lp_micro
  FROM dtk JOIN wordlp wl USING (word)
  GROUP BY dtk.doc_id
),
sc AS (
  SELECT d.doc_id, d.lang,
         round(exp(-round(CASE WHEN coalesce(ds.n_pieces, 0) = 0 THEN 0.0
                    ELSE ds.total_lp_micro / 1e6 / ds.n_pieces END, 6)), 6) AS ppl
  FROM documents d LEFT JOIN ds USING (doc_id)
),
cuts AS (
  SELECT lang,
         round(quantile_cont(ppl, {_P13}), 6) AS c1,
         round(quantile_cont(ppl, {_P23}), 6) AS c2
  FROM sc GROUP BY lang
)
SELECT sc.doc_id, sc.lang, sc.ppl,
       CASE WHEN sc.ppl <= cuts.c1 THEN 'head'
            WHEN sc.ppl <= cuts.c2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM sc JOIN cuts USING (lang)
""",
)
def x11_ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3),
    end-to-end in-engine: per-language perplexity TERTILES under the
    v3b-trained unigram LM bucket every document — head (lowest ppl)
    is what CCNet feeds to LM pretraining. v5 scores; the cutpoints are
    exact interpolated per-lang tertiles (a12's percentile form, both
    engines fed the identical repr'd double 1/3) ROUNDED to 6dp before
    comparison so both engines threshold on identical values; bucket
    assignment is a broadcast join of the ≤n_langs cutpoint rows —
    map-only, no corpus-wide window/sort anywhere. At 100 TB the exact
    per-lang percentile aggregate swaps for percentile_approx or the
    a34 sketch (CCNet itself computes cutoffs on a sample), leaving
    the apply side untouched."""
    from pyspark import StorageLevel

    docs = load(spark, sf_dir, "documents")
    sc = (
        B.unigram_doc_logprob(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "ppl")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cuts = sc.groupBy("lang").agg(
        F.round(F.expr(f"percentile(ppl, {_P13})"), 6).alias("c1"),
        F.round(F.expr(f"percentile(ppl, {_P23})"), 6).alias("c2"),
    )
    return sc.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        "ppl",
        F.when(F.col("ppl") <= F.col("c1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


@register(
    "x11b_ccnet_buckets_approx",
    oracle=f"""
WITH RECURSIVE {_UNI_PRELUDE},
{_uni_dp_ctes("1", "vlp")},
vocab2 AS (
  SELECT piece, new_count AS cnt FROM used1
  UNION ALL
  SELECT c.piece, CAST(1 AS BIGINT)
  FROM (SELECT DISTINCT piece FROM pos WHERE i - j = 1) c
  WHERE c.piece NOT IN (SELECT piece FROM used1)
),
vtot2 AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM vocab2),
vlp2 AS (
  SELECT piece, CAST(round(ln(cnt / tot) * 1e6) AS BIGINT) AS lp
  FROM vocab2, vtot2
),
{_uni_dp_ctes("2", "vlp2")},
wordlp AS (
  SELECT wk.word,
         CAST(count(*) AS BIGINT) AS np_w,
         CAST(sum(v.lp) AS BIGINT) AS lp_w
  FROM walk2 wk JOIN vlp2 v ON v.piece = wk.piece
  WHERE wk.piece IS NOT NULL
  GROUP BY wk.word
),
dtk AS (
  SELECT doc_id, unnest({_TOKS}) AS word FROM documents
),
ds AS (
  SELECT dtk.doc_id,
         CAST(sum(wl.np_w) AS BIGINT) AS n_pieces,
         CAST(sum(wl.lp_w) AS BIGINT) AS total_lp_micro
  FROM dtk JOIN wordlp wl USING (word)
  GROUP BY dtk.doc_id
),
sc AS (
  SELECT d.doc_id, d.lang,
         round(exp(-round(CASE WHEN coalesce(ds.n_pieces, 0) = 0 THEN 0.0
                    ELSE ds.total_lp_micro / 1e6 / ds.n_pieces END, 6)), 6) AS ppl
  FROM documents d LEFT JOIN ds USING (doc_id)
)
SELECT lang,
       round(quantile_cont(ppl, {_P13}), 6) AS exact_c1,
       round(quantile_cont(ppl, {_P23}), 6) AS exact_c2,
       TRUE AS approx_in_band,
       TRUE AS agree_ok
FROM sc GROUP BY lang
""",
)
def x11b_ccnet_buckets_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB cutpoint swap x11's docstring prescribes, made a
    driver-checkable gate (r09 verdict task 6, the a13b/a14 pattern):
    the per-lang tertile cutoffs come from percentile_approx (a KLL/GK
    mergeable sketch, accuracy 10000) instead of the exact interpolated
    percentile, and the hashable contract is (a) each approx cutoff
    lands inside a RANK band around its exact tertile ([0.28, 0.39]
    for 1/3, [0.61, 0.72] for 2/3 — rank bands hold at any group size,
    the a14 lesson) and (b) the head/middle/tail assignment under the
    approx cutoffs agrees with the exact assignment on >= 98% of docs
    per language — which is the property the swap must preserve for
    CCNet's pipeline (CCNet itself computes cutoffs on a sample). The
    oracle reproduces the exact cutpoints and pins both booleans TRUE.
    Scale: identical to x11 except the cutpoint aggregate is the
    mergeable sketch — map-side partials, bytes-sized state — and the
    agreement check is one more broadcast-cuts map + per-lang avg."""
    from pyspark import StorageLevel

    docs = load(spark, sf_dir, "documents")
    sc = (
        B.unigram_doc_logprob(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "ppl")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cuts = sc.groupBy("lang").agg(
        F.round(F.expr(f"percentile(ppl, {_P13})"), 6).alias("c1"),
        F.round(F.expr(f"percentile(ppl, {_P23})"), 6).alias("c2"),
        F.expr("percentile(ppl, 0.28)").alias("lo1"),
        F.expr("percentile(ppl, 0.39)").alias("hi1"),
        F.expr("percentile(ppl, 0.61)").alias("lo2"),
        F.expr("percentile(ppl, 0.72)").alias("hi2"),
        F.round(F.expr(f"percentile_approx(ppl, {_P13}, 10000)"), 6).alias("a1"),
        F.round(F.expr(f"percentile_approx(ppl, {_P23}, 10000)"), 6).alias("a2"),
    )

    def _bucket(c1, c2):
        return (
            F.when(F.col("ppl") <= F.col(c1), F.lit("head"))
            .when(F.col("ppl") <= F.col(c2), F.lit("middle"))
            .otherwise(F.lit("tail"))
        )

    agree = (
        sc.join(F.broadcast(cuts), "lang")
        .select(
            "lang",
            (_bucket("c1", "c2") == _bucket("a1", "a2")).cast("int").alias("_same"),
        )
        .groupBy("lang")
        .agg(F.avg("_same").alias("agree_rate"))
    )
    return (
        cuts.join(F.broadcast(agree), "lang")
        .select(
            "lang",
            F.col("c1").alias("exact_c1"),
            F.col("c2").alias("exact_c2"),
            (
                F.col("a1").between(F.col("lo1"), F.col("hi1"))
                & F.col("a2").between(F.col("lo2"), F.col("hi2"))
            ).alias("approx_in_band"),
            (F.col("agree_rate") >= 0.98).alias("agree_ok"),
        )
    )


@register(
    "e2e_corpus_build_v",
    oracle=f"""
WITH RECURSIVE {_UNI_PRELUDE},
{_uni_dp_ctes("1", "vlp")},
vocab2 AS (
  SELECT piece, new_count AS cnt FROM used1
  UNION ALL
  SELECT c.piece, CAST(1 AS BIGINT)
  FROM (SELECT DISTINCT piece FROM pos WHERE i - j = 1) c
  WHERE c.piece NOT IN (SELECT piece FROM used1)
),
vtot2 AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM vocab2),
vlp2 AS (
  SELECT piece, CAST(round(ln(cnt / tot) * 1e6) AS BIGINT) AS lp
  FROM vocab2, vtot2
),
{_uni_dp_ctes("2", "vlp2")},
wordlp AS (
  SELECT wk.word,
         CAST(count(*) AS BIGINT) AS np_w,
         CAST(sum(v.lp) AS BIGINT) AS lp_w
  FROM walk2 wk JOIN vlp2 v ON v.piece = wk.piece
  WHERE wk.piece IS NOT NULL
  GROUP BY wk.word
),
dtk AS (
  SELECT doc_id, unnest({_TOKS}) AS word FROM documents
),
ds AS (
  SELECT dtk.doc_id,
         CAST(sum(wl.np_w) AS BIGINT) AS n_pieces,
         CAST(sum(wl.lp_w) AS BIGINT) AS total_lp_micro
  FROM dtk JOIN wordlp wl USING (word)
  GROUP BY dtk.doc_id
),
sc AS (
  SELECT d.doc_id, d.lang,
         round(exp(-round(CASE WHEN coalesce(ds.n_pieces, 0) = 0 THEN 0.0
                    ELSE ds.total_lp_micro / 1e6 / ds.n_pieces END, 6)), 6) AS ppl
  FROM documents d LEFT JOIN ds USING (doc_id)
),
cuts AS (
  SELECT lang,
         round(quantile_cont(ppl, {_P13}), 6) AS c1,
         round(quantile_cont(ppl, {_P23}), 6) AS c2
  FROM sc GROUP BY lang
),
picked AS (
  SELECT sc.doc_id, sc.lang, sc.ppl,
         CASE WHEN sc.ppl <= cuts.c1 THEN 'head' ELSE 'middle' END AS bucket
  FROM sc JOIN cuts USING (lang)
  WHERE sc.ppl <= cuts.c2
),
wd AS (
  SELECT p.doc_id, p.lang, p.ppl, p.bucket, d.text
  FROM picked p JOIN documents d USING (doc_id)
),
canon AS (SELECT text, min(doc_id) AS keep_id FROM wd GROUP BY text)
SELECT wd.doc_id, wd.lang, wd.ppl, wd.bucket,
       CAST(len(list_filter(string_split(wd.text, ' '), x -> x <> ''))
            AS BIGINT) AS n_tokens
FROM wd JOIN canon ON wd.text = canon.text AND wd.doc_id = canon.keep_id
""",
)
def e2e_corpus_build_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-era corpus materialization: train the unigram LM in-engine,
    perplexity-bucket per language (x11), DISCARD the tail tertile
    (Wenzek et al. keep head+middle for LM pretraining), exact-dedup
    the survivors (d1's keep-first rule — selection among gated docs,
    so the dedup population is what the gate produced, the composition
    coupling per-stage gates can't see), and account surviving tokens.
    One statement re-derives train -> score -> cut -> gate -> dedup;
    joins the e2e family as its model-scored member (e2e: quality gate;
    _t: temperature mix; _d: DSIR; _p: paragraph scrub + packing)."""
    from pyspark.sql import functions as F

    from kafka_streaming_polymarket_pipeline_spark.operators.text import tokens

    docs = load(spark, sf_dir, "documents")
    kept = x11_ccnet_ppl_buckets(spark, sf_dir).filter(F.col("bucket") != "tail")
    wd = kept.join(docs.select("doc_id", "text"), "doc_id")
    canon = wd.groupBy("text").agg(F.min("doc_id").alias("_keep"))
    return (
        wd.join(canon, "text")
        .filter(F.col("doc_id") == F.col("_keep"))
        .select(
            "doc_id",
            "lang",
            "ppl",
            "bucket",
            F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
    )
