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


# Second composition: the CCNet/temperature-era pipeline over this round's
# new operators (t8 decontamination, t12 bigram-LM quality, x5 temperature
# repeats, packing of the repeated stream). LM threshold and bands are
# fixed constants; every float compared crosses engines as the identical
# expression.
LM_MIN_LOGPROB = -8.0
_REP_STRIDE = 8  # stream id = doc_id * stride + rep; n_repeats clamped to stride

_LTOK = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


@register(
    "e2e_corpus_build_t",
    oracle=f"""
WITH tkz AS (
  SELECT doc_id, lang, text, {_LTOK} AS ts FROM documents
),
grams8 AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(ts) - 7, 0) + 1),
                                 i -> array_to_string(ts[i:i+7], ' '))) AS g
    FROM tkz)
),
bench AS (SELECT DISTINCT g FROM grams8 WHERE EXISTS (
  SELECT 1 FROM tkz t WHERE t.doc_id = grams8.doc_id AND t.doc_id % 17 = 3)
),
contaminated AS (
  SELECT DISTINCT gr.doc_id FROM grams8 gr JOIN bench b ON gr.g = b.g
  WHERE gr.doc_id % 17 <> 3
),
clean AS (
  SELECT t.* FROM tkz t
  WHERE t.doc_id % 17 <> 3
    AND t.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
g AS (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM clean, LATERAL (SELECT unnest(range(1, len(ts))) AS i)
),
c1 AS (
  SELECT token, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT unnest(ts) AS token FROM clean) GROUP BY token
),
vv AS (
  SELECT CAST(count(DISTINCT token) AS BIGINT) AS v
  FROM (SELECT unnest(ts) AS token FROM clean)
),
c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM g GROUP BY w1, w2),
lm AS (
  SELECT doc_id, round(avg(ln((c2.c2 + 1.0) / (c1.c1 + vv.v))), 6) AS avg_logprob
  FROM g JOIN c2 USING (w1, w2) JOIN c1 ON g.w1 = c1.token CROSS JOIN vv
  GROUP BY doc_id
),
kept AS (
  SELECT c.doc_id, c.lang, c.ts FROM clean c
  JOIN lm ON lm.doc_id = c.doc_id
  WHERE lm.avg_logprob >= {LM_MIN_LOGPROB}
),
lc AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM kept GROUP BY lang),
tt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM lc),
zz AS (SELECT sum(pow(n_docs * 1.0 / total, 0.3)) AS z FROM lc CROSS JOIN tt),
ww AS (
  SELECT lang,
         (pow(n_docs * 1.0 / total, 0.3) / z) / (n_docs * 1.0 / total) AS boost
  FROM lc CROSS JOIN tt CROSS JOIN zz
),
reps AS (
  SELECT k.doc_id, k.lang, CAST(len(k.ts) AS BIGINT) AS n_tokens,
         least(CAST(floor(boost)
              + CASE WHEN boost - floor(boost) >
                  (('0x' || substr(md5(concat_ws(':', k.lang, CAST(k.doc_id AS VARCHAR))), 1, 8))::BIGINT / 4294967296.0)
                THEN 1 ELSE 0 END AS BIGINT), {_REP_STRIDE}) AS n_repeats
  FROM kept k JOIN ww ON ww.lang = k.lang
),
stream AS (
  SELECT doc_id, lang, n_tokens,
         doc_id * {_REP_STRIDE} + rep AS stream_id
  FROM reps, LATERAL (SELECT unnest(range(1, CAST(n_repeats + 1 AS BIGINT))) AS rep)
),
placed AS (
  SELECT doc_id, lang, n_tokens, stream_id,
         CAST(sum(n_tokens) OVER (ORDER BY stream_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
              AS BIGINT) AS tok_start
  FROM stream
)
SELECT doc_id, lang, stream_id, n_tokens, tok_start,
       tok_start // 512 AS seq_first,
       CASE WHEN n_tokens > 0 THEN (tok_start + n_tokens - 1) // 512
            ELSE tok_start // 512 END AS seq_last
FROM placed
""",
)
def e2e_corpus_build_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The temperature-era corpus build, composed from this round's
    operators and hash-gated end-to-end:

      documents -> benchmark decontamination (token-8-gram collision vs
      the doc_id%17=3 bench split) -> corpus bigram-LM quality gate
      (avg log-prob >= LM_MIN_LOGPROB, LM learned on the clean corpus)
      -> temperature repeats (alpha=0.3 over survivors, deterministic
      stochastic rounding) -> repeat-expanded stream packed into
      512-token sequences (stream id = doc_id * stride + repeat).

    Every stage is an operator already gated alone (t8, t12, x5, pk1);
    this row failing while those pass localizes composition drift."""
    docs = load(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % 17 == 3
    bench_grams = (
        docs.filter(is_bench)
        .select(F.explode(T.token_ngrams(F.lower(F.col("text")), 8)).alias("g"))
        .distinct()
    )
    train = docs.filter(~is_bench)
    contaminated = (
        train.select("doc_id", F.explode(T.token_ngrams(F.lower(F.col("text")), 8)).alias("g"))
        .join(F.broadcast(bench_grams), "g")
        .select("doc_id")
        .distinct()
    )
    clean = train.join(contaminated, "doc_id", "left_anti")

    lm = T.bigram_lm_scores(clean)
    kept = clean.join(
        lm.filter(F.col("avg_logprob") >= LM_MIN_LOGPROB).select("doc_id"), "doc_id"
    )

    counts = kept.groupBy("lang").agg(F.count("*").alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("total"))
    w = (
        counts.crossJoin(F.broadcast(total))
        .withColumn("p_raw", F.col("n_docs") / F.col("total"))
        .withColumn("pa", F.pow("p_raw", F.lit(0.3)))
    )
    zf = w.agg(F.sum("pa").alias("z"))
    boosts = w.crossJoin(F.broadcast(zf)).select(
        "lang", ((F.col("pa") / F.col("z")) / F.col("p_raw")).alias("boost")
    )
    key = F.md5(F.concat_ws(":", F.col("lang"), F.col("doc_id").cast("string")))
    u01 = F.conv(F.substring(key, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)
    reps = (
        kept.join(F.broadcast(boosts), "lang")
        .select(
            "doc_id",
            "lang",
            T.token_count(F.lower(F.col("text"))).alias("n_tokens"),
            # Clamp to the stride: stream_id = doc_id * stride + rep is only
            # collision-free while rep <= stride, and an unbounded boost
            # (p^(alpha-1)/z for a rare language) could exceed it. A max-
            # upsampling cap is standard temperature-sampling practice; the
            # oracle applies the identical least().
            F.least(
                (
                    F.floor("boost")
                    + F.when(F.col("boost") - F.floor("boost") > u01, 1).otherwise(0)
                ).cast("long"),
                F.lit(_REP_STRIDE),
            ).alias("n_repeats"),
        )
    )
    stream = reps.filter(F.col("n_repeats") > 0).select(
        "doc_id", "lang", "n_tokens",
        F.explode(F.sequence(F.lit(1), F.col("n_repeats"))).alias("rep"),
    ).select(
        "doc_id", "lang", "n_tokens",
        (F.col("doc_id") * _REP_STRIDE + F.col("rep")).alias("stream_id"),
    )
    # packed_sequences tokenizes raw text; here token counts ride along
    # on the repeat-expanded stream, so run the same bucketed prefix-sum
    # placement directly over n_tokens.
    from pyspark.sql import Window as W

    bucket = F.floor(F.col("stream_id") / P.PACK_BUCKET_WIDTH)
    wl = W.partitionBy("_b").orderBy("stream_id").rowsBetween(W.unboundedPreceding, 0)
    local = stream.withColumn("_b", bucket).withColumn(
        "_cum", F.sum("n_tokens").over(wl)
    )
    totals = local.groupBy("_b").agg(F.sum("n_tokens").alias("_tot"))
    offsets = P._bucket_offsets(totals, "_b", "_tot")
    placed = local.join(F.broadcast(offsets), "_b").select(
        "doc_id", "lang", "stream_id", "n_tokens",
        (F.col("_offset") + F.col("_cum") - F.col("n_tokens")).alias("tok_start"),
    )
    seq_first = F.floor(F.col("tok_start") / P.PACK_BUDGET)
    seq_last = F.when(
        F.col("n_tokens") > 0,
        F.floor((F.col("tok_start") + F.col("n_tokens") - 1) / P.PACK_BUDGET),
    ).otherwise(seq_first)
    return placed.select(
        "doc_id", "lang", "stream_id", "n_tokens", "tok_start",
        seq_first.alias("seq_first"), seq_last.alias("seq_last"),
    )


# Third composition: the DSIR-era pipeline (Xie et al. 2023 as the
# selection mechanism) — dedup to canonical docs, fit the importance
# model ON the canonical corpus (target = the entropy-gated slice),
# Gumbel-top-k select, pack the selection into training sequences. This
# is the modern replacement for the quality-filter + mixture stages of
# e2e_corpus_build: selection pressure comes from distribution matching
# rather than hand-tuned score cuts. Every stage is an already-gated
# operator (d3, d6b, x9's model/score/cut, pk1); the oracle re-derives
# the whole chain in one statement.
DSIR_SELECT_K = 200

_ENTROPY_TGT = """
CASE WHEN round(-coalesce(list_sum(list_transform(
       list_sort(list_distinct(string_split(text, ''))),
       ch -> (CAST(len(list_filter(string_split(text, ''), x -> x = ch)) AS DOUBLE)
               / CAST(greatest(len(string_split(text, '')), 1) AS DOUBLE))
             * log2(CAST(len(list_filter(string_split(text, ''), x -> x = ch)) AS DOUBLE)
               / CAST(greatest(len(string_split(text, '')), 1) AS DOUBLE)))), 0.0), 6)
     >= 2.0 THEN 1 ELSE 0 END"""


@register(
    "e2e_corpus_build_d",
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
), canon AS (
  SELECT d.doc_id, d.text
  FROM documents d JOIN clusters c ON d.doc_id = c.doc_id
  WHERE c.doc_id = c.cluster_id
), lab AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks,
         {_ENTROPY_TGT} AS tgt
  FROM canon
), grams AS (
  SELECT doc_id, tgt, unnest(toks) AS g FROM lab
  UNION ALL
  SELECT doc_id, tgt,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS g
  FROM lab WHERE len(toks) >= 2
), tb AS (
  SELECT doc_id, tgt,
         CAST(('0x' || substr(md5(g), 1, 8))::BIGINT % 64 AS INTEGER) AS bucket,
         count(*) AS cnt
  FROM grams GROUP BY 1, 2, 3
), spine AS (SELECT CAST(unnest(range(0, 64)) AS INTEGER) AS bucket),
bt AS (
  SELECT s.bucket,
         coalesce(sum(tb.cnt), 0) AS raw_cnt,
         coalesce(sum(CASE WHEN tb.tgt = 1 THEN tb.cnt END), 0) AS tgt_cnt
  FROM spine s LEFT JOIN tb USING (bucket) GROUP BY 1
), tot AS (
  SELECT CAST(sum(raw_cnt) AS DOUBLE) AS rtot,
         CAST(sum(tgt_cnt) AS DOUBLE) AS ttot
  FROM bt
), lam AS (
  SELECT bucket,
         CAST(round((ln((tgt_cnt + 1.0) / (ttot + 64.0))
                     - ln((raw_cnt + 1.0) / (rtot + 64.0))) * 1e6) AS BIGINT)
           AS lam_micro
  FROM bt, tot
), sc AS (
  SELECT lab.doc_id, CAST(coalesce(s.score_micro, 0) AS BIGINT) AS score_micro
  FROM lab LEFT JOIN (
    SELECT tb.doc_id, sum(tb.cnt * lam.lam_micro) AS score_micro
    FROM tb JOIN lam USING (bucket) GROUP BY 1
  ) s USING (doc_id)
), sel AS (
  SELECT doc_id, score_micro
  FROM (
    SELECT doc_id, score_micro,
           score_micro + CAST(round(-ln(-ln(
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
             / 4294967296.0)) * 1e6) AS BIGINT) AS key_micro
    FROM sc
  ) ORDER BY key_micro DESC, doc_id LIMIT {DSIR_SELECT_K}
), tk AS (
  SELECT c.doc_id, s.score_micro,
         CAST(len({_SQL_TOKENS.format(col='c.text')}) AS BIGINT) AS n_tokens
  FROM canon c JOIN sel s ON c.doc_id = s.doc_id
), placed AS (
  SELECT doc_id, score_micro, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
              AS BIGINT) AS tok_start
  FROM tk
)
SELECT doc_id, score_micro, n_tokens, tok_start,
       tok_start // {P.PACK_BUDGET} AS seq_first,
       CASE WHEN n_tokens > 0 THEN (tok_start + n_tokens - 1) // {P.PACK_BUDGET}
            ELSE tok_start // {P.PACK_BUDGET} END AS seq_last
FROM placed
""",
)
def e2e_corpus_build_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-era corpus materialization: LSH dedup -> star-CC canonical ->
    DSIR importance resampling (model fit ON the deduped corpus, Gumbel
    top-{k} cut) -> 512-token sequence packing — selection by
    distribution matching instead of e2e_corpus_build's hand-tuned
    quality + mixture cuts. Every stage is an independently hash-gated
    operator (d3, d6b, x9, pk1); the composed oracle re-derives the
    whole chain, catching column-contract drift between the selection's
    integer micro-unit scores and the packer's token spine."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(docs, threshold=0.5, n=5)
    clusters = D.neardup_clusters_star(docs, pairs)
    canonical = docs.join(
        clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id"),
        "doc_id",
    )
    sel = S.dsir_select(canonical, k=DSIR_SELECT_K)
    corpus = canonical.join(sel.select("doc_id"), "doc_id")
    packed = P.packed_sequences(corpus)
    return packed.join(sel.select("doc_id", "score_micro"), "doc_id").select(
        "doc_id", "score_micro", "n_tokens", "tok_start", "seq_first", "seq_last"
    )


# Fourth composition: the C4/RefinedWeb-recipe pipeline over the round-9
# sub-document operators — line-level (here: 32-token-window) exact dedup
# with reassembly, then the char-entropy quality gate at the corpus
# median, then sequence packing. The scrub REWRITES text before packing,
# so the token spine is computed over scrubbed lengths — exactly the
# composition bug class (stage A mutates what stage B measures) this
# gate exists to catch.
ENTROPY_KEEP_BITS = 4.1


@register(
    "e2e_corpus_build_p",
    oracle=f"""
WITH tkz AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
  FROM documents
),
n AS (SELECT doc_id, ts, len(ts) AS L FROM tkz),
p AS (
  SELECT doc_id, CAST(ci AS INT) AS pidx,
         array_to_string(ts[CAST(ci * 32 + 1 AS BIGINT) : CAST(ci * 32 + 32 AS BIGINT)], ' ') AS ptext
  FROM (SELECT doc_id, ts,
               unnest(range(0, greatest(CAST(floor((L - 32 + 31) / 32) AS BIGINT), 0) + 1)) AS ci
        FROM n WHERE L > 0)
),
k AS (
  SELECT doc_id, pidx, ptext,
         row_number() OVER (PARTITION BY ptext ORDER BY doc_id, pidx) AS rn
  FROM p
),
reb AS (
  SELECT doc_id, string_agg(ptext, ' ' ORDER BY pidx) AS text_clean
  FROM k WHERE rn = 1 GROUP BY doc_id
),
scrub AS (
  SELECT d.doc_id, coalesce(reb.text_clean, '') AS text
  FROM documents d LEFT JOIN reb USING (doc_id)
),
kept AS (
  SELECT doc_id, text FROM scrub
  WHERE round(-coalesce(list_sum(list_transform(
          list_sort(list_distinct(string_split(text, ''))),
          ch -> (CAST(len(list_filter(string_split(text, ''), x -> x = ch)) AS DOUBLE)
                  / CAST(greatest(len(string_split(text, '')), 1) AS DOUBLE))
                * log2(CAST(len(list_filter(string_split(text, ''), x -> x = ch)) AS DOUBLE)
                  / CAST(greatest(len(string_split(text, '')), 1) AS DOUBLE)))), 0.0), 6)
        >= {ENTROPY_KEEP_BITS}
),
tk AS (
  SELECT doc_id,
         CAST(len({_SQL_TOKENS.format(col='text')}) AS BIGINT) AS n_tokens
  FROM kept
),
placed AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
              AS BIGINT) AS tok_start
  FROM tk
)
SELECT doc_id, n_tokens, tok_start,
       tok_start // {P.PACK_BUDGET} AS seq_first,
       CASE WHEN n_tokens > 0 THEN (tok_start + n_tokens - 1) // {P.PACK_BUDGET}
            ELSE tok_start // {P.PACK_BUDGET} END AS seq_last
FROM placed
""",
)
def e2e_corpus_build_p(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document-era corpus materialization (the C4/RefinedWeb
    recipe, round 9): d17 paragraph-granularity exact dedup REWRITES
    every document (first-occurrence-wins over 32-token windows,
    reading-order reassembly), the t17 char-entropy gate at the corpus
    median (4.1 bits — fully-scrubbed empty docs drop here) filters the
    scrubbed text, and pk1's packer lays the survivors into 512-token
    sequences. The token spine is computed over SCRUBBED lengths —
    stage A mutates exactly what stage C measures, the composition bug
    class per-stage gates can't see. Each stage is an independently
    hash-gated operator (d17, t17, pk1); the oracle re-derives the
    whole chain in one statement."""
    docs = load(spark, sf_dir, "documents")
    scrubbed = D.paragraph_dedup(docs, size=32).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    kept = (
        T.char_entropy_frame(scrubbed)
        .filter(F.round(F.col("char_entropy_bits"), 6) >= ENTROPY_KEEP_BITS)
        .select("doc_id", "text")
    )
    return P.packed_sequences(kept).select(
        "doc_id", "n_tokens", "tok_start", "seq_first", "seq_last"
    )


# Fifth composition: the Dolma-recipe pipeline — BOTH dedup grains in
# one build, the shape real corpus builds (Dolma, RefinedWeb) actually
# run: fuzzy sub-document scrub first (d18 — lightly edited boilerplate
# paragraphs dedup where exact matching misses), then DOC-level near-dup
# dedup over the SCRUBBED text with the keep-longest canonical rule
# (d3 funnel -> star CC -> d13's argmax), then the t17 entropy gate,
# then pk1 sequence packing. Stage 1 rewrites what stages 2-4 measure
# (cluster membership, canonical lengths, the token spine), so this gate
# catches three distinct stage-coupling bug classes at once.


@register(
    "e2e_corpus_build_g",
    oracle=f"""
WITH RECURSIVE tkz AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
  FROM documents
),
nn AS (SELECT doc_id, ts, len(ts) AS L FROM tkz),
p AS (
  SELECT doc_id, CAST(ci AS INT) AS pidx,
         array_to_string(ts[CAST(ci * 32 + 1 AS BIGINT) : CAST(ci * 32 + 32 AS BIGINT)], ' ') AS ptext
  FROM (SELECT doc_id, ts,
               unnest(range(0, greatest(CAST(floor((L - 32 + 31) / 32) AS BIGINT), 0) + 1)) AS ci
        FROM nn WHERE L > 0)
),
w AS (
  SELECT doc_id, pidx, ptext,
         CAST(doc_id * 1048576 + pidx AS BIGINT) AS wid
  FROM p
),
wsh AS (
  SELECT DISTINCT wid, s FROM (
    SELECT wid,
           unnest(list_transform(range(1, greatest(len(ptext) - 3, 1)),
                                 i -> substr(ptext, CAST(i AS INT), 5))) AS s
    FROM w)
),
wsz AS (SELECT wid, count(*) AS n FROM wsh GROUP BY wid),
winter AS (
  SELECT a.wid AS wa, b.wid AS wb, count(*) AS i
  FROM wsh a JOIN wsh b ON a.s = b.s AND a.wid < b.wid
  GROUP BY 1, 2
),
wprs AS (
  SELECT wa, wb
  FROM winter
  JOIN wsz sa ON wa = sa.wid
  JOIN wsz sb ON wb = sb.wid
  WHERE i / (sa.n + sb.n - i) >= 0.5
),
wedges AS (
  SELECT wa AS src, wb AS dst FROM wprs
  UNION ALL
  SELECT wb, wa FROM wprs
),
wreach(node, lab) AS (
  SELECT wid, wid FROM w
  UNION
  SELECT e.src, r.lab FROM wedges e JOIN wreach r ON r.node = e.dst
),
wlabs AS (SELECT node AS wid, min(lab) AS cl FROM wreach GROUP BY node),
wkept AS (
  SELECT w.doc_id, w.pidx, w.ptext
  FROM w JOIN wlabs USING (wid) WHERE w.wid = wlabs.cl
),
reb AS (
  SELECT doc_id, string_agg(ptext, ' ' ORDER BY pidx) AS text_clean
  FROM wkept GROUP BY doc_id
),
scrub AS (
  SELECT d.doc_id, coalesce(reb.text_clean, '') AS text
  FROM documents d LEFT JOIN reb USING (doc_id)
),
dsh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(text) - 3, 1)),
                                 i -> substr(text, CAST(i AS INT), 5))) AS s
    FROM scrub)
),
dsz AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
dinter AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
  FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dpairs AS (
  SELECT doc_id_a, doc_id_b
  FROM dinter
  JOIN dsz sa ON doc_id_a = sa.doc_id
  JOIN dsz sb ON doc_id_b = sb.doc_id
  WHERE i / (sa.n + sb.n - i) >= 0.5
),
dedges AS (
  SELECT doc_id_a AS src, doc_id_b AS dst FROM dpairs
  UNION ALL
  SELECT doc_id_b, doc_id_a FROM dpairs
),
dreach(node, lab) AS (
  SELECT doc_id, doc_id FROM scrub
  UNION
  SELECT e.src, r.lab FROM dedges e JOIN dreach r ON r.node = e.dst
),
dclusters AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM dreach GROUP BY node),
canon AS (
  SELECT doc_id, text FROM (
    SELECT s.doc_id, s.text,
           row_number() OVER (PARTITION BY c.cluster_id
                              ORDER BY len(s.text) DESC, s.doc_id) AS rn
    FROM scrub s JOIN dclusters c USING (doc_id)
  ) WHERE rn = 1
),
kept AS (
  SELECT doc_id, text FROM canon
  WHERE round(-coalesce(list_sum(list_transform(
          list_sort(list_distinct(string_split(text, ''))),
          ch -> (CAST(len(list_filter(string_split(text, ''), x -> x = ch)) AS DOUBLE)
                  / CAST(greatest(len(string_split(text, '')), 1) AS DOUBLE))
                * log2(CAST(len(list_filter(string_split(text, ''), x -> x = ch)) AS DOUBLE)
                  / CAST(greatest(len(string_split(text, '')), 1) AS DOUBLE)))), 0.0), 6)
        >= {ENTROPY_KEEP_BITS}
),
tk AS (
  SELECT doc_id,
         CAST(len({_SQL_TOKENS.format(col='text')}) AS BIGINT) AS n_tokens
  FROM kept
),
placed AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
              AS BIGINT) AS tok_start
  FROM tk
)
SELECT doc_id, n_tokens, tok_start,
       tok_start // {P.PACK_BUDGET} AS seq_first,
       CASE WHEN n_tokens > 0 THEN (tok_start + n_tokens - 1) // {P.PACK_BUDGET}
            ELSE tok_start // {P.PACK_BUDGET} END AS seq_last
FROM placed
""",
)
def e2e_corpus_build_g(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dolma-recipe corpus materialization (r09 verdict task 7) — BOTH
    dedup grains in one build, the combination real corpus builds run:
    d18's fuzzy paragraph scrub rewrites every document (near-dup
    32-token windows at exact-verified J >= 0.5, star-CC closure,
    first-occurrence-wins, reading-order reassembly), then DOC-level
    near-dup dedup runs OVER THE SCRUBBED TEXT (d3's funnel + star CC)
    with d13's keep-longest canonical rule (char length of the
    SCRUBBED text, ties -> smaller id), the t17 char-entropy gate at
    4.1 bits drops fully-scrubbed and low-entropy survivors, and pk1's
    packer lays the rest into 512-token sequences. Stage 1 mutates
    what every later stage measures — cluster membership (scrubbed
    shingles), canonical choice (scrubbed lengths), and the token
    spine — so this one hash gate covers three stage-coupling bug
    classes no per-stage gate can see. Every stage is an independently
    hash-gated operator (d18, d3, d6b, d13, t17, pk1); the oracle
    re-derives the entire chain in one statement with two recursive
    closures (window grain, then doc grain)."""
    docs = load(spark, sf_dir, "documents")
    scrubbed = D.paragraph_neardup_dedup(docs, size=32).select(
        "doc_id", F.col("text_clean").alias("text")
    ).persist()  # r10: four consumers (funnel, CC labels, keep-longest,
    # canon join) — unpersisted, the whole scrub stage re-executed per
    # consumer (the d12 lesson; for the d18-based sibling that is a full
    # fuzzy-dedup re-run each time)
    pairs = D.minhash_lsh_dedup(scrubbed, threshold=0.5, n=5)
    clusters = D.neardup_clusters_star(scrubbed, pairs)
    canon = scrubbed.join(
        D.keep_longest_per_cluster(scrubbed, clusters)
        .select(F.col("kept_doc_id").alias("doc_id")),
        "doc_id",
    )
    kept = (
        T.char_entropy_frame(canon)
        .filter(F.round(F.col("char_entropy_bits"), 6) >= ENTROPY_KEEP_BITS)
        .select("doc_id", "text")
    )
    return P.packed_sequences(kept).select(
        "doc_id", "n_tokens", "tok_start", "seq_first", "seq_last"
    )


# Sixth composition: the RefinedWeb-recipe pipeline — scrub-ALL template
# windows first (d19: a 32-token paragraph in >1 distinct doc is noise,
# no canonical survivor — RefinedWeb's corpus-wide line dedup), then
# DOC-level near-dup dedup over the scrubbed text with the keep-longest
# canonical rule, then the t17 entropy gate, then pk1 packing. Differs
# from the Dolma build (_g) in stage 1's keep rule: _g keeps one fuzzy
# canonical window per near-dup cluster; _r deletes every cross-doc
# repeat outright — the two stage-1 philosophies real pipelines choose
# between, both now gated end-to-end.


@register(
    "e2e_corpus_build_r",
    oracle=f"""
WITH RECURSIVE tkz AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
  FROM documents
),
nn AS (SELECT doc_id, ts, len(ts) AS L FROM tkz),
p AS (
  SELECT doc_id, CAST(ci AS INT) AS pidx,
         array_to_string(ts[CAST(ci * 32 + 1 AS BIGINT) : CAST(ci * 32 + 32 AS BIGINT)], ' ') AS ptext
  FROM (SELECT doc_id, ts,
               unnest(range(0, greatest(CAST(floor((L - 32 + 31) / 32) AS BIGINT), 0) + 1)) AS ci
        FROM nn WHERE L > 0)
),
freq AS (
  SELECT ptext FROM p GROUP BY ptext HAVING count(DISTINCT doc_id) > 1
),
k AS (SELECT doc_id, pidx, ptext FROM p ANTI JOIN freq USING (ptext)),
reb AS (
  SELECT doc_id, string_agg(ptext, ' ' ORDER BY pidx) AS text_clean
  FROM k GROUP BY doc_id
),
scrub AS (
  SELECT d.doc_id, coalesce(reb.text_clean, '') AS text
  FROM documents d LEFT JOIN reb USING (doc_id)
),
dsh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(text) - 3, 1)),
                                 i -> substr(text, CAST(i AS INT), 5))) AS s
    FROM scrub)
),
dsz AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
dinter AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
  FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dpairs AS (
  SELECT doc_id_a, doc_id_b
  FROM dinter
  JOIN dsz sa ON doc_id_a = sa.doc_id
  JOIN dsz sb ON doc_id_b = sb.doc_id
  WHERE i / (sa.n + sb.n - i) >= 0.5
),
dedges AS (
  SELECT doc_id_a AS src, doc_id_b AS dst FROM dpairs
  UNION ALL
  SELECT doc_id_b, doc_id_a FROM dpairs
),
dreach(node, lab) AS (
  SELECT doc_id, doc_id FROM scrub
  UNION
  SELECT e.src, r.lab FROM dedges e JOIN dreach r ON r.node = e.dst
),
dclusters AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM dreach GROUP BY node),
canon AS (
  SELECT doc_id, text FROM (
    SELECT s.doc_id, s.text,
           row_number() OVER (PARTITION BY c.cluster_id
                              ORDER BY len(s.text) DESC, s.doc_id) AS rn
    FROM scrub s JOIN dclusters c USING (doc_id)
  ) WHERE rn = 1
),
kept AS (
  SELECT doc_id, text FROM canon
  WHERE round(-coalesce(list_sum(list_transform(
          list_sort(list_distinct(string_split(text, ''))),
          ch -> (CAST(len(list_filter(string_split(text, ''), x -> x = ch)) AS DOUBLE)
                  / CAST(greatest(len(string_split(text, '')), 1) AS DOUBLE))
                * log2(CAST(len(list_filter(string_split(text, ''), x -> x = ch)) AS DOUBLE)
                  / CAST(greatest(len(string_split(text, '')), 1) AS DOUBLE)))), 0.0), 6)
        >= {ENTROPY_KEEP_BITS}
),
tk AS (
  SELECT doc_id,
         CAST(len({_SQL_TOKENS.format(col='text')}) AS BIGINT) AS n_tokens
  FROM kept
),
placed AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
              AS BIGINT) AS tok_start
  FROM tk
)
SELECT doc_id, n_tokens, tok_start,
       tok_start // {P.PACK_BUDGET} AS seq_first,
       CASE WHEN n_tokens > 0 THEN (tok_start + n_tokens - 1) // {P.PACK_BUDGET}
            ELSE tok_start // {P.PACK_BUDGET} END AS seq_last
FROM placed
""",
)
def e2e_corpus_build_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-recipe corpus materialization (r10): d19's
    corpus-frequency boilerplate scrub rewrites every document (EVERY
    occurrence of a cross-doc repeated 32-token window deleted — no
    canonical survivor), then doc-level near-dup dedup runs over the
    scrubbed text (d3's funnel + d6b star CC) with d13's keep-longest
    canonical rule, the t17 char-entropy gate drops fully-scrubbed and
    low-entropy survivors, and pk1 packs the rest into 512-token
    sequences. Stage 1's deletions mutate cluster membership, canonical
    choice, AND the token spine — the stage-coupling bug class only an
    end-to-end gate sees. Every stage is an independently hash-gated
    operator (d19, d3, d6b, d13, t17, pk1); the oracle re-derives the
    chain in one statement with one recursive doc-grain closure."""
    docs = load(spark, sf_dir, "documents")
    scrubbed = D.boilerplate_scrub(docs, size=32, max_doc_freq=1).select(
        "doc_id", F.col("text_clean").alias("text")
    ).persist()  # r10: four consumers (funnel, CC labels, keep-longest,
    # canon join) — unpersisted, the whole scrub stage re-executed per
    # consumer (the d12 lesson; for the d18-based sibling that is a full
    # fuzzy-dedup re-run each time)
    pairs = D.minhash_lsh_dedup(scrubbed, threshold=0.5, n=5)
    clusters = D.neardup_clusters_star(scrubbed, pairs)
    canon = scrubbed.join(
        D.keep_longest_per_cluster(scrubbed, clusters)
        .select(F.col("kept_doc_id").alias("doc_id")),
        "doc_id",
    )
    kept = (
        T.char_entropy_frame(canon)
        .filter(F.round(F.col("char_entropy_bits"), 6) >= ENTROPY_KEEP_BITS)
        .select("doc_id", "text")
    )
    return P.packed_sequences(kept).select(
        "doc_id", "n_tokens", "tok_start", "seq_first", "seq_last"
    )
