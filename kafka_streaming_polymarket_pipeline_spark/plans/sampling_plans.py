"""Deterministic split / stratified-sampling queries over documents.

Training-data ops beyond the reference surface (it has no corpus tooling);
both are keyed on an engine-portable md5 sampling key so the DuckDB oracle
reproduces every assignment exactly — no rand(), no seed-dependent engine
RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import sampling as S
from kafka_streaming_polymarket_pipeline_spark.plans.registry import register
from kafka_streaming_polymarket_pipeline_spark.tables import load

_KEY = "md5(concat_ws(':', lang, CAST(doc_id AS VARCHAR)))"
_BUCKET = f"('0x' || substr({_KEY}, 1, 8))::BIGINT % 100"


@register(
    "x1_hash_split",
    oracle=f"""
SELECT doc_id, lang,
       CASE WHEN {_BUCKET} < 80 THEN 'train'
            WHEN {_BUCKET} < 90 THEN 'validation'
            ELSE 'test' END AS split
FROM documents
""",
)
def x1_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/validation/test split, stratified-salted
    (hash of lang:doc_id) — map-only, reproducible across runs and engines."""
    return S.hash_split(load(spark, sf_dir, "documents"))


@register(
    "x2_stratified_sample",
    oracle=f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY {_KEY}, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
) WHERE rn <= CAST(ceil(0.1 * n) AS BIGINT)
""",
)
def x2_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly ceil(10% * n) docs per language, chosen by sampling-key order
    — deterministic stratified sampling with exact per-stratum counts."""
    return S.stratified_exact_sample(load(spark, sf_dir, "documents"), fraction=0.1)


# Data-mixture weights: the multilingual up/down-weighting step (keep all
# en, half es/fr, a quarter de, a tenth of anything else).
MIX_RATES = {"en": 1.0, "es": 0.5, "fr": 0.5, "de": 0.25}
MIX_DEFAULT = 0.1


@register(
    "x3_mixture_sample",
    oracle=f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         CASE lang WHEN 'en' THEN 1.0 WHEN 'es' THEN 0.5
                   WHEN 'fr' THEN 0.5 WHEN 'de' THEN 0.25
                   ELSE 0.1 END AS r,
         row_number() OVER (PARTITION BY lang ORDER BY {_KEY}, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
) WHERE rn <= CAST(ceil(r * n) AS BIGINT)
""",
)
def x3_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: per-language keep rates (LLM data
    mixing), exact per-stratum counts, engine-portable hash order."""
    return S.mixture_sample(
        load(spark, sf_dir, "documents"), rates=MIX_RATES, default_rate=MIX_DEFAULT
    )


@register(
    "x4_temperature_weights",
    oracle="""
WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c),
z AS (SELECT sum(pow(n_docs * 1.0 / total, 0.3)) AS z FROM c CROSS JOIN t)
SELECT lang, n_docs,
       round(n_docs * 1.0 / total, 6) AS p,
       round(pow(n_docs * 1.0 / total, 0.3) / z, 6) AS weight,
       round((pow(n_docs * 1.0 / total, 0.3) / z) / (n_docs * 1.0 / total), 6) AS boost
FROM c CROSS JOIN t CROSS JOIN z
""",
)
def x4_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language sampling weights (alpha=0.3, the
    mT5/XLM-R exponent): w_d = p_d^alpha / sum(p^alpha). Upweights tail
    languages, downweights the head; `boost` = w/p is the per-language
    repetition factor a sampler applies. Scale shape: one groupBy(lang)
    count, then two single-row aggregates broadcast back — no per-doc
    work beyond the count, so it costs one narrow shuffle at any corpus
    size."""
    alpha = 0.3
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("total"))
    with_p = counts.crossJoin(F.broadcast(total)).withColumn(
        "p_raw", F.col("n_docs") / F.col("total")
    ).withColumn("pa", F.pow("p_raw", F.lit(alpha)))
    zf = with_p.agg(F.sum("pa").alias("z"))
    return (
        with_p.crossJoin(F.broadcast(zf))
        .select(
            "lang",
            "n_docs",
            F.round("p_raw", 6).alias("p"),
            F.round(F.col("pa") / F.col("z"), 6).alias("weight"),
            F.round((F.col("pa") / F.col("z")) / F.col("p_raw"), 6).alias("boost"),
        )
    )


_U01 = (
    "(('0x' || substr(md5(concat_ws(':', d.lang, CAST(d.doc_id AS VARCHAR))), 1, 8))"
    "::BIGINT / 4294967296.0)"
)


@register(
    "x5_temperature_repeats",
    oracle=f"""
WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c),
z AS (SELECT sum(pow(n_docs * 1.0 / total, 0.3)) AS z FROM c CROSS JOIN t),
w AS (
  SELECT lang,
         (pow(n_docs * 1.0 / total, 0.3) / z) / (n_docs * 1.0 / total) AS boost
  FROM c CROSS JOIN t CROSS JOIN z
)
SELECT doc_id, d.lang,
       CAST(floor(boost) + CASE WHEN boost - floor(boost) > {_U01} THEN 1 ELSE 0 END
            AS BIGINT) AS n_repeats
FROM documents d JOIN w ON w.lang = d.lang
""",
)
def x5_temperature_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materializes x4's temperature weights into per-document repeat
    counts: n = floor(boost) + Bernoulli(frac(boost)) with the Bernoulli
    draw taken from the same engine-portable md5 sampling key x1-x3 use
    (no rand()), so expected corpus share matches the temperature
    distribution and the draw reproduces across engines and runs. The
    weight table is O(languages) and broadcast; the per-doc work is
    map-only."""
    alpha = 0.3
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("total"))
    w = (
        counts.crossJoin(F.broadcast(total))
        .withColumn("p_raw", F.col("n_docs") / F.col("total"))
        .withColumn("pa", F.pow("p_raw", F.lit(alpha)))
    )
    zf = w.agg(F.sum("pa").alias("z"))
    boosts = w.crossJoin(F.broadcast(zf)).select(
        "lang", ((F.col("pa") / F.col("z")) / F.col("p_raw")).alias("boost")
    )
    key = F.md5(F.concat_ws(":", F.col("lang"), F.col("doc_id").cast("string")))
    u01 = F.conv(F.substring(key, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)
    return (
        docs.join(F.broadcast(boosts), "lang")
        .select(
            "doc_id",
            "lang",
            (
                F.floor("boost")
                + F.when(F.col("boost") - F.floor("boost") > u01, 1).otherwise(0)
            ).cast("long").alias("n_repeats"),
        )
    )


@register(
    "x6_unimax_budget",
    oracle="""
WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_langs FROM c),
b AS (SELECT CAST(floor(total * 8 / 10) AS BIGINT) AS budget, n_langs FROM t),
r AS (
  SELECT lang, n_docs,
         row_number() OVER (ORDER BY n_docs, lang) AS rk,
         COALESCE(CAST(sum(n_docs) OVER (
           ORDER BY n_docs, lang ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS BIGINT), 0) AS cum_prev
  FROM c
),
f AS (
  SELECT r.lang, r.n_docs, r.rk, r.cum_prev, b.budget, b.n_langs,
         (r.n_docs * (b.n_langs - r.rk + 1) <= b.budget - r.cum_prev) AS capped
  FROM r CROSS JOIN b
),
m AS (
  SELECT COALESCE(CAST(count(*) FILTER (WHERE capped) AS BIGINT), 0) AS m,
         COALESCE(CAST(sum(n_docs) FILTER (WHERE capped) AS BIGINT), 0) AS cum_capped
  FROM f
)
SELECT lang, n_docs, capped,
       round(CASE WHEN capped THEN n_docs * 1.0
                  ELSE (budget - cum_capped) * 1.0 / (n_langs - m) END, 6) AS alloc_docs,
       round(CASE WHEN capped THEN 1.0
                  ELSE (budget - cum_capped) * 1.0 / (n_langs - m) / n_docs END, 6) AS epochs
FROM f CROSS JOIN m
""",
)
def x6_unimax_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023): spread a
    total document budget (0.8x corpus size here) as uniformly as
    possible across languages, capping each language at 1 epoch of its
    own data. The greedy smallest-language-first allocation equals exact
    water-filling, and the cap decision is INTEGER arithmetic
    (n*(langs_remaining) <= budget - cum_prev), so the split point is
    engine-exact; only the final fill level divides. The budget-capped
    alternative to x4/x5's temperature sampling: head languages get the
    leftover fill level, tail languages their full epoch.

    Scale shape: one groupBy(lang) count; the ranking window runs over
    O(#languages) rows (bounded by construction, like x4's normalizer);
    everything else is one-row broadcast aggregates. Not all languages
    can cap (caps sum to 1.0x corpus > 0.8x budget), so the fill-level
    division is never 0/0."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    t = c.agg(F.sum("n_docs").alias("total"), F.count("*").alias("n_langs"))
    b = t.select(
        F.floor(F.col("total") * 8 / 10).cast("long").alias("budget"), "n_langs"
    )
    w = Window.orderBy("n_docs", "lang")
    r = c.withColumn("rk", F.row_number().over(w)).withColumn(
        "cum_prev",
        F.coalesce(
            F.sum("n_docs").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    f = r.crossJoin(F.broadcast(b)).withColumn(
        "capped",
        F.col("n_docs") * (F.col("n_langs") - F.col("rk") + 1)
        <= F.col("budget") - F.col("cum_prev"),
    )
    m = f.agg(
        F.sum(F.when(F.col("capped"), 1).otherwise(0)).alias("m"),
        F.sum(F.when(F.col("capped"), F.col("n_docs")).otherwise(0)).alias("cum_capped"),
    )
    fill = (F.col("budget") - F.col("cum_capped")) / (F.col("n_langs") - F.col("m"))
    return f.crossJoin(F.broadcast(m)).select(
        "lang",
        "n_docs",
        "capped",
        F.round(
            F.when(F.col("capped"), F.col("n_docs").cast("double")).otherwise(fill), 6
        ).alias("alloc_docs"),
        F.round(
            F.when(F.col("capped"), F.lit(1.0)).otherwise(fill / F.col("n_docs")), 6
        ).alias("epochs"),
    )


@register(
    "x12_repeat_capped_alloc",
    oracle="""
WITH c AS (
  SELECT lang,
         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_tok
  FROM documents GROUP BY lang
),
t AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total FROM c),
z AS (SELECT sum(pow(n_tok * 1.0 / total, 0.3)) AS z FROM c CROSS JOIN t),
w AS (
  SELECT lang, n_tok,
         CAST(round(1e6 * pow(n_tok * 1.0 / total, 0.3) / z, 0) AS BIGINT) AS w_micro,
         CAST(3 * total AS BIGINT) AS budget,
         CAST(4 * n_tok AS BIGINT) AS cap
  FROM c CROSS JOIN t CROSS JOIN z
),
wt AS (SELECT CAST(sum(w_micro) AS BIGINT) AS w_tot FROM w),
r AS (
  SELECT w.*, wt.w_tot,
         COALESCE(CAST(sum(cap) OVER (ORDER BY cap * 1.0 / w_micro, lang
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_cap,
         COALESCE(CAST(sum(w_micro) OVER (ORDER BY cap * 1.0 / w_micro, lang
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS w_prev
  FROM w CROSS JOIN wt
),
f AS (SELECT *, (cap * (w_tot - w_prev) <= (budget - cum_cap) * w_micro) AS capped FROM r),
m AS (
  SELECT COALESCE(CAST(sum(cap) FILTER (WHERE capped) AS BIGINT), 0) AS cap_sum,
         COALESCE(CAST(sum(w_micro) FILTER (WHERE capped) AS BIGINT), 0) AS w_cap
  FROM f
)
SELECT lang, n_tok, w_micro, capped,
       round(CASE WHEN capped THEN cap * 1.0
                  ELSE (budget - m.cap_sum) * 1.0 * w_micro / (w_tot - m.w_cap) END, 6) AS alloc_tok,
       round(CASE WHEN capped THEN 4.0
                  ELSE (budget - m.cap_sum) * 1.0 * w_micro / (w_tot - m.w_cap) / n_tok END, 6) AS epochs
FROM f CROSS JOIN m
""",
)
def x12_repeat_capped_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-capped proportional token-budget allocation — the
    data-constrained-scaling regime (Muennighoff et al. 2023): spend a
    3x-corpus token budget across languages proportionally to x4's
    temperature-softened weights (alpha=0.3), but cap every language at
    4 epochs of its own unique tokens (the paper's ~4-epoch
    value-of-repetition knee); the capped languages' excess demand
    redistributes to the uncapped ones by weighted water-filling. x6's
    complement: x6 fills UNIFORMLY toward 1 epoch under-budget, x12
    fills PROPORTIONALLY over-budget, which is where the repeat cap —
    not the budget split — binds on tail languages.

    Engine-exact discipline: the softened weight rounds ONCE to integer
    micro-units; the greedy cap decision (order by cap/weight, then
    cap_k * W_remaining <= (B - cum_caps) * w_k) is pure BIGINT
    cross-multiplication, so the capped set is exact on both engines;
    only the final fill level divides (rounded 6 dp). At the sf0.01
    gate the split is non-degenerate (2 capped / 3 water-filled).

    Scale shape: one groupBy(lang) token-count; the ordering window
    runs over O(#languages) rows; everything else is 1-row broadcast
    aggregates — one narrow shuffle at any corpus size."""
    from pyspark.sql import Window

    from kafka_streaming_polymarket_pipeline_spark.operators.text import tokens

    docs = load(spark, sf_dir, "documents")
    c = docs.select(
        "lang", F.size(tokens(F.col("text"))).cast("long").alias("_nt")
    ).groupBy("lang").agg(F.sum("_nt").alias("n_tok"))
    t = c.agg(F.sum("n_tok").alias("total"))
    withp = c.crossJoin(F.broadcast(t)).withColumn(
        "pa", F.pow(F.col("n_tok") / F.col("total"), F.lit(0.3))
    )
    z = withp.agg(F.sum("pa").alias("z"))
    w = (
        withp.crossJoin(F.broadcast(z))
        .select(
            "lang", "n_tok",
            F.round(F.lit(1e6) * F.col("pa") / F.col("z"), 0).cast("long").alias("w_micro"),
            (F.lit(3) * F.col("total")).cast("long").alias("budget"),
            (F.lit(4) * F.col("n_tok")).cast("long").alias("cap"),
        )
    )
    wt = w.agg(F.sum("w_micro").alias("w_tot"))
    ordw = Window.orderBy(F.col("cap") / F.col("w_micro"), "lang")
    r = (
        w.crossJoin(F.broadcast(wt))
        .withColumn(
            "cum_cap",
            F.coalesce(
                F.sum("cap").over(ordw.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn(
            "w_prev",
            F.coalesce(
                F.sum("w_micro").over(ordw.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("long"),
        )
    )
    f = r.withColumn(
        "capped",
        F.col("cap") * (F.col("w_tot") - F.col("w_prev"))
        <= (F.col("budget") - F.col("cum_cap")) * F.col("w_micro"),
    )
    m = f.agg(
        F.coalesce(F.sum(F.when(F.col("capped"), F.col("cap"))), F.lit(0)).alias("cap_sum"),
        F.coalesce(F.sum(F.when(F.col("capped"), F.col("w_micro"))), F.lit(0)).alias("w_cap"),
    )
    fill = (
        (F.col("budget") - F.col("cap_sum"))
        * F.col("w_micro")
        / (F.col("w_tot") - F.col("w_cap"))
    )
    return f.crossJoin(F.broadcast(m)).select(
        "lang", "n_tok", "w_micro", "capped",
        F.round(
            F.when(F.col("capped"), F.col("cap").cast("double")).otherwise(fill), 6
        ).alias("alloc_tok"),
        F.round(
            F.when(F.col("capped"), F.lit(4.0)).otherwise(fill / F.col("n_tok")), 6
        ).alias("epochs"),
    )


@register(
    "x7_group_split",
    oracle="""
SELECT doc_id, source,
       CASE WHEN b < 80 THEN 'train'
            WHEN b < 90 THEN 'validation'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, source,
         ('0x' || substr(md5(source), 1, 8))::BIGINT % 100 AS b
  FROM documents
)
""",
)
def x7_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe GROUP split: the bucket hashes only the source key, so
    every doc from one provenance group lands in the same split and
    shared-boilerplate near-dups cannot straddle train/test (the
    GroupShuffleSplit contract). Map-only at any corpus size."""
    return S.group_split(load(spark, sf_dir, "documents"))


@register(
    "x8_weighted_sample",
    oracle="""
SELECT doc_id, weight, sample_key FROM (
  SELECT doc_id,
         greatest(n_chars, 1) AS weight,
         round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1.0)
                  / 4294967296.0) / greatest(n_chars, 1), 9) AS sample_key,
         row_number() OVER (
           ORDER BY round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1.0)
                            / 4294967296.0) / greatest(n_chars, 1), 9) DESC,
                    doc_id) AS rn
  FROM documents
) WHERE rn <= 500
""",
)
def x8_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis 2006),
    length-weighted: key = ln(u)/w from a deterministic md5 uniform, keep
    the 500 largest. Compiles to TakeOrderedAndProject (per-partition
    heaps, k-row driver merge — no global sort); the 9-dp-rounded key +
    doc_id tie-break keeps the cut engine-exact."""
    docs = load(spark, sf_dir, "documents")
    return S.weighted_sample_topk(
        docs, k=500, weight_col=F.greatest(F.col("n_chars"), F.lit(1))
    )


@register(
    "x9_dsir_resample",
    oracle="""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks,
         string_split(text, '') AS chars
  FROM documents
),
lab AS (
  SELECT doc_id, toks,
         CASE WHEN round(-coalesce(list_sum(list_transform(
                list_sort(list_distinct(chars)),
                ch -> (CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE)
                        / CAST(greatest(len(chars), 1) AS DOUBLE))
                      * log2(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE)
                        / CAST(greatest(len(chars), 1) AS DOUBLE)))), 0.0), 6)
              >= 2.0 THEN 1 ELSE 0 END AS tgt
  FROM base
),
grams AS (
  SELECT doc_id, tgt, unnest(toks) AS g FROM lab
  UNION ALL
  SELECT doc_id, tgt,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS g
  FROM lab WHERE len(toks) >= 2
),
tb AS (
  SELECT doc_id, tgt,
         CAST(('0x' || substr(md5(g), 1, 8))::BIGINT % 64 AS INTEGER) AS bucket,
         count(*) AS cnt
  FROM grams GROUP BY 1, 2, 3
),
spine AS (SELECT CAST(unnest(range(0, 64)) AS INTEGER) AS bucket),
bt AS (
  SELECT s.bucket,
         coalesce(sum(tb.cnt), 0) AS raw_cnt,
         coalesce(sum(CASE WHEN tb.tgt = 1 THEN tb.cnt END), 0) AS tgt_cnt
  FROM spine s LEFT JOIN tb USING (bucket) GROUP BY 1
),
tot AS (
  SELECT CAST(sum(raw_cnt) AS DOUBLE) AS rtot,
         CAST(sum(tgt_cnt) AS DOUBLE) AS ttot
  FROM bt
),
lam AS (
  SELECT bucket,
         CAST(round((ln((tgt_cnt + 1.0) / (ttot + 64.0))
                     - ln((raw_cnt + 1.0) / (rtot + 64.0))) * 1e6) AS BIGINT)
           AS lam_micro
  FROM bt, tot
),
sc AS (
  SELECT lab.doc_id,
         CAST(coalesce(s.score_micro, 0) AS BIGINT) AS score_micro
  FROM lab LEFT JOIN (
    SELECT tb.doc_id, sum(tb.cnt * lam.lam_micro) AS score_micro
    FROM tb JOIN lam USING (bucket) GROUP BY 1
  ) s USING (doc_id)
),
keyed AS (
  SELECT doc_id, score_micro,
         score_micro + CAST(round(-ln(-ln(
           (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
           / 4294967296.0)) * 1e6) AS BIGINT) AS key_micro
  FROM sc
)
SELECT doc_id, score_micro, key_micro
FROM keyed
ORDER BY key_micro DESC, doc_id
LIMIT 100
""",
)
def x9_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): importance-resample 100 docs
    whose hashed unigram+bigram distribution best matches the
    entropy-gated target slice. Per-bucket log-ratios and per-doc Gumbel
    noise are rounded once to integer micro-units; the per-doc score,
    the key, and the top-k cut are exact BIGINT arithmetic — stronger
    than the 6-dp precedent. One gram explode + two <= 64-row broadcast
    model tables + TakeOrderedAndProject; nothing collects."""
    return S.dsir_select(load(spark, sf_dir, "documents"), k=100)


@register(
    "x9a_dsir_model_gate",
    oracle="""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks,
         string_split(text, '') AS chars
  FROM documents
),
lab AS (
  SELECT doc_id, toks,
         CASE WHEN round(-coalesce(list_sum(list_transform(
                list_sort(list_distinct(chars)),
                ch -> (CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE)
                        / CAST(greatest(len(chars), 1) AS DOUBLE))
                      * log2(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE)
                        / CAST(greatest(len(chars), 1) AS DOUBLE)))), 0.0), 6)
              >= 2.0 THEN 1 ELSE 0 END AS tgt
  FROM base
),
grams AS (
  SELECT doc_id, tgt, unnest(toks) AS g FROM lab
  UNION ALL
  SELECT doc_id, tgt,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS g
  FROM lab WHERE len(toks) >= 2
),
tb AS (
  SELECT doc_id, tgt,
         CAST(('0x' || substr(md5(g), 1, 8))::BIGINT % 64 AS INTEGER) AS bucket,
         count(*) AS cnt
  FROM grams GROUP BY 1, 2, 3
),
spine AS (SELECT CAST(unnest(range(0, 64)) AS INTEGER) AS bucket),
bt AS (
  SELECT s.bucket,
         coalesce(sum(tb.cnt), 0) AS raw_cnt,
         coalesce(sum(CASE WHEN tb.tgt = 1 THEN tb.cnt END), 0) AS tgt_cnt
  FROM spine s LEFT JOIN tb USING (bucket) GROUP BY 1
),
tot AS (
  SELECT CAST(sum(raw_cnt) AS DOUBLE) AS rtot,
         CAST(sum(tgt_cnt) AS DOUBLE) AS ttot
  FROM bt
)
SELECT bucket,
       CAST(round((ln((tgt_cnt + 1.0) / (ttot + 64.0))
                   - ln((raw_cnt + 1.0) / (rtot + 64.0))) * 1e6) AS BIGINT)
         AS lam_micro
FROM bt, tot
""",
)
def x9a_dsir_model_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR stage gate 1 of 2 (r09 verdict task 1a): the 64-row
    (bucket, lam_micro) importance model ALONE, so an official-gate
    divergence in x9 is localized to either the model fit or the keyed
    cut (x9b). Root cause of the r09 x9/e2e_d hash FAIL, found r10:
    NOT libm rounding — DuckDB's sum(BIGINT) returns HUGEINT, and the
    uncast score_micro/key_micro surfaced as int128/decimal through the
    official driver's fetch path, hash-mismatching Spark's int64 even
    on equal values (this sandbox's fetchall() coerces to Python int,
    which is why driver_sim passed). Both oracles now CAST to BIGINT;
    tests/test_oracle_types.py pins every oracle output to portable
    types. The rounding-margin audit (also added r10) separately shows
    every rounded value at the gate SFs sits >= 1.8e-3 micro-units from
    a .5 boundary — orders of magnitude beyond any libm ulp spread."""
    return S.dsir_model(load(spark, sf_dir, "documents"))


@register(
    "x9b_dsir_keys",
    oracle="""
SELECT doc_id,
       CAST(round(-ln(-ln(
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
         / 4294967296.0)) * 1e6) AS BIGINT) AS g_micro
FROM documents
""",
)
def x9b_dsir_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR stage gate 2 of 2 (r09 verdict task 1a): the per-doc Gumbel
    key in integer micro-units, a pure function of doc_id — if x9
    diverges while x9a (model) is green, this row pins whether the
    noise stage or the BIGINT composition is at fault. Map-only at any
    scale; see x9a's docstring for the r09 root cause."""
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", S.gumbel_micro("doc_id").alias("g_micro"))


@register(
    "x9c_dsir_lang_target",
    oracle="""
WITH lab AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt
  FROM documents
),
grams AS (
  SELECT doc_id, tgt, unnest(toks) AS g FROM lab
  UNION ALL
  SELECT doc_id, tgt,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS g
  FROM lab WHERE len(toks) >= 2
),
tb AS (
  SELECT doc_id, tgt,
         CAST(('0x' || substr(md5(g), 1, 8))::BIGINT % 64 AS INTEGER) AS bucket,
         count(*) AS cnt
  FROM grams GROUP BY 1, 2, 3
),
spine AS (SELECT CAST(unnest(range(0, 64)) AS INTEGER) AS bucket),
bt AS (
  SELECT s.bucket,
         coalesce(sum(tb.cnt), 0) AS raw_cnt,
         coalesce(sum(CASE WHEN tb.tgt = 1 THEN tb.cnt END), 0) AS tgt_cnt
  FROM spine s LEFT JOIN tb USING (bucket) GROUP BY 1
),
tot AS (
  SELECT CAST(sum(raw_cnt) AS DOUBLE) AS rtot,
         CAST(sum(tgt_cnt) AS DOUBLE) AS ttot
  FROM bt
),
lam AS (
  SELECT bucket,
         CAST(round((ln((tgt_cnt + 1.0) / (ttot + 64.0))
                     - ln((raw_cnt + 1.0) / (rtot + 64.0))) * 1e6) AS BIGINT)
           AS lam_micro
  FROM bt, tot
),
sc AS (
  SELECT lab.doc_id,
         CAST(coalesce(s.score_micro, 0) AS BIGINT) AS score_micro
  FROM lab LEFT JOIN (
    SELECT tb.doc_id, sum(tb.cnt * lam.lam_micro) AS score_micro
    FROM tb JOIN lam USING (bucket) GROUP BY 1
  ) s USING (doc_id)
),
keyed AS (
  SELECT doc_id, score_micro,
         score_micro + CAST(round(-ln(-ln(
           (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
           / 4294967296.0)) * 1e6) AS BIGINT) AS key_micro
  FROM sc
)
SELECT doc_id, score_micro, key_micro
FROM keyed
ORDER BY key_micro DESC, doc_id
LIMIT 100
""",
)
def x9c_dsir_lang_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR resampling against a NON-DEGENERATE target: the r10 margin
    audit found x9's char-entropy gate passes EVERY document at the
    gate SFs (min entropy 3.68 bits vs the 2.0 threshold), so tgt==raw
    in every bucket, every lam_micro is exactly 0, and x9's official
    row only ever exercises the Gumbel stage. This registration targets
    the lang='en' slice ("make the corpus look like the English
    slice"), whose model is 64/64 non-zero lams spanning ~±1.3e5
    micro-units (margin to any .5 rounding boundary >= 5.8e-3 at the
    gate SFs — five orders above libm ulp spread), so the model fit,
    the bigint score sum, AND the keyed cut are all hash-gated with
    real values. Same plan shape as x9; target is a row-local flag
    instead of the entropy pass."""
    docs = load(spark, sf_dir, "documents")
    return S.dsir_select(docs, k=100, target=F.col("lang") == "en")


@register(
    "x10_decontam_split",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(tk) - 7, 0) + 1),
                                 i -> array_to_string(tk[i:i+7], ' '))) AS g
    FROM toks)
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 3),
hits AS (
  SELECT DISTINCT gr.doc_id AS h_id
  FROM grams gr JOIN bench b ON gr.g = b.g
  WHERE gr.doc_id % 17 <> 3
)
SELECT d.doc_id AS doc_id, d.lang,
       h.h_id IS NOT NULL AS contaminated,
       CASE WHEN h.h_id IS NOT NULL THEN 'train'
            WHEN {_BUCKET} < 80 THEN 'train'
            WHEN {_BUCKET} < 90 THEN 'validation'
            ELSE 'test' END AS split
FROM documents d LEFT JOIN hits h ON d.doc_id = h.h_id
WHERE d.doc_id % 17 <> 3
""",
)
def x10_decontam_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-aware train/validation/test split — x1's
    deterministic hash split composed with t8's benchmark 8-gram
    collision scan: a document sharing ANY verbatim token 8-gram with
    the held-out benchmark set is FORCED into 'train' (its hash bucket
    notwithstanding), so evaluation splits can never echo benchmark
    content — the leakage direction x7's group split cannot see
    (provenance-clean docs can still quote the benchmark). Map-only
    split + one broadcast gram semi-join; no pairwise doc comparison
    ever forms. Benchmark = doc_id % 17 = 3 (t8's convention), excluded
    from the output entirely."""
    from kafka_streaming_polymarket_pipeline_spark.operators import text as T

    docs = load(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % 17 == 3
    bench_grams = (
        docs.filter(is_bench)
        .select(F.explode(T.token_ngrams(F.col("text"), 8)).alias("g"))
        .distinct()
    )
    train = docs.filter(~is_bench)
    hit_ids = (
        train.select("doc_id", F.explode(T.token_ngrams(F.col("text"), 8)).alias("g"))
        .join(F.broadcast(bench_grams), "g")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    base = S.hash_split(train).join(hit_ids, "doc_id", "left")
    return base.select(
        "doc_id",
        "lang",
        F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
        F.when(F.coalesce("contaminated", F.lit(False)), F.lit("train"))
        .otherwise(F.col("split"))
        .alias("split"),
    )
