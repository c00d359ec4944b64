"""Sketch queries: count-min heavy hitters (a15).

Unlike a13 (HLL, rows-only by mathematical necessity), the CMS here is
md5-bucketed and therefore FULLY hash-gated: the oracle rebuilds the
identical d x w counter table and probes it in SQL, pinning both the
estimates and the one-sided error (overestimate >= 0) per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streaming_polymarket_pipeline_spark.operators import sketch as SK
from kafka_streaming_polymarket_pipeline_spark.plans.registry import register
from kafka_streaming_polymarket_pipeline_spark.tables import load

_BUCKET_SQL = (
    "('0x' || substr(md5(concat_ws(':', CAST({seed} AS VARCHAR), "
    "CAST({key} AS VARCHAR))), 1, 8))::BIGINT % " + str(SK.CMS_WIDTH)
)


@register(
    "a15_cms_heavy_hitters",
    oracle=f"""
WITH seeds AS (SELECT unnest(range(0, {SK.CMS_DEPTH})) AS seed),
counters AS (
  SELECT s.seed, {_BUCKET_SQL.format(seed='s.seed', key='e.user_id')} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events e CROSS JOIN seeds s
  GROUP BY 1, 2
),
exact AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n FROM events GROUP BY user_id
),
topk AS (
  SELECT user_id, exact_n FROM exact ORDER BY exact_n DESC, user_id LIMIT 10
),
est AS (
  SELECT t.user_id, min(c.cnt) AS cms_est
  FROM topk t CROSS JOIN seeds s
  JOIN counters c
    ON c.seed = s.seed
   AND c.bucket = {_BUCKET_SQL.format(seed='s.seed', key='t.user_id')}
  GROUP BY t.user_id
)
SELECT t.user_id, t.exact_n, e.cms_est, e.cms_est - t.exact_n AS overestimate
FROM topk t JOIN est e USING (user_id)
""",
)
def a15_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the events user stream: exact top-10 users
    with CMS estimates and the per-row one-sided error, all hash-gated
    (md5 bucket hashing reproduced verbatim by the oracle)."""
    return SK.cms_heavy_hitters(load(spark, sf_dir, "events"), "user_id", k=10)


_GRAMS_SQL = """
toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(tk) - 7, 0) + 1),
                                 i -> array_to_string(tk[i:i+7], ' '))) AS g
    FROM toks)
)"""

_BPOS = (
    "('0x' || substr(md5(concat_ws(':', CAST({seed} AS VARCHAR), {g})), 1, 8))"
    "::BIGINT % " + str(SK.BLOOM_BITS)
)


@register(
    "a16_bloom_decontam",
    oracle=f"""
WITH {_GRAMS_SQL},
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 3),
bseeds AS (SELECT unnest(range(0, {SK.BLOOM_K})) AS seed),
bpos AS (
  SELECT h // 32 AS word, h % 32 AS bit FROM (
    SELECT {_BPOS.format(seed='s.seed', g='b.g')} AS h
    FROM bench b CROSS JOIN bseeds s)
),
bloom AS (SELECT word, bit_or(1::BIGINT << bit) AS bits FROM bpos GROUP BY word),
train AS (SELECT doc_id, g FROM grams WHERE doc_id % 17 <> 3),
probe AS (
  SELECT doc_id, g,
         min(CASE WHEN ((coalesce(bl.bits, 0) >> (p.h % 32)) & 1) = 1
                  THEN 1 ELSE 0 END) AS all_hit
  FROM (
    SELECT t.doc_id, t.g, {_BPOS.format(seed='s.seed', g='t.g')} AS h
    FROM train t CROSS JOIN bseeds s) p
  LEFT JOIN bloom bl ON bl.word = p.h // 32
  GROUP BY doc_id, g
),
perdoc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(all_hit) AS BIGINT) AS n_bloom_maybe
  FROM probe GROUP BY doc_id
),
exact AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_exact_hits
  FROM train t JOIN bench b ON t.g = b.g GROUP BY t.doc_id
)
SELECT d.doc_id,
       coalesce(p.n_grams, 0) AS n_grams,
       coalesce(p.n_bloom_maybe, 0) AS n_bloom_maybe,
       coalesce(e.n_exact_hits, 0) AS n_exact_hits
FROM documents d
LEFT JOIN perdoc p ON p.doc_id = d.doc_id
LEFT JOIN exact e ON e.doc_id = d.doc_id
WHERE d.doc_id % 17 <> 3
""",
)
def a16_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination: t8's exact benchmark-gram scan
    with the 100 TB shape made explicit — the benchmark gram set folds
    into a 4 KB broadcast bit array answering 'definitely clean'
    map-side; per doc: distinct grams, bloom maybes, exact hits. The
    oracle rebuilds the identical filter, so the Bloom guarantee
    (n_bloom_maybe >= n_exact_hits, no false negatives) is hash-gated
    row-by-row."""
    from pyspark.sql import functions as F

    from kafka_streaming_polymarket_pipeline_spark.operators import text as T
    from kafka_streaming_polymarket_pipeline_spark.tables import load as _load

    docs = _load(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % 17 == 3
    grams = docs.select(
        "doc_id", F.explode(T.token_ngrams(F.col("text"), 8)).alias("g")
    )
    bench = grams.filter(is_bench).select("g").distinct()
    train = grams.filter(~is_bench)

    bloom = SK.bloom_build(bench, "g")
    probed = SK.bloom_probe(train, bloom, "g")
    perdoc = probed.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sum(F.col("maybe").cast("long")).alias("n_bloom_maybe"),
    )
    exact = (
        train.join(bench, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_exact_hits"))
    )
    zero = F.lit(0).cast("long")
    return (
        docs.filter(~is_bench)
        .select("doc_id")
        .join(perdoc, "doc_id", "left")
        .join(exact, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", zero).alias("n_grams"),
            F.coalesce("n_bloom_maybe", zero).alias("n_bloom_maybe"),
            F.coalesce("n_exact_hits", zero).alias("n_exact_hits"),
        )
    )


_HLL_ALPHA = repr(SK.HLL_ALPHA)


@register(
    "a17_portable_hll",
    oracle=f"""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM events
),
rb AS (
  SELECT event_type, h // 16777216 AS bucket,
         CASE WHEN h % 16777216 = 0 THEN 25
              ELSE 25 - length(bin(h % 16777216)) END AS r
  FROM h
),
regs AS (
  SELECT event_type, bucket, max(r) AS rmax
  FROM rb GROUP BY event_type, bucket
),
pg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_present,
         sum(1.0 / (1::BIGINT << rmax)) AS s_present
  FROM regs GROUP BY event_type
),
est AS (
  SELECT event_type,
         CASE WHEN (CAST({_HLL_ALPHA} AS DOUBLE) * {SK.HLL_M}.0 * {SK.HLL_M}.0
                    / (({SK.HLL_M}.0 - n_present) + s_present)) <= 2.5 * {SK.HLL_M}.0
                   AND ({SK.HLL_M}.0 - n_present) > 0
              THEN {SK.HLL_M}.0 * ln({SK.HLL_M}.0 / ({SK.HLL_M}.0 - n_present))
              ELSE CAST({_HLL_ALPHA} AS DOUBLE) * {SK.HLL_M}.0 * {SK.HLL_M}.0
                   / (({SK.HLL_M}.0 - n_present) + s_present)
         END AS e
  FROM pg
),
exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY event_type
)
SELECT x.event_type, x.exact_users, round(e.e, 6) AS hll_est,
       round(abs(e.e - x.exact_users) / x.exact_users, 6) AS rel_err
FROM exact x JOIN est e USING (event_type)
""",
)
def a17_portable_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog distinct-users per event type, with the
    exact count and relative error — the fully hash-gated complement of
    a13's built-in HLL++ (whose estimates are engine-specific): same md5
    hashing as the CMS/Bloom family, so registers AND estimates are
    bit-identical across engines. Sum(2^-rank) uses shift+divide
    (IEEE-exact powers of two, order-independent)."""
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events")
    est = SK.hll_distinct(ev, "event_type", "user_id")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "exact_users",
        "hll_est",
        F.round(
            F.abs(F.col("hll_est") - F.col("exact_users")) / F.col("exact_users"), 6
        ).alias("rel_err"),
    )


_A25_CUT = "2024-01-22 00:00:00"


@register(
    "a25_incremental_state_merge",
    oracle=f"""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM events
),
rb AS (
  SELECT event_type, h // 16777216 AS bucket,
         CASE WHEN h % 16777216 = 0 THEN 25
              ELSE 25 - length(bin(h % 16777216)) END AS r
  FROM h
),
regs AS (
  SELECT event_type, bucket, max(r) AS rmax
  FROM rb GROUP BY event_type, bucket
),
pg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_present,
         sum(1.0 / (1::BIGINT << rmax)) AS s_present
  FROM regs GROUP BY event_type
),
est AS (
  SELECT event_type,
         CASE WHEN (CAST({_HLL_ALPHA} AS DOUBLE) * {SK.HLL_M}.0 * {SK.HLL_M}.0
                    / (({SK.HLL_M}.0 - n_present) + s_present)) <= 2.5 * {SK.HLL_M}.0
                   AND ({SK.HLL_M}.0 - n_present) > 0
              THEN {SK.HLL_M}.0 * ln({SK.HLL_M}.0 / ({SK.HLL_M}.0 - n_present))
              ELSE CAST({_HLL_ALPHA} AS DOUBLE) * {SK.HLL_M}.0 * {SK.HLL_M}.0
                   / (({SK.HLL_M}.0 - n_present) + s_present)
         END AS e
  FROM pg
),
full_scalars AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         round(sum(value), 4) AS sum_value,
         round(min(value), 6) AS min_value,
         round(max(value), 6) AS max_value,
         round(sum(value) / count(*), 6) AS avg_value
  FROM events GROUP BY event_type
)
SELECT f.event_type, f.n_events, f.sum_value, f.min_value, f.max_value,
       f.avg_value, round(e.e, 6) AS hll_users
FROM full_scalars f JOIN est e USING (event_type)
""",
)
def a25_incremental_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregation maintenance: history (ts < Jan 22) and the
    new batch (ts >= Jan 22) are aggregated into SEPARATE mergeable
    states — (n, sum, min, max) partials + portable-HLL registers — and
    then merged state-to-state (operators/scale.py merge_states). The
    oracle recomputes the same aggregates over the FULL fact table in one
    pass, so the hash gate proves merge(state(H), state(B)) ==
    recompute(H UNION B) component-for-component, including the sketch:
    register-wise max merge is lossless, so the merged HLL estimate is
    bit-identical to the full-scan estimate. This is the contract that
    lets a 100 TB deployment fold a nightly batch into a stored state
    table with work proportional to the batch — history is never
    rescanned (the history state is localCheckpoint-ed here to stand in
    for that stored table)."""
    from pyspark.sql import functions as F

    from kafka_streaming_polymarket_pipeline_spark.operators import scale as SC

    ev = load(spark, sf_dir, "events")
    cut = F.to_timestamp(F.lit(_A25_CUT))
    hist = ev.filter(F.col("ts") < cut)
    batch = ev.filter(F.col("ts") >= cut)
    h_scalars, h_regs = SC.mergeable_state(hist, "event_type", "value", "user_id")
    # The stored-state stand-in: materialize history state once, exactly as
    # a state table on disk would be read — never the history facts again.
    h_state = (h_scalars.localCheckpoint(eager=False),
               h_regs.localCheckpoint(eager=False))
    b_state = SC.mergeable_state(batch, "event_type", "value", "user_id")
    merged = SC.merge_states([h_state, b_state], "event_type")
    return merged.select(
        "event_type",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
        F.round(F.col("sum_value") / F.col("n_events"), 6).alias("avg_value"),
        F.col("hll_est").alias("hll_users"),
    )


@register(
    "a30_kmv_source_overlap",
    oracle="""
WITH two AS (
  SELECT source FROM (SELECT DISTINCT source FROM documents ORDER BY source LIMIT 2)
), sh AS (
  SELECT DISTINCT source, s AS g FROM (
    SELECT source,
           unnest(list_transform(range(1, greatest(len(text) - 3, 1)),
                                 i -> substr(text, CAST(i AS INT), 5))) AS s
    FROM documents WHERE source IN (SELECT source FROM two))
), h AS (
  SELECT source, g,
         (('0x' || substr(md5(g), 1, 8))::BIGINT / 4294967296.0) AS hv
  FROM sh
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY hv, g) AS rn FROM h
), per AS (
  SELECT source, max(rn) AS n_kept, max(hv) AS u_k
  FROM ranked WHERE rn <= 256 GROUP BY source
), uh AS (
  SELECT g, min(hv) AS hv, count(DISTINCT source) AS nsrc FROM h GROUP BY g
), uranked AS (
  SELECT *, row_number() OVER (ORDER BY hv, g) AS rn FROM uh
), uest AS (
  SELECT max(rn) AS n_kept, max(hv) AS u_k,
         CAST(sum(CASE WHEN nsrc = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_both
  FROM uranked WHERE rn <= 256
), ex AS (
  SELECT sum(CASE WHEN nsrc = 2 THEN 1 ELSE 0 END) * 1.0 / count(*) AS j_exact
  FROM uh
)
SELECT
  (SELECT min(source) FROM two) AS source_a,
  (SELECT max(source) FROM two) AS source_b,
  round(CASE WHEN a.n_kept < 256 THEN a.n_kept * 1.0
             ELSE 255.0 / a.u_k END, 6) AS distinct_a_est,
  round(CASE WHEN b.n_kept < 256 THEN b.n_kept * 1.0
             ELSE 255.0 / b.u_k END, 6) AS distinct_b_est,
  round(CASE WHEN u.n_kept < 256 THEN u.n_kept * 1.0
             ELSE 255.0 / u.u_k END, 6) AS union_est,
  round(u.n_both * 1.0 / u.n_kept, 6) AS jaccard_est,
  round(ex.j_exact, 6) AS jaccard_exact
FROM per a, per b, uest u, ex
WHERE a.source = (SELECT min(source) FROM two)
  AND b.source = (SELECT max(source) FROM two)
""",
)
def a30_kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) sketch overlap between two corpus slices —
    the fourth sketch family member (frequency=CMS a15, membership=Bloom
    a16, cardinality=HLL a17, now set-OVERLAP=KMV, Bar-Yossef et al.
    2002 / Beyer et al. 2007): per-source distinct-shingle estimates,
    the union estimate, and the KMV Jaccard estimate between the two
    lexicographically-smallest sources, each from the k=256 smallest
    portable-md5 hash values — alongside the EXACT Jaccard for
    self-auditing error. Like a17, every estimate is hash-gated, not
    rows-only: both engines keep the identical k-min sets (same md5,
    (hv, g) tie order) and evaluate the identical (k-1)/u_k division,
    so the numbers agree to the 6 dp grid by construction.

    Physical shape: shingle explode -> distinct (source, gram) -> one
    PER-SOURCE rank window (key-partitioned), then the union sketch via
    the KMV MERGE property — the union's k smallest hashes are a subset
    of the per-source sketches' union, so the one global rank window
    sees <= 2k rows, bounded by construction, never the union
    vocabulary — and four one-row broadcast aggregates assemble the
    single output row (the a18 crossJoin pattern). At 100 TB the sketch
    is mergeable bounded state: k rows per slice forever (the per-source
    window's two-level TakeOrdered form is the scale lever, x8's
    pattern); membership joins back to the full gram sets only because
    the oracle needs the exact-Jaccard audit column anyway."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_streaming_polymarket_pipeline_spark.operators.text import char_shingles

    k = 256
    docs = load(spark, sf_dir, "documents")
    two = [
        r["source"]
        for r in docs.select("source").distinct().orderBy("source").limit(2).collect()
    ]
    src_a, src_b = min(two), max(two)
    sh = (
        docs.filter(F.col("source").isin(two))
        .select("source", F.explode(char_shingles(F.col("text"))).alias("g"))
        .distinct()
    )
    hv = (
        F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("double")
        / F.lit(4294967296.0)
    )
    h = sh.withColumn("hv", hv).localCheckpoint(eager=True)

    sk = h.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("source").orderBy("hv", "g")),
    ).filter(F.col("rn") <= k)
    sk = sk.localCheckpoint(eager=True)  # feeds per-source ests AND the union merge
    per = sk.groupBy("source").agg(
        F.max("rn").alias("n_kept"), F.max("hv").alias("u_k")
    )

    def est(n_kept, u_k):
        return F.round(
            F.when(n_kept < k, n_kept.cast("double")).otherwise(
                F.lit(float(k - 1)) / u_k
            ),
            6,
        )

    uh = h.groupBy("g").agg(
        F.min("hv").alias("hv"), F.countDistinct("source").alias("nsrc")
    )
    # KMV merge property: the union's k smallest hashes are a subset of
    # the two per-source sketches' union, so the global rank window sees
    # <= 2k rows — bounded by construction, never the union vocabulary.
    merged = sk.select("g", "hv").distinct()
    usk = (
        merged.withColumn(
            "rn", F.row_number().over(Window.partitionBy().orderBy("hv", "g"))
        )
        .filter(F.col("rn") <= k)
        .join(uh.select("g", "nsrc"), "g")  # membership in both ORIGINAL sets
    )
    uest = usk.agg(
        F.max("rn").alias("n_kept"),
        F.max("hv").alias("u_k"),
        F.sum(F.when(F.col("nsrc") == 2, 1).otherwise(0)).cast("long").alias("n_both"),
    )
    ex = uh.agg(
        (
            F.sum(F.when(F.col("nsrc") == 2, 1).otherwise(0)) * F.lit(1.0)
            / F.count("*")
        ).alias("j_exact")
    )

    a = per.filter(F.col("source") == src_a).select(
        est(F.col("n_kept"), F.col("u_k")).alias("distinct_a_est")
    )
    b = per.filter(F.col("source") == src_b).select(
        est(F.col("n_kept"), F.col("u_k")).alias("distinct_b_est")
    )
    u = uest.select(
        est(F.col("n_kept"), F.col("u_k")).alias("union_est"),
        F.round(F.col("n_both") * F.lit(1.0) / F.col("n_kept"), 6).alias("jaccard_est"),
    )
    return (
        a.crossJoin(b)
        .crossJoin(u)
        .crossJoin(ex.select(F.round("j_exact", 6).alias("jaccard_exact")))
        .select(
            F.lit(src_a).alias("source_a"),
            F.lit(src_b).alias("source_b"),
            "distinct_a_est",
            "distinct_b_est",
            "union_est",
            "jaccard_est",
            "jaccard_exact",
        )
    )


@register(
    "a34_sample_quantiles",
    oracle="""
WITH h AS (
  SELECT event_type, value, event_id,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT AS hh
  FROM events
),
r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY hh, event_id) AS rn
  FROM h
),
n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS sample_k,
         round(quantile_cont(value, 0.5), 4)  AS est_p50,
         round(quantile_cont(value, 0.95), 4) AS est_p95,
         round(quantile_cont(value, 0.99), 4) AS est_p99
  FROM r WHERE rn <= 512 GROUP BY 1
)
SELECT event_type, n_events, sample_k, est_p50, est_p95, est_p99
FROM s JOIN n USING (event_type)
""",
)
def a34_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable mergeable quantile sketch — the a17-vs-a13 move applied to
    quantiles (a12 is the exact global sort; a14 bands Spark's
    engine-specific percentile_approx): interpolated p50/p95/p99 from
    the 512 rows with the smallest portable md5 rank per group. The
    sample is deterministic on any engine, so the ESTIMATES hash-gate
    (not just band-check), and bottom-k merges exactly (bottom-k of a
    union = bottom-k of unioned bottom-k's — per-day/per-partition
    sketches combine like KMV a30). The Spark plan is two-phase: a
    broadcast count then a hash-threshold filter keeps ~8k rows per
    group before the exact bottom-k window, so the window's per-group
    sort never touches a full 100 TB group (miss probability is a
    counting bound ~e^-2500, documented in the operator)."""
    return SK.sample_quantile_sketch(
        load(spark, sf_dir, "events"), "event_type", "value", "event_id"
    )
