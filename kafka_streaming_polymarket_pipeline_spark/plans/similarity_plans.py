"""Similarity-search queries over the embeddings table.

s1 is the exact brute-force baseline. s2 (IVF) and s3 (sign-LSH) are the
approximate paths — and both are fully SQL-checkable: the centroid sample
is an md5-ordered pick DuckDB reproduces verbatim, and the LSH hyperplanes
are fixed literals embedded into the oracle, so the driver hash-gates the
entire approximate pipeline (assignment, probing, rerank), not just row
counts. s2_recall / s3_recall additionally hash-gate the QUALITY of each
approximate method: recall@10 against s1 computed from integer hit counts
(no float-summation ambiguity), with the oracle deriving the same number
from scratch in SQL.

The only non-oracled knob is IVF's Lloyd refinement (kmeans_iters>0):
float-mean summation order is engine-specific, so the registered s2 pins
kmeans_iters=0 and refinement quality is gated in tests/test_similarity.py.
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

_BRUTE_SQL = f"""
v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id, e FROM v WHERE vec_id < {N_QUERIES}),
brute_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.e, c.e)
           / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS c
  FROM q JOIN v c ON q.vec_id <> c.vec_id
),
brute_topk AS (
  SELECT query_id, neighbor_id, c, rn FROM (
    SELECT query_id, neighbor_id, c,
           row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
    FROM brute_scored
  ) WHERE rn <= {TOP_K}
)"""

# IVF replicated in SQL: md5-ordered centroid sample, argmax-cosine corpus
# assignment (tie -> smaller centroid id, matching Spark's max_by struct),
# top-nprobe query cells, exact rerank within probed cells.
_IVF_SQL = f"""
cents AS (
  SELECT vec_id AS centroid_id, e AS ce FROM v
  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {S.NUM_CENTROIDS}
),
casg AS (
  SELECT vec_id, centroid_id FROM (
    SELECT v.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             list_dot_product(v.e, c.ce)
               / (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c.ce, c.ce))) DESC,
             c.centroid_id) AS rn
    FROM v CROSS JOIN cents c
  ) WHERE rn = 1
),
qprobe AS (
  SELECT vec_id AS query_id, centroid_id FROM (
    SELECT q.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             list_dot_product(q.e, c.ce)
               / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.ce, c.ce))) DESC,
             c.centroid_id) AS rn
    FROM q CROSS JOIN cents c
  ) WHERE rn <= {S.NPROBE}
),
ivf_scored AS (
  SELECT qp.query_id, ca.vec_id AS neighbor_id,
         list_dot_product(q.e, cv.e)
           / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(cv.e, cv.e))) AS c
  FROM qprobe qp
  JOIN casg ca ON ca.centroid_id = qp.centroid_id
  JOIN v cv ON cv.vec_id = ca.vec_id
  JOIN q ON q.vec_id = qp.query_id
  WHERE qp.query_id <> ca.vec_id
),
ivf_topk AS (
  SELECT query_id, neighbor_id, c, rn FROM (
    SELECT query_id, neighbor_id, c,
           row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
    FROM ivf_scored
  ) WHERE rn <= {TOP_K}
)"""


def _plane_literal(plane: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in plane) + "]"


def _bucket_sql(vec_expr: str) -> str:
    """SQL twin of similarity._bucket: sum of sign bits of the fixed-plane
    projections (the plane literals are embedded so DuckDB computes the
    identical bucket — list_dot_product folds in the same sequential order
    as Spark's zip_with/aggregate)."""
    terms = [
        f"(CASE WHEN list_dot_product({vec_expr}, {_plane_literal(p)}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(S._PLANES)
    ]
    return "(" + " + ".join(terms) + ")"


def _lsh_sql() -> str:
    probes = ", ".join(["qb.b"] + [f"xor(qb.b, {1 << i})" for i in range(S.NUM_PLANES)])
    return f"""
cbuck AS (SELECT vec_id, {_bucket_sql('e')} AS b FROM v),
qbuck AS (
  SELECT q.vec_id AS query_id, unnest([{probes}]) AS b
  FROM (SELECT vec_id, {_bucket_sql('e')} AS b FROM q) qb
  JOIN q ON q.vec_id = qb.vec_id
),
lsh_scored AS (
  SELECT qk.query_id, cb.vec_id AS neighbor_id,
         list_dot_product(q.e, cv.e)
           / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(cv.e, cv.e))) AS c
  FROM qbuck qk
  JOIN cbuck cb ON cb.b = qk.b
  JOIN v cv ON cv.vec_id = cb.vec_id
  JOIN q ON q.vec_id = qk.query_id
  WHERE qk.query_id <> cb.vec_id
),
lsh_topk AS (
  SELECT query_id, neighbor_id, c, rn FROM (
    SELECT query_id, neighbor_id, c,
           row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
    FROM lsh_scored
  ) WHERE rn <= {TOP_K}
)"""


@register(
    "s1_ann_bruteforce_topk",
    oracle=f"""
WITH {_BRUTE_SQL}
SELECT query_id, neighbor_id, round(c, 6) AS cosine, CAST(rn AS INT) AS rank
FROM brute_topk
""",
)
def s1_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for the query set: broadcast queries x corpus,
    JVM-side fold dot products, window top-k."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.brute_force_topk(emb, queries, k=TOP_K)


@register(
    "s2_ann_ivf_topk",
    oracle=f"""
WITH {_BRUTE_SQL}, {_IVF_SQL}
SELECT query_id, neighbor_id, round(c, 6) AS cosine, CAST(rn AS INT) AS rank
FROM ivf_topk
""",
)
def s2_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via IVF (16 md5-sampled centroids, nprobe=6) +
    exact rerank — scans ~6/16 of the corpus per query. kmeans_iters=0 so
    the DuckDB oracle replicates the pipeline exactly (see module
    docstring); Lloyd-refined quality is gated in tests."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.ivf_ann_topk(emb, queries, k=TOP_K, kmeans_iters=0)


@register(
    "s3_ann_lsh_topk",
    oracle=f"""
WITH {_BRUTE_SQL}, {_lsh_sql()}
SELECT query_id, neighbor_id, round(c, 6) AS cosine, CAST(rn AS INT) AS rank
FROM lsh_topk
""",
)
def s3_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via 12-hyperplane sign-LSH with 1-bit multiprobe +
    exact rerank. Right tool for the near-dup regime (cosine >= ~0.9);
    included for coverage — s3_recall hash-gates its (documented, low)
    recall on this moderate-similarity corpus vs IVF."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.lsh_ann_topk(emb, queries, k=TOP_K)


def _recall_frame(spark: SparkSession, sf_dir: str, approx: DataFrame) -> DataFrame:
    """recall@10 vs the exact brute-force top-k, from integer hit counts
    (hits/denominator are BIGINTs, so the value is bit-identical across
    engines — no float-summation order dependence)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = S.brute_force_topk(emb, queries, k=TOP_K)
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    return (
        exact.agg(
            F.countDistinct("query_id").alias("n_queries"),
            F.count("*").alias("denom"),
        )
        .crossJoin(hits.agg(F.count("*").alias("hits")))
        .select(
            "n_queries", "hits", "denom",
            F.round(F.col("hits") / F.col("denom"), 4).alias("recall_at_10"),
        )
    )


_RECALL_SELECT = """
SELECT (SELECT count(DISTINCT query_id) FROM brute_topk) AS n_queries,
       (SELECT count(*) FROM hits) AS hits,
       (SELECT count(*) FROM brute_topk) AS denom,
       round((SELECT count(*) FROM hits) * 1.0 / (SELECT count(*) FROM brute_topk), 4)
         AS recall_at_10
"""


@register(
    "s2_recall",
    oracle=f"""
WITH {_BRUTE_SQL}, {_IVF_SQL},
hits AS (
  SELECT b.query_id, b.neighbor_id FROM brute_topk b
  JOIN ivf_topk a ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
)
{_RECALL_SELECT}
""",
)
def s2_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable IVF quality gate: recall@10 of s2 against s1,
    computed in Spark, hash-matched against DuckDB re-deriving both
    pipelines from the raw table."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    approx = S.ivf_ann_topk(emb, queries, k=TOP_K, kmeans_iters=0)
    return _recall_frame(spark, sf_dir, approx)


@register(
    "s3_recall",
    oracle=f"""
WITH {_BRUTE_SQL}, {_lsh_sql()},
hits AS (
  SELECT b.query_id, b.neighbor_id FROM brute_topk b
  JOIN lsh_topk a ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
)
{_RECALL_SELECT}
""",
)
def s3_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable LSH quality gate: recall@10 of s3 against s1 —
    documents (and pins) the recall collapse outside the near-dup regime."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    approx = S.lsh_ann_topk(emb, queries, k=TOP_K)
    return _recall_frame(spark, sf_dir, approx)


@register(
    "q1_embedding_quantize",
    oracle="""
WITH b AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), s AS (
  SELECT vec_id, v,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
              THEN 127.0 / list_max(list_transform(v, x -> abs(x)))
              ELSE 0.0 END AS scale
  FROM b
), qd AS (
  SELECT vec_id, v, scale,
         list_transform(v, x -> CAST(round(x * scale) AS INTEGER)) AS q
  FROM s
)
SELECT vec_id,
       round(scale, 6) AS scale,
       md5(array_to_string(q, ',')) AS q_md5,
       CAST(list_sum(q) AS BIGINT) AS q_sum,
       round(list_sum(list_transform(generate_series(1, len(v)),
                 i -> pow(v[i] - (CASE WHEN scale > 0
                                       THEN CAST(q[i] AS DOUBLE) / scale
                                       ELSE 0.0 END), 2)))
             / len(v) * 1e6, 3) AS mse_ppm
FROM qd
""",
)
def q1_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding table with per-vector
    scale and reconstruction-MSE accounting — the storage/serving
    compression step of a 100 TB similarity stack. Map-only.

    The code vector is surfaced as (md5 digest, sum) rather than the raw
    array: the driver's canonicalizer sorts result columns in pandas,
    which cannot hash list cells — and the digest pins the full code
    sequence just as strictly."""
    emb = load(spark, sf_dir, "embeddings")
    q = S.quantize_int8(emb)
    return q.select(
        "vec_id",
        "scale",
        F.md5(F.concat_ws(",", F.col("q").cast("array<string>"))).alias("q_md5"),
        F.aggregate("q", F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        "mse_ppm",
    )


# PQ-ADC replicated in SQL: md5-ordered seed codebook, per-subspace argmin
# encode (tie -> smaller codeword index, matching Spark's first-minimum
# fold), lookup-table scoring rounded to 6 dp BEFORE ranking on both
# sides (group-sum order is engine-specific), exact rerank of the pool.
_PQ_DS = 64 // S.PQ_M


def _pq_sql() -> str:
    m, k, ds, pool = S.PQ_M, S.PQ_K, _PQ_DS, S.PQ_POOL
    return f"""
pq_seeds AS (
  SELECT e, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
  FROM v QUALIFY j < {k}
),
pq_cw AS (
  SELECT mm.m, s.j, s.e[mm.m * {ds} + 1 : (mm.m + 1) * {ds}] AS cw,
         list_dot_product(s.e[mm.m * {ds} + 1 : (mm.m + 1) * {ds}],
                          s.e[mm.m * {ds} + 1 : (mm.m + 1) * {ds}]) AS cn2
  FROM pq_seeds s, (SELECT unnest(range(0, {m})) AS m) mm
),
pq_codes AS (
  SELECT vec_id, m, j AS code, cn2 FROM (
    SELECT v.vec_id, c.m, c.j, c.cn2,
           row_number() OVER (PARTITION BY v.vec_id, c.m ORDER BY
             list_sum(list_transform(range(1, {ds} + 1),
               i -> (v.e[c.m * {ds} + i] - c.cw[i]) * (v.e[c.m * {ds} + i] - c.cw[i]))),
             c.j) AS rn
    FROM v CROSS JOIN pq_cw c
  ) WHERE rn = 1
),
pq_qn AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS n FROM q),
pq_rn AS (SELECT vec_id, sqrt(sum(cn2)) AS rn FROM pq_codes GROUP BY vec_id),
pq_contrib AS (
  SELECT q.vec_id AS query_id, cd.vec_id AS neighbor_id,
         list_dot_product(q.e[cd.m * {ds} + 1 : (cd.m + 1) * {ds}], cw.cw) AS x
  FROM pq_codes cd
  JOIN pq_cw cw ON cw.m = cd.m AND cw.j = cd.code
  CROSS JOIN q
  WHERE q.vec_id <> cd.vec_id
),
pq_adc AS (
  SELECT c.query_id, c.neighbor_id, round(sum(c.x) / (qn.n * rn.rn), 6) AS adc
  FROM pq_contrib c
  JOIN pq_qn qn ON qn.vec_id = c.query_id
  JOIN pq_rn rn ON rn.vec_id = c.neighbor_id
  GROUP BY c.query_id, c.neighbor_id, qn.n, rn.rn
),
pq_pool AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rn
    FROM pq_adc
  ) WHERE rn <= {pool}
),
pq_rerank AS (
  SELECT p.query_id, p.neighbor_id,
         round(list_dot_product(q.e, cv.e)
           / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(cv.e, cv.e))), 6) AS c
  FROM pq_pool p
  JOIN q ON q.vec_id = p.query_id
  JOIN v cv ON cv.vec_id = p.neighbor_id
),
pq_topk AS (
  SELECT query_id, neighbor_id, c, rn FROM (
    SELECT query_id, neighbor_id, c,
           row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
    FROM pq_rerank
  ) WHERE rn <= {TOP_K}
)"""


@register(
    "q2_pq_adc_topk",
    oracle=f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id, e FROM v WHERE vec_id < {N_QUERIES}),
{_pq_sql()}
SELECT query_id, neighbor_id, c AS cosine, CAST(rn AS INT) AS rank
FROM pq_topk
""",
)
def q2_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via product quantization + asymmetric-distance
    scoring (8 subspaces x 32 codewords, pool=100 exact rerank) — the
    memory-bound ANN tier where the corpus lives as 16x-compressed codes.
    The md5-seeded codebook makes the whole pipeline SQL-reproducible;
    Lloyd-refined codebooks are the production knob (same caveat as s2)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.pq_adc_topk(emb, queries, k=TOP_K)


@register(
    "q2_recall",
    oracle=f"""
WITH {_BRUTE_SQL}, {_pq_sql()},
hits AS (
  SELECT b.query_id, b.neighbor_id FROM brute_topk b
  JOIN pq_topk a ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
)
{_RECALL_SELECT}
""",
)
def q2_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable PQ-ADC quality gate: recall@10 of q2 against s1
    (measured 0.83 at sf0.01 with the seed codebook and pool=100)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    approx = S.pq_adc_topk(emb, queries, k=TOP_K)
    return _recall_frame(spark, sf_dir, approx)


# IVF-PQ composed in SQL: the IVF CTEs supply cells (cents/casg/qprobe),
# the PQ CTEs supply codes + norms; candidates come from probed cells and
# are scored from codes. Unreferenced CTEs from the spliced fragments
# (e.g. pq_contrib, ivf_scored) are never evaluated by DuckDB.
_Q3_SQL = f"""
q3_contrib AS (
  SELECT qp.query_id, cd.vec_id AS neighbor_id,
         list_dot_product(q.e[cd.m * {_PQ_DS} + 1 : (cd.m + 1) * {_PQ_DS}], cw.cw) AS x
  FROM qprobe qp
  JOIN casg ca ON ca.centroid_id = qp.centroid_id
  JOIN pq_codes cd ON cd.vec_id = ca.vec_id
  JOIN pq_cw cw ON cw.m = cd.m AND cw.j = cd.code
  JOIN q ON q.vec_id = qp.query_id
  WHERE qp.query_id <> ca.vec_id
),
q3_adc AS (
  SELECT c.query_id, c.neighbor_id, round(sum(c.x) / (qn.n * rn.rn), 6) AS adc
  FROM q3_contrib c
  JOIN pq_qn qn ON qn.vec_id = c.query_id
  JOIN pq_rn rn ON rn.vec_id = c.neighbor_id
  GROUP BY c.query_id, c.neighbor_id, qn.n, rn.rn
),
q3_pool AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rn
    FROM q3_adc
  ) WHERE rn <= {S.PQ_POOL}
),
q3_rerank AS (
  SELECT p.query_id, p.neighbor_id,
         round(list_dot_product(q.e, cv.e)
           / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(cv.e, cv.e))), 6) AS c
  FROM q3_pool p
  JOIN q ON q.vec_id = p.query_id
  JOIN v cv ON cv.vec_id = p.neighbor_id
),
q3_topk AS (
  SELECT query_id, neighbor_id, c, rn FROM (
    SELECT query_id, neighbor_id, c,
           row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
    FROM q3_rerank
  ) WHERE rn <= {TOP_K}
)"""


@register(
    "q3_ivf_pq_topk",
    oracle=f"""
WITH {_BRUTE_SQL}, {_IVF_SQL}, {_pq_sql()}, {_Q3_SQL}
SELECT query_id, neighbor_id, c AS cosine, CAST(rn AS INT) AS rank
FROM q3_topk
""",
)
def q3_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-10 — the FAISS-style production composition:
    IVF cells prune the scan to ~nprobe/C of the corpus, PQ codes score
    candidates from 16x-compressed storage, exact rerank restores
    precision on the pool. Both samples (centroids, codebook) are
    md5-seeded, so the entire composition hash-checks against DuckDB."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.ivf_pq_topk(emb, queries, k=TOP_K)


@register(
    "q3_recall",
    oracle=f"""
WITH {_BRUTE_SQL}, {_IVF_SQL}, {_pq_sql()}, {_Q3_SQL},
hits AS (
  SELECT b.query_id, b.neighbor_id FROM brute_topk b
  JOIN q3_topk a ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
)
{_RECALL_SELECT}
""",
)
def q3_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable IVF-PQ quality gate: recall@10 of q3 against s1."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    approx = S.ivf_pq_topk(emb, queries, k=TOP_K)
    return _recall_frame(spark, sf_dir, approx)


# Eval set for d10: the first N_EVAL vec_ids stand in for a benchmark
# suite; the corpus is everything else (disjoint by construction).
N_EVAL = 25
DECONTAM_THRESHOLD = 0.45  # the engine-wide near-dup bar (d5/d8)


@register(
    "d10_semantic_decontam",
    oracle=f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
ev AS (SELECT vec_id AS eval_id, e FROM v WHERE vec_id < {N_EVAL}),
c AS (SELECT vec_id, e FROM v WHERE vec_id >= {N_EVAL}),
p AS (
  SELECT c.vec_id, ev.eval_id,
         round(list_dot_product(c.e, ev.e)
               / (sqrt(list_dot_product(c.e, c.e)) * sqrt(list_dot_product(ev.e, ev.e))), 6) AS cos
  FROM c CROSS JOIN ev
)
SELECT vec_id, eval_id AS nearest_eval_id, cos AS max_cosine,
       cos >= {DECONTAM_THRESHOLD} AS contaminated
FROM (
  SELECT vec_id, eval_id, cos,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, eval_id ASC) AS rn
  FROM p
) WHERE rn = 1
""",
)
def d10_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level eval decontamination: nearest eval vector + flag
    per corpus vector (broadcast eval set, map-side scoring, argmax over
    the 6-dp-rounded cosine on both engines). The semantic complement of
    t8's exact n-gram decontamination."""
    emb = load(spark, sf_dir, "embeddings")
    eval_set = emb.filter(F.col("vec_id") < N_EVAL)
    corpus = emb.filter(F.col("vec_id") >= N_EVAL)
    return S.semantic_decontam(corpus, eval_set, threshold=DECONTAM_THRESHOLD)


# Binary sign-bit codes replicated in SQL: two 32-bit halves folded
# MSB-first (list_reduce, the t4 rolling-hash idiom), integer Hamming
# candidate pool, exact-cosine rerank.
_BQ_POOL = 100  # recall@10: 0.64 at pool=50, 0.80 at 100, 0.90 at 150 (sf0.01)


def _bq_sql() -> str:
    def pack(lo: int, hi: int) -> str:
        return (
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(generate_series({lo}, {hi}), "
            "i -> CAST(CASE WHEN e[i] > 0 THEN 1 ELSE 0 END AS BIGINT))), "
            "(acc, b) -> acc * 2 + b)"
        )

    return f"""
bq_codes AS (
  SELECT vec_id, {pack(1, 32)} AS code_hi, {pack(33, 64)} AS code_lo FROM v
),
bq_qcodes AS (SELECT * FROM bq_codes WHERE vec_id < {N_QUERIES}),
bq_ham AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(bit_count(xor(q.code_hi, c.code_hi))
              + bit_count(xor(q.code_lo, c.code_lo)) AS INTEGER) AS hamming
  FROM bq_qcodes q JOIN bq_codes c ON q.vec_id <> c.vec_id
),
bq_pool AS (
  SELECT query_id, neighbor_id, hamming FROM (
    SELECT query_id, neighbor_id, hamming,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY hamming, neighbor_id) AS pr
    FROM bq_ham
  ) WHERE pr <= {_BQ_POOL}
),
bq_scored AS (
  SELECT p.query_id, p.neighbor_id, p.hamming,
         list_dot_product(q.e, c.e)
           / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS c
  FROM bq_pool p
  JOIN v q ON q.vec_id = p.query_id
  JOIN v c ON c.vec_id = p.neighbor_id
),
bq_topk AS (
  SELECT query_id, neighbor_id, hamming, c, rn FROM (
    SELECT query_id, neighbor_id, hamming, c,
           row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
    FROM bq_scored
  ) WHERE rn <= {TOP_K}
)"""


@register(
    "q4_binary_hamming_topk",
    oracle=f"""
WITH {_BRUTE_SQL}, {_bq_sql()}
SELECT query_id, neighbor_id, hamming, round(c, 6) AS cosine, CAST(rn AS INT) AS rank
FROM bq_topk
""",
)
def q4_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-rescoring ANN: 1-bit sign codes (512x compression — the tier
    that stays executor-resident at 1B vectors), integer Hamming candidate
    pool (engine-exact, no rounding anywhere in selection), exact-cosine
    rerank of |Q| x pool rows. The whole pipeline is SQL-replicated."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.binary_hamming_topk(emb, queries, k=TOP_K, pool=_BQ_POOL)


@register(
    "q4_recall",
    oracle=f"""
WITH {_BRUTE_SQL}, {_bq_sql()},
hits AS (
  SELECT b.query_id, b.neighbor_id FROM brute_topk b
  JOIN bq_topk a ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
)
{_RECALL_SELECT}
""",
)
def q4_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable binary-quantization quality gate: recall@10 of q4
    against the exact s1 baseline, from integer hit counts."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    approx = S.binary_hamming_topk(emb, queries, k=TOP_K, pool=_BQ_POOL)
    return _recall_frame(spark, sf_dir, approx)
